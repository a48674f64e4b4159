"""Semantic parity against the ACTUAL reference implementation.

The reference stack (/root/reference/src — torch + sentence-transformers)
is executed directly as the oracle: tiny BERT checkpoints are synthesized
on disk in layouts BOTH stacks load (a sentence-transformers save dir for
stage 1, plain HF dirs for stages 2/3), FAISS is replaced by an exact
numpy inner-product stub (the only reference dep not installed), and each
stage plus the full pipeline is compared query-by-query.

This closes the round-1 gap that every quality gate was self-referential
(VERDICT r1 next-3): here the reference's own code computes the expected
rankings and scores.

Oracle alignment requirements on our side:
* ``stage2_use_projection=False`` — the reference scores raw
  last-hidden-state MaxSim (src/stage2_rescorer.py:156-165),
* ``compute_dtype=float32`` to match torch CPU,
* the main fixtures use short docs (identical truncation everywhere);
  ``TestLongDocTruncationOracle`` covers the truncation-firing regime.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("sentence_transformers")
pytest.importorskip("transformers")

REF = "/root/reference"

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over a sleepy canine",
    "retrieval systems rank documents by relevance",
    "bm25 scores lexical term matches in search",
    "colbert uses late interaction token embeddings",
    "cross encoders jointly score query document pairs",
    "tensor processing units multiply matrices quickly",
    "memory bandwidth limits kernel throughput",
    "the dog sat quietly near the fox den",
    "sharding splits an index across many devices",
]
QUERIES = [
    "fox dog quick",
    "lexical term search bm25",
    "token embeddings interaction",
]


class _FlatIP:
    """Exact inner-product index — numpy stand-in for faiss.IndexFlatIP
    (the corpora here stay <1000 docs, the reference's flat-index path,
    src/stage1_retriever.py:274-277)."""

    def __init__(self, d):
        self.d = d
        self._x = np.zeros((0, d), np.float32)

    @property
    def ntotal(self):
        return self._x.shape[0]

    def add(self, x):
        self._x = np.concatenate([self._x, np.asarray(x, np.float32)], 0)

    def search(self, q, k):
        q = np.asarray(q, np.float32)
        s = q @ self._x.T
        kk = min(k, self.ntotal)
        idx = np.argsort(-s, axis=1)[:, :kk]
        sc = np.take_along_axis(s, idx, axis=1)
        if kk < k:
            idx = np.concatenate(
                [idx, np.full((q.shape[0], k - kk), -1)], 1
            )
            sc = np.concatenate(
                [sc, np.full((q.shape[0], k - kk), -np.inf, np.float32)], 1
            )
        return sc.astype(np.float32), idx.astype(np.int64)


@pytest.fixture(scope="module")
def ref_modules():
    import pathlib

    if not pathlib.Path(REF, "src").is_dir():
        pytest.skip("reference checkout not available")
    stub = types.ModuleType("faiss")
    stub.IndexFlatIP = _FlatIP
    stub.METRIC_INNER_PRODUCT = 0
    stub.IndexIVFFlat = None  # flat path only (<1000 docs)
    stub.write_index = lambda *a, **k: None
    stub.read_index = lambda *a, **k: None
    sys.modules.setdefault("faiss", stub)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import src.retrieval_pipeline as ref_pipe
    import src.stage1_retriever as ref_s1
    import src.stage2_rescorer as ref_s2
    import src.stage3_reranker as ref_s3

    return types.SimpleNamespace(s1=ref_s1, s2=ref_s2, s3=ref_s3, pipe=ref_pipe)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Tiny synthesized checkpoints both stacks load."""
    from sentence_transformers import SentenceTransformer
    from sentence_transformers import models as st_models
    from transformers import (
        BertConfig,
        BertForSequenceClassification,
        BertModel,
        BertTokenizerFast,
    )

    md = tmp_path_factory.mktemp("refmodels")
    words = sorted({w for t in DOCS + QUERIES for w in t.lower().split()})
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    vpath = md / "vocab.txt"
    vpath.write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(vpath), do_lower_case=True)
    kw = dict(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=128, type_vocab_size=2,
    )

    torch.manual_seed(0)
    BertModel(BertConfig(**kw)).eval().save_pretrained(
        md / "tiny-colbert", safe_serialization=True
    )
    tok.save_pretrained(md / "tiny-colbert")

    torch.manual_seed(1)
    BertForSequenceClassification(
        BertConfig(num_labels=1, **kw)
    ).eval().save_pretrained(md / "tiny-cross", safe_serialization=True)
    tok.save_pretrained(md / "tiny-cross")

    torch.manual_seed(2)
    BertModel(BertConfig(**kw)).eval().save_pretrained(
        md / "_bi_base", safe_serialization=True
    )
    tok.save_pretrained(md / "_bi_base")
    stm = SentenceTransformer(
        modules=[
            st_models.Transformer(str(md / "_bi_base"), max_seq_length=64),
            st_models.Pooling(32, pooling_mode="mean"),
            st_models.Normalize(),
        ],
        device="cpu",
    )
    stm.save(str(md / "tiny-st-bi"))
    return md


@pytest.fixture(scope="module")
def my_config(assets):
    from tristage_rag_tpu.engine.config import PipelineConfig

    return PipelineConfig(
        stage1_model="tiny-st-bi", stage2_model="tiny-colbert",
        stage3_model="tiny-cross", model_dir=str(assets),
        compute_dtype="float32", mesh_data_parallel=1,
        stage1_top_k=8, stage1_bm25_top_k=8, stage1_max_text_length=64,
        stage2_max_seq_length=32, stage2_top_k=6, stage2_use_projection=False,
        stage3_max_length=64, stage3_top_k=4,
        enable_fused_search=False,
    )


def _assert_result_parity(ref_results, my_results, score_key, atol):
    """Same id set, per-id scores within atol; exact order wherever the
    reference's adjacent score gaps exceed the tolerance (near-ties may
    legitimately swap across frameworks)."""
    ids_ref = [r["doc_id"] for r in ref_results]
    ids_my = [r["doc_id"] for r in my_results]
    assert set(ids_ref) == set(ids_my)
    ref_map = {r["doc_id"]: float(r[score_key]) for r in ref_results}
    my_map = {r["doc_id"]: float(r[score_key]) for r in my_results}
    for i in ref_map:
        assert my_map[i] == pytest.approx(ref_map[i], abs=atol), (
            f"doc {i}: ref {ref_map[i]} vs mine {my_map[i]}"
        )
    scores = [ref_map[i] for i in ids_ref]
    gaps_distinct = all(
        scores[j] - scores[j + 1] > 2 * atol for j in range(len(scores) - 1)
    )
    if gaps_distinct:
        assert ids_ref == ids_my


class TestStageOracles:
    def test_stage1_rrf_matches_reference(
        self, ref_modules, assets, my_config, tmp_path
    ):
        """RRF scores are rank-derived (1/(60+rank)), so a near-tie swap
        in either input list shifts them discretely — assert the id set
        and that no id moves more than one position."""
        ref = ref_modules.s1.Stage1Retriever(ref_modules.s1.Stage1Config(
            model_name="tiny-st-bi", device="cpu", cache_dir=str(assets),
            index_dir=str(tmp_path), use_fp16=False, top_k_candidates=8,
            enable_bm25=True, bm25_top_k=8, max_text_length=64,
        ))
        ref.add_documents(list(DOCS))
        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        mine = Stage1Retriever(my_config)
        assert mine.runtime.weights_loaded
        mine.add_documents(list(DOCS))
        for q in QUERIES:
            ids_ref = [r["doc_id"] for r in ref.search(q, 8)]
            ids_my = [r["doc_id"] for r in mine.search(q, 8)]
            assert set(ids_ref) == set(ids_my)
            for pos, i in enumerate(ids_ref):
                assert abs(ids_my.index(i) - pos) <= 1, (q, ids_ref, ids_my)

    def test_stage1_weighted_fusion_matches_reference(
        self, ref_modules, assets, my_config, tmp_path
    ):
        """Weighted fusion scores are continuous (min-max normalised
        cosine/BM25), so full id->score parity holds within tolerance."""
        import dataclasses

        ref = ref_modules.s1.Stage1Retriever(ref_modules.s1.Stage1Config(
            model_name="tiny-st-bi", device="cpu", cache_dir=str(assets),
            index_dir=str(tmp_path / "w"), use_fp16=False,
            top_k_candidates=8, enable_bm25=True, bm25_top_k=8,
            max_text_length=64, fusion_method="weighted",
        ))
        ref.add_documents(list(DOCS))
        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        mine = Stage1Retriever(dataclasses.replace(
            my_config, stage1_fusion_method="weighted"
        ))
        mine.add_documents(list(DOCS))
        for q in QUERIES:
            _assert_result_parity(
                ref.search(q, 8), mine.search(q, 8), "stage1_score", 1e-3
            )

    def test_stage2_matches_reference(self, ref_modules, assets, my_config):
        cands = [
            {"doc_id": i, "document": d, "score": 0.1, "stage1_score": 0.1,
             "metadata": {}, "stage": "stage1"}
            for i, d in enumerate(DOCS)
        ]
        ref = ref_modules.s2.ColBERTScorer(ref_modules.s2.Stage2Config(
            model_name="tiny-colbert", device="cpu", cache_dir=str(assets),
            use_fp16=False, max_seq_length=32, top_k_candidates=6,
            use_gpu_if_available=False,
        ))
        from tristage_rag_tpu.engine.stage2 import ColBERTScorer

        mine = ColBERTScorer(my_config)
        assert mine.runtime.weights_loaded
        for q in QUERIES:
            _assert_result_parity(
                ref.rescore_candidates(q, [dict(c) for c in cands]),
                mine.rescore_candidates(q, [dict(c) for c in cands]),
                "stage2_score", 1e-4,
            )

    def test_stage3_matches_reference(self, ref_modules, assets, my_config):
        cands = [
            {"doc_id": i, "document": d, "score": 0.1, "stage1_score": 0.1,
             "metadata": {}, "stage": "stage1"}
            for i, d in enumerate(DOCS)
        ]
        ref = ref_modules.s3.CrossEncoderReranker(ref_modules.s3.Stage3Config(
            model_name="tiny-cross", device="cpu", cache_dir=str(assets),
            use_fp16=False, max_length=64, top_k_final=4,
            use_gpu_if_available=False,
        ))
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        mine = CrossEncoderReranker(my_config)
        assert mine.runtime.weights_loaded
        for q in QUERIES:
            # min-max normalization amplifies tiny logit diffs -> 2e-2
            _assert_result_parity(
                ref.rerank(q, [dict(c) for c in cands]),
                mine.rerank(q, [dict(c) for c in cands]),
                "stage3_score", 2e-2,
            )


class TestFullPipelineOracle:
    @pytest.fixture(scope="class")
    def pipelines(self, ref_modules, assets, my_config, tmp_path_factory):
        ref = ref_modules.pipe.RetrievalPipeline(
            config=ref_modules.pipe.PipelineConfig(
                stage1_model="tiny-st-bi", stage2_model="tiny-colbert",
                stage3_model="tiny-cross",
                stage1_top_k=8, stage1_bm25_top_k=8, stage2_top_k=6,
                stage3_top_k=4, stage1_use_fp16=False, stage2_use_fp16=False,
                stage3_use_fp16=False, stage2_max_seq_length=32,
                stage3_max_length=64, device="cpu", cache_dir=str(assets),
                index_dir=str(tmp_path_factory.mktemp("refidx")),
            )
        )
        ref.add_documents(list(DOCS))
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        mine = RetrievalPipeline(my_config)
        mine.add_documents(list(DOCS))
        return ref, mine

    @pytest.mark.parametrize("query", QUERIES)
    def test_end_to_end_rankings_match(self, pipelines, query):
        ref, mine = pipelines
        o_ref = ref.search(query, 4)
        o_my = mine.search(query, 4)
        _assert_result_parity(
            o_ref["results"], o_my["results"], "stage3_score", 2e-2
        )

    def test_ndcg_parity_on_synthetic_limit(self, pipelines):
        """BASELINE.md protocol steps 1-2, executed with the reference
        stack as step 1: both pipelines retrieve over the same
        LIMIT-shaped task and must produce the same NDCG@10 /
        Recall@10 (real-checkpoint LIMIT needs egress; the semantics
        are what's provable here)."""
        from tristage_rag_tpu.eval.metrics import evaluate_retrieval

        ref, mine = pipelines
        queries = {f"q{i}": q for i, q in enumerate(QUERIES)}
        # qrels from lexical ground truth: docs sharing >= 2 query words
        qrels = {}
        for qid, q in queries.items():
            qw = set(q.lower().split())
            rel = {
                f"d{j}": 1 for j, d in enumerate(DOCS)
                if len(qw & set(d.lower().split())) >= 2
            }
            qrels[qid] = rel or {"d0": 1}

        def run(pipe):
            out = {}
            for qid, q in queries.items():
                res = pipe.search(q, 8)["results"]
                out[qid] = {
                    f"d{r['doc_id']}": float(r.get("stage3_score") or 0.0)
                    for r in res
                }
            return evaluate_retrieval(qrels, out, ks=(5, 10))

        m_ref = run(ref)
        m_my = run(mine)
        assert m_my["ndcg_at_10"] == pytest.approx(
            m_ref["ndcg_at_10"], abs=1e-6
        )
        assert m_my["recall_at_10"] == pytest.approx(
            m_ref["recall_at_10"], abs=1e-6
        )

    def test_fused_path_matches_reference_too(self, assets, my_config, pipelines):
        """The single-dispatch fused path agrees with the reference
        end-to-end (docs here are short, so pair truncation is
        identical)."""
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        ref, _ = pipelines
        fused = RetrievalPipeline(dataclasses.replace(
            my_config, enable_fused_search=True,
            stage2_cache_doc_embeddings=True,
        ))
        fused.add_documents(list(DOCS))
        for q in QUERIES:
            out = fused.search(q, 4)
            assert out["timing"].get("fused") is True
            _assert_result_parity(
                ref.search(q, 4)["results"], out["results"],
                "stage3_score", 2e-2,
            )


LONG_DOCS = [" ".join(d.split() * 18) for d in DOCS]


class TestLongDocTruncationOracle:
    """Stage-3 truncation parity where truncation actually FIRES
    (VERDICT r2 next-5): ~150-token docs at stage3_max_length=64 force
    longest-first pair truncation (src/stage3_reranker.py:139-160 /
    the ST CrossEncoder tokenizer). The staged path claims
    reference-faithful truncation and must match; the fused path's
    static-cap divergence (PARITY.md "Deliberate divergences") is
    measured, not asserted identical."""

    @pytest.fixture(scope="class")
    def pipelines(self, ref_modules, assets, my_config, tmp_path_factory):
        ref = ref_modules.pipe.RetrievalPipeline(
            config=ref_modules.pipe.PipelineConfig(
                stage1_model="tiny-st-bi", stage2_model="tiny-colbert",
                stage3_model="tiny-cross",
                stage1_top_k=8, stage1_bm25_top_k=8, stage2_top_k=6,
                stage3_top_k=4, stage1_use_fp16=False,
                stage2_use_fp16=False, stage3_use_fp16=False,
                stage2_max_seq_length=32, stage3_max_length=64,
                device="cpu", cache_dir=str(assets),
                index_dir=str(tmp_path_factory.mktemp("refidx_long")),
            )
        )
        ref.add_documents(list(LONG_DOCS))
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        mine = RetrievalPipeline(my_config)  # staged path
        mine.add_documents(list(LONG_DOCS))
        return ref, mine

    def test_truncation_fires(self, pipelines):
        """Guard: the fixture really is in the truncation regime."""
        _, mine = pipelines
        tok3 = mine.stage3.tokenizer
        d_len = len(tok3.tokenize_to_ids(LONG_DOCS[0]))
        q_len = len(tok3.tokenize_to_ids(QUERIES[0]))
        assert q_len + d_len + 3 > mine.config.stage3_max_length

    @pytest.mark.parametrize("query", QUERIES)
    def test_staged_end_to_end_matches_reference(self, pipelines, query):
        ref, mine = pipelines
        _assert_result_parity(
            ref.search(query, 4)["results"],
            mine.search(query, 4)["results"],
            "stage3_score", 2e-2,
        )

    def test_stage3_truncated_pair_scores_match(
        self, ref_modules, assets, my_config, pipelines
    ):
        """Direct stage-3 oracle on truncated pairs (no upstream rank
        noise): per-doc normalized scores within tolerance."""
        cands = [
            {"doc_id": i, "document": d, "score": 0.1, "stage1_score": 0.1,
             "metadata": {}, "stage": "stage1"}
            for i, d in enumerate(LONG_DOCS[:6])
        ]
        ref = ref_modules.s3.CrossEncoderReranker(ref_modules.s3.Stage3Config(
            model_name="tiny-cross", device="cpu", cache_dir=str(assets),
            use_fp16=False, max_length=64, top_k_final=4,
            use_gpu_if_available=False,
        ))
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        mine = CrossEncoderReranker(my_config)
        for q in QUERIES:
            _assert_result_parity(
                ref.rerank(q, [dict(c) for c in cands]),
                mine.rerank(q, [dict(c) for c in cands]),
                "stage3_score", 2e-2,
            )

    def test_fused_static_cap_divergence_bounded(self, my_config, pipelines):
        """The fused path truncates docs to a static cap at indexing
        (stage3_max_length - stage3_query_reserve) instead of
        longest-first per pair — a DOCUMENTED divergence (PARITY.md).
        Upstream stages are identical, so the stage-3 candidate pool
        matches; only within-pool order may shift. Assert the funnel
        stays sane and the result-set overlap is high."""
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        _, staged = pipelines
        fused = RetrievalPipeline(dataclasses.replace(
            my_config, enable_fused_search=True,
            stage2_cache_doc_embeddings=True,
        ))
        fused.add_documents(list(LONG_DOCS))
        min_overlap = 4
        for q in QUERIES:
            fo = fused.search(q, 4)
            assert fo["timing"].get("fused") is True
            so = staged.search(q, 4)
            ids_f = {r["doc_id"] for r in fo["results"]}
            ids_s = {r["doc_id"] for r in so["results"]}
            assert all(0 <= i < len(LONG_DOCS) for i in ids_f)
            min_overlap = min(min_overlap, len(ids_f & ids_s))
        # same stage-1/2 funnel => at least 3/4 of the final set agrees
        assert min_overlap >= 3, min_overlap

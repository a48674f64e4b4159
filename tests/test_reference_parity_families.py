"""End-to-end reference-oracle parity on the REAL model families.

tests/test_reference_parity.py proves funnel semantics on tiny BERT
stacks; this file proves them on the architectures the framework
actually claims to serve (VERDICT r2 next-1):

* stage 1 — a tiny **ST-Gemma3** checkpoint in the exact layout of
  google/embeddinggemma-300m: Gemma3 text model + mean Pooling +
  2_Dense + 3_Dense + Normalize, with named encode prompts in
  config_sentence_transformers.json (src/stage1_retriever.py:137-254
  loads it through SentenceTransformer and calls plain
  ``model.encode(texts)`` — no prompt_name — so only a configured
  ``default_prompt_name`` ever fires);
* stage 2 — a tiny **ModernColBERT**-style checkpoint in the layout of
  lightonai/GTE-ModernColBERT-v1 (ModernBERT body + PyLate 1_Dense),
  which the reference loads via bare AutoModel and scores by raw
  last-hidden-state MaxSim (src/stage2_rescorer.py:54-165) — hence
  ``stage2_use_projection=False`` on our side;
* stage 3 — tiny BERT cross-encoder (the real family, MiniLM, IS a
  BERT; src/stage3_reranker.py).

Both stacks load the same on-disk checkpoints; the reference executes
as the expected-value oracle, staged AND fused.

Prompt-mode note: ``stage1_prompt_mode="st-default"`` reproduces the
reference's plain-encode behavior exactly; the default "auto" mode
(model-card encode_query/encode_document prompts) is a deliberate,
PARITY.md-documented divergence and is asserted to (a) actually fire
and (b) be restored to reference behavior by the knob.
"""

from __future__ import annotations

import json
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("sentence_transformers")
transformers = pytest.importorskip("transformers")

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

PROMPTS = {
    "query": "task: search result | query: ",
    "document": "title: none | text: ",
}


def _make_fast_tokenizer(words):
    """A WordPiece-backed PreTrainedTokenizerFast that emits ONLY
    input_ids + attention_mask — Gemma3TextModel / ModernBertModel
    forwards reject token_type_ids, exactly like the real gemma /
    ModernBERT tokenizers."""
    from tokenizers import Tokenizer, normalizers, pre_tokenizers, processors
    from tokenizers.models import WordPiece
    from transformers import PreTrainedTokenizerFast

    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab = {t: i for i, t in enumerate(specials + sorted(set(words)))}
    tk = Tokenizer(WordPiece(vocab, unk_token="[UNK]"))
    tk.normalizer = normalizers.Lowercase()
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    tk.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", vocab["[CLS]"]), ("[SEP]", vocab["[SEP]"])],
    )
    return PreTrainedTokenizerFast(
        tokenizer_object=tk,
        unk_token="[UNK]", pad_token="[PAD]", cls_token="[CLS]",
        sep_token="[SEP]", mask_token="[MASK]",
        model_input_names=["input_ids", "attention_mask"],
    ), len(vocab)


class _FlatIP:
    """Exact numpy stand-in for faiss.IndexFlatIP (flat path, <1000
    docs — src/stage1_retriever.py:274-277)."""

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
            idx = np.concatenate([idx, np.full((q.shape[0], k - kk), -1)], 1)
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
    stub.IndexIVFFlat = None
    stub.write_index = lambda *a, **k: None
    stub.read_index = lambda *a, **k: None
    sys.modules.setdefault("faiss", stub)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import src.retrieval_pipeline as ref_pipe
    import src.stage1_retriever as ref_s1
    import src.stage2_rescorer as ref_s2
    import src.stage3_reranker as ref_s3

    return types.SimpleNamespace(
        s1=ref_s1, s2=ref_s2, s3=ref_s3, pipe=ref_pipe
    )


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Tiny real-family checkpoints BOTH stacks load."""
    from sentence_transformers import SentenceTransformer
    from sentence_transformers import models as st_models

    md = tmp_path_factory.mktemp("family_models")
    words = [w for t in DOCS + QUERIES for w in t.lower().split()]
    fast_tok, vocab_size = _make_fast_tokenizer(words)

    # ---- stage 1: ST-Gemma3 (embeddinggemma-300m layout) ----
    gemma_cfg = transformers.Gemma3TextConfig(
        vocab_size=vocab_size, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=48, max_position_embeddings=128,
        sliding_window=8, sliding_window_pattern=2,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        query_pre_attn_scalar=8, use_bidirectional_attention=True,
        attn_implementation="eager",
    )
    torch.manual_seed(10)
    gemma_base = md / "_gemma_base"
    transformers.Gemma3TextModel(gemma_cfg).eval().save_pretrained(
        gemma_base, safe_serialization=True
    )
    fast_tok.save_pretrained(gemma_base)
    stm = SentenceTransformer(
        modules=[
            st_models.Transformer(str(gemma_base), max_seq_length=64),
            st_models.Pooling(32, pooling_mode="mean"),
            st_models.Dense(32, 24, bias=False,
                            activation_function=torch.nn.Identity()),
            st_models.Dense(24, 16, bias=False,
                            activation_function=torch.nn.Identity()),
            st_models.Normalize(),
        ],
        prompts=dict(PROMPTS),
        device="cpu",
    )
    stm.save(str(md / "tiny-st-gemma"))
    # a second save with default_prompt_name set: plain ST encode then
    # applies THAT prompt to everything — the other reference behavior
    stm.default_prompt_name = "document"
    stm.save(str(md / "tiny-st-gemma-dp"))

    # ---- stage 2: ModernColBERT (GTE-ModernColBERT-v1 layout) ----
    mb_cfg = transformers.ModernBertConfig(
        vocab_size=vocab_size, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=128, local_attention=8,
        global_attn_every_n_layers=2, global_rope_theta=160000.0,
        local_rope_theta=10000.0, attn_implementation="eager",
        pad_token_id=0, bos_token_id=2, eos_token_id=3,
        cls_token_id=2, sep_token_id=3,
    )
    torch.manual_seed(11)
    mcb = md / "tiny-moderncolbert"
    transformers.ModernBertModel(mb_cfg).eval().save_pretrained(
        mcb, safe_serialization=True
    )
    fast_tok.save_pretrained(mcb)
    from safetensors.torch import save_file

    torch.manual_seed(12)
    sub = mcb / "1_Dense"
    sub.mkdir()
    save_file(
        {"linear.weight": torch.randn(16, 32) * 0.1},
        sub / "model.safetensors",
    )
    (mcb / "modules.json").write_text(json.dumps([
        {"idx": 0, "name": "0", "path": "",
         "type": "pylate.models.ModernBERT"},
        {"idx": 1, "name": "1", "path": "1_Dense",
         "type": "pylate.models.Dense"},
    ]))

    # ---- stage 3: BERT cross-encoder (MiniLM family) ----
    # Uses a REAL BertTokenizerFast (emits token_type_ids, like the
    # actual ms-marco-MiniLM tokenizer) — the segment ids feed the
    # type-embedding table, so a type-id-less tokenizer here would
    # change every pair logit.
    from transformers import (
        BertConfig, BertForSequenceClassification, BertTokenizerFast,
    )

    bert_vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + sorted(set(words))
    )
    vpath = md / "cross_vocab.txt"
    vpath.write_text("\n".join(bert_vocab))
    bert_tok = BertTokenizerFast(vocab_file=str(vpath), do_lower_case=True)
    torch.manual_seed(13)
    cross = md / "tiny-cross"
    BertForSequenceClassification(BertConfig(
        num_labels=1, vocab_size=len(bert_vocab), hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=128, type_vocab_size=2,
    )).eval().save_pretrained(cross, safe_serialization=True)
    bert_tok.save_pretrained(cross)
    return md


@pytest.fixture(scope="module")
def my_config(assets):
    from tristage_rag_tpu.engine.config import PipelineConfig

    return PipelineConfig(
        stage1_model="tiny-st-gemma", stage2_model="tiny-moderncolbert",
        stage3_model="tiny-cross", model_dir=str(assets),
        compute_dtype="float32", mesh_data_parallel=1,
        stage1_top_k=8, stage1_bm25_top_k=8, stage1_max_text_length=64,
        stage1_prompt_mode="st-default",
        stage2_max_seq_length=32, stage2_top_k=6,
        stage2_use_projection=False,
        stage3_max_length=64, stage3_top_k=4,
        enable_fused_search=False,
    )


def _assert_result_parity(ref_results, my_results, score_key, atol):
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


class TestGemmaStage1Oracle:
    def test_rrf_matches_reference(
        self, ref_modules, assets, my_config, tmp_path
    ):
        ref = ref_modules.s1.Stage1Retriever(ref_modules.s1.Stage1Config(
            model_name="tiny-st-gemma", device="cpu", cache_dir=str(assets),
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

    def test_dense_embeddings_match_st_encode(
        self, ref_modules, assets, my_config
    ):
        """Our bi-encoder encode equals SentenceTransformer.encode on
        the gemma stack (the full module pipeline: Gemma3 forward, mean
        pool, 2_Dense, 3_Dense, normalize — and NO prompt, matching the
        reference's plain encode)."""
        from sentence_transformers import SentenceTransformer

        stm = SentenceTransformer(
            str(assets / "tiny-st-gemma"), device="cpu"
        )
        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        mine = Stage1Retriever(my_config)
        ours_docs = mine.encode(DOCS, kind="document")
        ours_q = mine.encode(QUERIES, kind="query")
        theirs_docs = stm.encode(DOCS, convert_to_numpy=True)
        theirs_q = stm.encode(QUERIES, convert_to_numpy=True)
        np.testing.assert_allclose(ours_docs, theirs_docs, atol=2e-4)
        np.testing.assert_allclose(ours_q, theirs_q, atol=2e-4)

    def test_auto_prompt_mode_fires_and_knob_restores_parity(
        self, assets, my_config
    ):
        """Default "auto" mode applies the checkpoint's query prompt
        (deliberate divergence, PARITY.md): embeddings must differ from
        the prompt-less reference encode, and the "st-default" knob
        must restore byte-level agreement."""
        import dataclasses

        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        auto = Stage1Retriever(dataclasses.replace(
            my_config, stage1_prompt_mode="auto"
        ))
        assert auto.runtime.prompts["query"] == PROMPTS["query"]
        faithful = Stage1Retriever(my_config)
        assert faithful.runtime.prompts["query"] == ""
        e_auto = auto.encode(QUERIES, kind="query")
        e_faith = faithful.encode(QUERIES, kind="query")
        assert np.abs(e_auto - e_faith).max() > 1e-3

    def test_default_prompt_name_applies_in_st_default_mode(
        self, assets, my_config
    ):
        """When the checkpoint DOES configure default_prompt_name, plain
        ST encode applies that prompt to everything — and so must
        st-default mode (src/stage1_retriever.py:237-254 + ST
        _resolve_prompt)."""
        import dataclasses

        from sentence_transformers import SentenceTransformer

        stm = SentenceTransformer(
            str(assets / "tiny-st-gemma-dp"), device="cpu"
        )
        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        mine = Stage1Retriever(dataclasses.replace(
            my_config, stage1_model="tiny-st-gemma-dp"
        ))
        assert mine.runtime.prompts["query"] == PROMPTS["document"]
        ours = mine.encode(QUERIES, kind="query")
        theirs = stm.encode(QUERIES, convert_to_numpy=True)
        np.testing.assert_allclose(ours, theirs, atol=2e-4)


class TestModernColBERTStage2Oracle:
    def test_stage2_matches_reference(self, ref_modules, assets, my_config):
        cands = [
            {"doc_id": i, "document": d, "score": 0.1, "stage1_score": 0.1,
             "metadata": {}, "stage": "stage1"}
            for i, d in enumerate(DOCS)
        ]
        ref = ref_modules.s2.ColBERTScorer(ref_modules.s2.Stage2Config(
            model_name="tiny-moderncolbert", device="cpu",
            cache_dir=str(assets), use_fp16=False, max_seq_length=32,
            top_k_candidates=6, use_gpu_if_available=False,
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


class TestFamilyFullPipelineOracle:
    @pytest.fixture(scope="class")
    def pipelines(self, ref_modules, assets, my_config, tmp_path_factory):
        ref = ref_modules.pipe.RetrievalPipeline(
            config=ref_modules.pipe.PipelineConfig(
                stage1_model="tiny-st-gemma",
                stage2_model="tiny-moderncolbert",
                stage3_model="tiny-cross",
                stage1_top_k=8, stage1_bm25_top_k=8, stage2_top_k=6,
                stage3_top_k=4, stage1_use_fp16=False,
                stage2_use_fp16=False, stage3_use_fp16=False,
                stage2_max_seq_length=32, stage3_max_length=64,
                device="cpu", cache_dir=str(assets),
                index_dir=str(tmp_path_factory.mktemp("refidx_fam")),
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
        _assert_result_parity(
            ref.search(query, 4)["results"],
            mine.search(query, 4)["results"],
            "stage3_score", 2e-2,
        )

    def test_fused_path_matches_reference_too(self, my_config, pipelines):
        """The single-dispatch fused funnel agrees with the reference on
        the real families (short docs: truncation identical)."""
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

"""Fused single-dispatch search vs the staged path, and device fusion
vs the host fusion reference (ops/fusion.py)."""

import numpy as np
import pytest

from tristage_rag_tpu.ops.device_fusion import (
    rrf_fuse_device,
    weighted_fuse_device,
)
from tristage_rag_tpu.ops.fusion import (
    reciprocal_rank_fusion,
    weighted_fusion,
)


def _pad_ids(ids, k):
    out = np.full(k, -1, dtype=np.int32)
    out[: len(ids)] = ids
    return out


def _pad_scores(scores, k):
    out = np.zeros(k, dtype=np.float32)
    out[: len(scores)] = scores
    return out


class TestDeviceFusion:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_rrf_matches_host(self, seed):
        rng = np.random.default_rng(seed)
        dense = rng.choice(100, size=12, replace=False).tolist()
        sparse = rng.choice(100, size=9, replace=False).tolist()
        k = 16
        h_ids, h_scores = reciprocal_rank_fusion([dense, sparse], rrf_k=60.0)
        d_scores, d_ids = rrf_fuse_device(
            _pad_ids(dense, 16), _pad_ids(sparse, 12), k=k, rrf_k=60.0
        )
        d_scores, d_ids = np.asarray(d_scores), np.asarray(d_ids)
        n = min(k, len(h_ids))
        np.testing.assert_array_equal(d_ids[:n], h_ids[:n])
        np.testing.assert_allclose(d_scores[:n], h_scores[:n], rtol=1e-6)
        assert (d_ids[n:] == -1).all()

    def test_rrf_overlapping_lists(self):
        dense = [5, 3, 9, 1]
        sparse = [3, 5, 7]
        h_ids, h_scores = reciprocal_rank_fusion([dense, sparse])
        d_scores, d_ids = rrf_fuse_device(
            _pad_ids(dense, 8), _pad_ids(sparse, 8), k=8
        )
        d_ids, d_scores = np.asarray(d_ids), np.asarray(d_scores)
        np.testing.assert_array_equal(d_ids[: len(h_ids)], h_ids)
        np.testing.assert_allclose(
            d_scores[: len(h_scores)], h_scores, rtol=1e-6
        )

    @pytest.mark.parametrize("seed", [0, 3])
    def test_weighted_matches_host(self, seed):
        rng = np.random.default_rng(seed)
        dense = rng.choice(50, size=10, replace=False)
        sparse = rng.choice(50, size=7, replace=False)
        ds = np.sort(rng.random(10).astype(np.float32))[::-1].copy()
        ss = np.sort(rng.random(7).astype(np.float32))[::-1].copy()
        h_ids, h_scores = weighted_fusion(
            dense.astype(np.int64), ds, sparse.astype(np.int64), ss,
            dense_weight=0.7, sparse_weight=0.3,
        )
        d_scores, d_ids = weighted_fuse_device(
            _pad_ids(dense, 12), _pad_scores(ds, 12),
            _pad_ids(sparse, 8), _pad_scores(ss, 8),
            k=16, dense_weight=0.7, sparse_weight=0.3,
        )
        d_ids, d_scores = np.asarray(d_ids), np.asarray(d_scores)
        n = min(len(h_ids), len(d_ids))
        np.testing.assert_array_equal(d_ids[:n], h_ids[:n])
        np.testing.assert_allclose(d_scores[:n], h_scores[:n], rtol=1e-5)

    def test_weighted_degenerate_scores_normalize_to_one(self):
        # all-equal score lists -> minmax gives 1.0 (host parity)
        d_scores, d_ids = weighted_fuse_device(
            _pad_ids([1, 2], 4), _pad_scores([0.5, 0.5], 4),
            _pad_ids([3], 4), _pad_scores([2.0], 4),
            k=4,
        )
        d_scores = np.asarray(d_scores)
        assert d_scores[0] == pytest.approx(0.7)
        assert np.asarray(d_ids).tolist()[:3] == [1, 2, 3]

    def test_rrf_all_padding(self):
        s, i = rrf_fuse_device(_pad_ids([], 4), _pad_ids([], 4), k=4)
        assert (np.asarray(i) == -1).all()


@pytest.fixture(scope="module")
def fused_and_staged(tmp_path_factory):
    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    docs = [
        "JAX is a library for composable function transformations.",
        "The TPU matrix unit multiplies tiles in bfloat16.",
        "Reciprocal rank fusion combines multiple ranked retrieval lists.",
        "BM25 is a classic lexical scoring function used in search engines.",
        "ColBERT performs late interaction with per-token embeddings.",
        "Cross-encoders jointly encode a query and a document pair.",
        "The quick brown fox jumps over the lazy dog.",
        "High bandwidth memory feeds the vector processing units.",
        "Sharding a document matrix across devices scales retrieval.",
        "Flax linen modules define neural networks functionally.",
    ]
    kw = dict(
        stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
        stage3_model="tiny-bert", stage1_top_k=20, stage1_bm25_top_k=20,
        stage2_top_k=10, stage3_top_k=5, stage2_max_seq_length=32,
        stage3_max_length=64, stage1_max_text_length=64,
        compute_dtype="float32", mesh_data_parallel=1,
        stage2_cache_doc_embeddings=True, save_intermediate_results=True,
    )
    fused = RetrievalPipeline(PipelineConfig(enable_fused_search=True, **kw))
    staged = RetrievalPipeline(PipelineConfig(enable_fused_search=False, **kw))
    fused.add_documents(docs)
    staged.add_documents(docs)
    return fused, staged, docs


class TestFusedVsStaged:
    QUERIES = [
        "lexical scoring BM25 search",
        "late interaction token embeddings",
        "quick brown fox",
        "device sharding retrieval",
    ]

    def test_fused_path_is_active(self, fused_and_staged):
        fused, staged, _ = fused_and_staged
        out = fused.search("anything at all")
        assert out["timing"].get("fused") is True
        out2 = staged.search("anything at all")
        assert out2["timing"].get("fused") is None

    @pytest.mark.parametrize("query", QUERIES)
    def test_identical_rankings_and_scores(self, fused_and_staged, query):
        fused, staged, _ = fused_and_staged
        of, os_ = fused.search(query), staged.search(query)
        assert [r["doc_id"] for r in of["results"]] == [
            r["doc_id"] for r in os_["results"]
        ]
        for rf, rs in zip(of["results"], os_["results"]):
            assert rf["stage1_score"] == pytest.approx(rs["stage1_score"], rel=1e-5)
            assert rf["stage2_score"] == pytest.approx(rs["stage2_score"], rel=1e-4, abs=1e-5)
            assert rf["stage3_score"] == pytest.approx(rs["stage3_score"], rel=1e-4, abs=1e-5)
            assert rf["stage"] == "stage3"
            assert rf["document"] == rs["document"]

    @pytest.mark.parametrize("query", QUERIES[:2])
    def test_identical_intermediates(self, fused_and_staged, query):
        fused, staged, _ = fused_and_staged
        of, os_ = fused.search(query), staged.search(query)
        assert [r["doc_id"] for r in of["stage1_results"]] == [
            r["doc_id"] for r in os_["stage1_results"]
        ]
        assert [r["doc_id"] for r in of["stage2_results"]] == [
            r["doc_id"] for r in os_["stage2_results"]
        ]

    def test_result_schema(self, fused_and_staged):
        fused, _, _ = fused_and_staged
        out = fused.search("quick brown fox", top_k=3)
        assert len(out["results"]) <= 3
        for r in out["results"]:
            for key in ("doc_id", "document", "score", "stage1_score",
                        "stage2_score", "stage3_score", "metadata", "stage"):
                assert key in r
        assert out["timing"]["total_time"] is not None
        assert "performance_stats" in out

    def test_delete_respected_by_fused_path(self, fused_and_staged):
        fused, _, _ = fused_and_staged
        target = fused.search("quick brown fox")["results"][0]["doc_id"]
        fused.delete_documents([target])
        out = fused.search("quick brown fox")
        assert out["timing"].get("fused") is True
        assert all(r["doc_id"] != target for r in out["results"])
        assert all(r["doc_id"] != target for r in out["stage1_results"])

    def test_batch_search_matches_individual(self, fused_and_staged):
        """The one-dispatch lax.map batch path returns exactly what N
        individual fused searches return."""
        fused, _, _ = fused_and_staged
        queries = self.QUERIES[:3]
        batch = fused.batch_search(queries, top_k=5)
        for q, resp in zip(queries, batch):
            single = fused.search(q, top_k=5)
            assert resp["timing"].get("fused") is True
            assert [r["doc_id"] for r in resp["results"]] == [
                r["doc_id"] for r in single["results"]
            ]
            for rb, rs in zip(resp["results"], single["results"]):
                assert rb["stage3_score"] == pytest.approx(
                    rs["stage3_score"], rel=1e-5, abs=1e-6
                )

    def test_batch_search_matches_staged_batch(self, fused_and_staged):
        fused, staged, _ = fused_and_staged
        queries = self.QUERIES[:2]
        bf = fused.batch_search(queries, top_k=4)
        bs = staged.batch_search(queries, top_k=4)
        for rf, rs in zip(bf, bs):
            assert [r["doc_id"] for r in rf["results"]] == [
                r["doc_id"] for r in rs["results"]
            ]

    def test_fused_survives_incremental_add(self, fused_and_staged):
        fused, _, _ = fused_and_staged
        fused.add_documents(["a brand new document about zebras zz17"])
        out = fused.search("zebras zz17")
        assert out["timing"].get("fused") is True
        # BM25 puts the exact-match doc in the stage-1 candidates (the
        # tiny random models may rank it anywhere downstream)
        assert any("zebras" in r["document"] for r in out["stage1_results"])


class TestFusedPersistence:
    def test_fused_ready_after_reload(self, tmp_path, sample_docs):
        import dataclasses

        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
            stage3_top_k=3, stage2_max_seq_length=32, stage3_max_length=64,
            stage1_max_text_length=64, compute_dtype="float32",
            mesh_data_parallel=1, stage2_cache_doc_embeddings=True,
            enable_fused_search=True, index_dir=str(tmp_path / "idx"),
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(sample_docs)
        ranked = [r["doc_id"] for r in p.search("BM25 lexical")["results"]]
        p.save_index()

        p2 = RetrievalPipeline(dataclasses.replace(cfg))
        assert p2.load_index()
        out = p2.search("BM25 lexical")
        assert out["timing"].get("fused") is True
        assert [r["doc_id"] for r in out["results"]] == ranked


class TestFusedWeightedFusion:
    def test_weighted_fusion_fused_matches_staged(self, tmp_path, sample_docs):
        import dataclasses

        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        kw = dict(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=10, stage1_bm25_top_k=10,
            stage2_top_k=6, stage3_top_k=4, stage2_max_seq_length=32,
            stage3_max_length=64, stage1_max_text_length=64,
            compute_dtype="float32", mesh_data_parallel=1,
            stage2_cache_doc_embeddings=True, save_intermediate_results=True,
            stage1_fusion_method="weighted",
        )
        fused = RetrievalPipeline(PipelineConfig(enable_fused_search=True, **kw))
        staged = RetrievalPipeline(PipelineConfig(enable_fused_search=False, **kw))
        fused.add_documents(sample_docs)
        staged.add_documents(sample_docs)
        for q in ("BM25 lexical scoring", "token embeddings"):
            of, os_ = fused.search(q), staged.search(q)
            assert of["timing"].get("fused") is True
            assert [r["doc_id"] for r in of["stage1_results"]] == [
                r["doc_id"] for r in os_["stage1_results"]
            ]
            for rf, rs in zip(of["stage1_results"], os_["stage1_results"]):
                assert rf["stage1_score"] == pytest.approx(
                    rs["stage1_score"], rel=1e-4, abs=1e-6
                )
            assert [r["doc_id"] for r in of["results"]] == [
                r["doc_id"] for r in os_["results"]
            ]


class TestFusedLoadOverWarmCaches:
    def test_load_index_clears_stale_device_caches(self, tmp_path):
        """Loading a persisted index into a pipeline whose device caches
        hold a DIFFERENT corpus must not serve stale embeddings
        (code-review r2 finding: precompute skips present ids)."""
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=6, stage2_top_k=4,
            stage3_top_k=3, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            compute_dtype="float32", mesh_data_parallel=1,
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
            index_dir=str(tmp_path / "B"),
        )
        fresh = RetrievalPipeline(cfg)
        corpus_b = ["zebra migration zz1", "volcanic rocks zz2",
                    "sea bioluminescence zz3"]
        fresh.add_documents(corpus_b)
        expect = [r["doc_id"] for r in fresh.search("volcanic zz2")["results"]]
        fresh.save_index()

        warm = RetrievalPipeline(cfg)
        warm.add_documents(["apple pie aa1", "bike repair aa2", "tax aa3"])
        warm.search("warmup")  # device caches now hold corpus A
        assert warm.load_index()
        out = warm.search("volcanic zz2")
        assert out["timing"].get("fused") is True
        assert all("zz" in r["document"] for r in out["results"])
        assert [r["doc_id"] for r in out["results"]] == expect


class TestFusedConfigMatrix:
    @pytest.mark.parametrize("overrides", [
        {"stage2_scoring_method": "colbert"},
        {"stage3_activation": "softmax"},
        {"stage3_normalize_scores": False},
        {"stage1_enable_bm25": False},
        {"stage2_cache_int8": True},
    ])
    def test_parity_across_config_variants(self, overrides, sample_docs):
        """The fused program honors every scoring/activation/fusion
        config the staged path does."""
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        kw = dict(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=10, stage1_bm25_top_k=10,
            stage2_top_k=6, stage3_top_k=4, stage2_max_seq_length=32,
            stage3_max_length=64, stage1_max_text_length=64,
            compute_dtype="float32", mesh_data_parallel=1,
            stage2_cache_doc_embeddings=True,
        )
        kw.update(overrides)
        fused = RetrievalPipeline(PipelineConfig(enable_fused_search=True, **kw))
        staged = RetrievalPipeline(PipelineConfig(enable_fused_search=False, **kw))
        fused.add_documents(sample_docs)
        staged.add_documents(sample_docs)
        for q in ("BM25 lexical scoring", "late interaction tokens"):
            of, os_ = fused.search(q), staged.search(q)
            assert of["timing"].get("fused") is True, overrides
            assert [r["doc_id"] for r in of["results"]] == [
                r["doc_id"] for r in os_["results"]
            ], overrides
            for rf, rs in zip(of["results"], os_["results"]):
                assert rf["stage3_score"] == pytest.approx(
                    rs["stage3_score"], rel=1e-4, abs=1e-5
                ), overrides


class TestPairWidthBudget:
    def test_short_corpus_uses_small_bucket(self, sample_docs):
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        kw = dict(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=10, stage2_top_k=6,
            stage3_top_k=4, stage2_max_seq_length=32,
            stage3_max_length=128, stage1_max_text_length=64,
            compute_dtype="float32", mesh_data_parallel=1,
            stage2_cache_doc_embeddings=True,
        )
        fused = RetrievalPipeline(PipelineConfig(enable_fused_search=True, **kw))
        staged = RetrievalPipeline(PipelineConfig(enable_fused_search=False, **kw))
        fused.add_documents(sample_docs)
        staged.add_documents(sample_docs)
        f = fused._fused
        assert f.doc_tokens.max_len > 0
        assert f._d3_budget() < f.doc_tokens.seq_len  # short docs -> small bucket

        q = "lexical scoring BM25"
        of, os_ = fused.search(q), staged.search(q)
        assert of["timing"].get("fused") is True
        assert [r["doc_id"] for r in of["results"]] == [
            r["doc_id"] for r in os_["results"]
        ]
        for rf, rs in zip(of["results"], os_["results"]):
            assert rf["stage3_score"] == pytest.approx(
                rs["stage3_score"], rel=1e-4, abs=1e-5
            )

        # a long doc crosses the bucket boundary: budget grows, parity holds
        long_doc = " ".join(["colbert token interaction"] * 60)
        fused.add_documents([long_doc])
        staged.add_documents([long_doc])
        assert f._d3_budget() == f.doc_tokens.seq_len
        of2 = fused.search("colbert token interaction", top_k=4)
        os2 = staged.search("colbert token interaction", top_k=4)
        assert of2["timing"].get("fused") is True
        assert [r["doc_id"] for r in of2["results"]] == [
            r["doc_id"] for r in os2["results"]
        ]


class TestStage2GatherWidthBudget:
    @pytest.mark.parametrize("int8_cache", [False, True])
    def test_short_corpus_gathers_small_bucket(self, sample_docs, int8_cache):
        """_d2_budget: short-doc corpora gather stage-2 candidates at
        the smallest covering bucket instead of stage2_max_seq_length —
        rankings must match the staged path exactly (sliced-off tokens
        are mask-zero)."""
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        kw = dict(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=10, stage2_top_k=6,
            stage3_top_k=4, stage2_max_seq_length=64,
            stage3_max_length=64, stage1_max_text_length=64,
            compute_dtype="float32", mesh_data_parallel=1,
            stage2_cache_doc_embeddings=True,
            stage2_cache_int8=int8_cache,
        )
        fused = RetrievalPipeline(PipelineConfig(enable_fused_search=True, **kw))
        staged = RetrievalPipeline(PipelineConfig(enable_fused_search=False, **kw))
        fused.add_documents(sample_docs)
        staged.add_documents(sample_docs)
        f = fused._fused
        cache = fused.stage2._cache
        assert 0 < cache.max_len <= 32  # sample docs are short
        assert f._d2_budget() == 32 < cache.seq_len

        q = "lexical scoring BM25"
        of, os_ = fused.search(q), staged.search(q)
        assert of["timing"].get("fused") is True
        assert [r["doc_id"] for r in of["results"]] == [
            r["doc_id"] for r in os_["results"]
        ]
        for rf, rs in zip(of["results"], os_["results"]):
            assert rf["stage2_score"] == pytest.approx(
                rs["stage2_score"], rel=1e-4, abs=1e-5
            )

        # a long doc crosses the bucket: budget grows, parity holds
        long_doc = " ".join(["colbert token interaction"] * 40)
        fused.add_documents([long_doc])
        staged.add_documents([long_doc])
        assert cache.max_len > 32
        assert f._d2_budget() == 64
        of2 = fused.search("colbert token interaction", top_k=4)
        os2 = staged.search("colbert token interaction", top_k=4)
        assert of2["timing"].get("fused") is True
        assert [r["doc_id"] for r in of2["results"]] == [
            r["doc_id"] for r in os2["results"]
        ]


class TestFusedCircuitBreaker:
    def test_repeated_failures_disable_fused_path(self, tmp_path, sample_docs):
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=6, stage2_top_k=4,
            stage3_top_k=3, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            compute_dtype="float32", mesh_data_parallel=1,
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(sample_docs[:4])

        def boom(*a, **kw):
            raise RuntimeError("injected fused failure")

        p._fused.search = boom
        p._fused.search_batch = boom
        for _ in range(p._FUSED_FAILURE_LIMIT):
            out = p.search("BM25 lexical")  # staged fallback each time
            assert out["results"] and out["timing"].get("fused") is None
        # breaker tripped: fused gone, staged path serves directly
        assert p._fused is None
        out = p.search("BM25 lexical")
        assert out["results"]

    def test_success_resets_failure_count(self, tmp_path, sample_docs):
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=6, stage2_top_k=4,
            stage3_top_k=3, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            compute_dtype="float32", mesh_data_parallel=1,
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(sample_docs[:4])
        p._fused_failures = p._FUSED_FAILURE_LIMIT - 1
        out = p.search("BM25 lexical")
        assert out["timing"].get("fused") is True
        assert p._fused_failures == 0


class TestFusedFallback:
    def test_no_cache_means_staged(self, tiny_config, sample_docs):
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = dataclasses.replace(
            tiny_config,
            enable_fused_search=True,
            stage2_cache_doc_embeddings=False,
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(sample_docs)
        out = p.search("BM25 lexical")
        assert out["timing"].get("fused") is None
        assert out["results"]

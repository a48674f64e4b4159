"""Serving result cache (``enable_result_cache``, VERDICT r2 next-7).

The fused funnel encodes the query inside its single XLA dispatch, so
an embedding-level cache cannot skip device work in serving — repeated
queries are served by caching the RESULT, invalidated on any index
mutation. Batch lookups also dedupe repeated queries within one batch.
"""

from __future__ import annotations

import dataclasses

import pytest


@pytest.fixture()
def cache_pipeline(tiny_config):
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    cfg = dataclasses.replace(
        tiny_config, enable_result_cache=True, result_cache_size=8,
    )
    p = RetrievalPipeline(cfg)
    p.add_documents([
        f"document {i} about topic {i % 3} fox river" for i in range(10)
    ])
    return p


class TestResultCache:
    def test_hit_returns_identical_results_and_marks_timing(
        self, cache_pipeline
    ):
        p = cache_pipeline
        q = "fox river topic 1"
        a = p.search(q, top_k=3)
        assert "cached" not in a["timing"]
        b = p.search(q, top_k=3)
        assert b["timing"].get("cached") is True
        assert [r["doc_id"] for r in a["results"]] == [
            r["doc_id"] for r in b["results"]
        ]
        assert p.result_cache_stats["hits"] == 1

    def test_different_top_k_is_a_different_entry(self, cache_pipeline):
        p = cache_pipeline
        q = "fox river topic 1"
        p.search(q, top_k=3)
        out = p.search(q, top_k=5)
        assert "cached" not in out["timing"]

    def test_mutating_result_does_not_poison_cache(self, cache_pipeline):
        p = cache_pipeline
        q = "fox river topic 2"
        a = p.search(q, top_k=3)
        a["results"][0]["document"] = "CLOBBERED"
        b = p.search(q, top_k=3)
        assert b["results"][0]["document"] != "CLOBBERED"

    @pytest.mark.parametrize(
        "mutate",
        ["add", "delete", "clear"],
    )
    def test_index_mutation_invalidates(self, cache_pipeline, mutate):
        p = cache_pipeline
        q = "fox river topic 0"
        p.search(q, top_k=3)
        if mutate == "add":
            p.add_documents(["a fresh fox river topic 0 document"])
        elif mutate == "delete":
            p.delete_documents([0])
        else:
            p.clear_index()
            p.add_documents(["rebuilt fox river topic 0 corpus"])
        out = p.search(q, top_k=3)
        assert "cached" not in out["timing"], (
            "stale result served after index mutation"
        )

    def test_batch_search_dedupes_and_caches(self, cache_pipeline):
        p = cache_pipeline
        qs = ["fox topic 0", "fox topic 1", "fox topic 0", "fox topic 1",
              "fox topic 0"]
        outs = p.batch_search(qs, top_k=3)
        assert len(outs) == len(qs)
        assert [r["doc_id"] for r in outs[0]["results"]] == [
            r["doc_id"] for r in outs[2]["results"]
        ]
        # second pass: all hits
        before = p.result_cache_stats["hits"]
        outs2 = p.batch_search(qs, top_k=3)
        assert all(o["timing"].get("cached") for o in outs2)
        assert p.result_cache_stats["hits"] == before + len(qs)

    def test_lru_eviction_respects_size(self, cache_pipeline):
        p = cache_pipeline
        for i in range(12):  # cache size is 8
            p.search(f"query number {i} fox", top_k=3)
        assert len(p._result_cache) <= 8

    def test_warmup_bypasses_cache(self, cache_pipeline):
        """warmup()'s throwaway queries must neither seed the cache
        (the measured window would serve them as hits) nor collapse
        through the dedup path (the batch-shape compiles are warmup's
        whole purpose) — code-review r3 finding."""
        p = cache_pipeline
        assert p.warmup()
        assert not p._result_cache
        assert p.result_cache_stats == {"hits": 0, "misses": 0}
        # the first real repeat of the warmup query is a miss then hit
        q = p.stage1.documents[0][:64]
        p.search(q, top_k=1)
        out = p.search(q, top_k=1)
        assert out["timing"].get("cached") is True

    def test_hit_returns_empty_intermediates(self, tiny_config):
        """Cached entries drop stage1/stage2 intermediates (up to
        stage1_top_k full documents per entry — a multi-GB host cache
        under save_intermediate_results)."""
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = dataclasses.replace(
            tiny_config, enable_result_cache=True,
            save_intermediate_results=True,
        )
        p = RetrievalPipeline(cfg)
        p.add_documents([f"fox doc {i}" for i in range(6)])
        a = p.search("fox", top_k=3)
        assert a["stage1_results"]  # miss carries intermediates
        b = p.search("fox", top_k=3)
        assert b["timing"].get("cached") is True
        assert b["stage1_results"] == [] and b["stage2_results"] == []

    def test_disabled_by_default(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(tiny_config)
        p.add_documents(["one fox document"])
        p.search("fox", top_k=1)
        out = p.search("fox", top_k=1)
        assert "cached" not in out["timing"]
        assert not p._result_cache

"""Device-cache persistence (`persist_device_caches`).

load_index without it re-encodes the whole corpus to refill the
stage-2 token-embedding cache and the stage-3 token-id cache — the
dominant restart cost (~1 chip-minute per 50k docs at measured fill
rates). With the knob on, save_index writes both caches (npz + JSON
meta, never pickle) and load_index restores them, skipping the
re-encode entirely. Any mismatch — model, doc count, dtype, int8 mode,
mesh split — falls back to the refill path.
"""

from __future__ import annotations

import numpy as np
import pytest

DOCS = [f"doc {i} about topic {i % 4} quick brown fox jumps"
        for i in range(14)]


def _cfg(tmp_path, **extra):
    from tristage_rag_tpu.engine.config import PipelineConfig

    kw = dict(
        stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
        stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
        stage3_top_k=3, stage1_max_text_length=64,
        stage2_max_seq_length=32, stage3_max_length=64,
        mesh_data_parallel=1, compute_dtype="float32",
        stage2_cache_doc_embeddings=True, enable_fused_search=True,
        persist_device_caches=True, index_dir=str(tmp_path / "idx"),
    )
    kw.update(extra)
    return PipelineConfig(**kw)


def _build_and_save(tmp_path, **extra):
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    p = RetrievalPipeline(_cfg(tmp_path, **extra))
    p.add_documents(list(DOCS))
    out = p.search("quick brown fox topic 2", top_k=3)
    assert out["timing"].get("fused") is True
    p.save_index()
    return [r["doc_id"] for r in out["results"]]


class TestRoundTrip:
    @pytest.mark.parametrize("int8", [False, True])
    def test_reload_skips_reencode_and_ranks_identically(
        self, tmp_path, monkeypatch, int8
    ):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        extra = {"stage2_cache_int8": int8}
        ref = _build_and_save(tmp_path, **extra)

        p2 = RetrievalPipeline(_cfg(tmp_path, **extra))
        p2.initialize_stages()

        # any refill attempt is a test failure: the caches must restore
        def boom(*a, **kw):
            raise AssertionError("re-encode ran despite persisted caches")

        monkeypatch.setattr(p2.stage2, "precompute", boom)
        assert p2.load_index()
        if p2._fused is not None:
            assert p2._fused.doc_tokens.covers_count(len(DOCS))
        out = p2.search("quick brown fox topic 2", top_k=3)
        assert out["timing"].get("fused") is True
        assert [r["doc_id"] for r in out["results"]] == ref

    def test_mismatched_model_refills(self, tmp_path):
        import json
        from pathlib import Path

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        ref = _build_and_save(tmp_path)
        meta = Path(tmp_path / "idx" / "device_caches.json")
        m = json.loads(meta.read_text())
        m["stage2_model"] = "some-other-model"
        meta.write_text(json.dumps(m))

        p2 = RetrievalPipeline(_cfg(tmp_path))
        calls = {"n": 0}
        p2.initialize_stages()
        orig = p2.stage2.precompute

        def counted(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        p2.stage2.precompute = counted
        assert p2.load_index()
        assert calls["n"] > 0  # fell back to the re-encode path
        out = p2.search("quick brown fox topic 2", top_k=3)
        assert [r["doc_id"] for r in out["results"]] == ref

    def test_same_count_different_corpus_refills(self, tmp_path):
        """Row ids double as cache keys — a same-COUNT but
        different-CONTENT corpus must refill (the corpus fingerprint
        catches what the doc-count check cannot)."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        _build_and_save(tmp_path)
        # overwrite the index with a different same-size corpus,
        # WITHOUT persisting caches (stale npz files remain on disk)
        p_mid = RetrievalPipeline(_cfg(tmp_path, persist_device_caches=False))
        p_mid.add_documents(
            [f"entirely different text {i} lorem ipsum" for i in
             range(len(DOCS))]
        )
        p_mid.save_index()

        p2 = RetrievalPipeline(_cfg(tmp_path))
        p2.initialize_stages()
        calls = {"n": 0}
        orig = p2.stage2.precompute

        def counted(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        p2.stage2.precompute = counted
        assert p2.load_index()
        assert calls["n"] > 0  # stale caches refused, refill ran
        out = p2.search("entirely different text 3", top_k=3)
        assert len(out["results"]) == 3

    def test_int8_mode_mismatch_refills(self, tmp_path):
        """Saved bf16 cache + int8-configured pipeline: the cache-level
        dtype guard refuses and the refill produces a working pipeline."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        _build_and_save(tmp_path, stage2_cache_int8=False)
        p2 = RetrievalPipeline(_cfg(tmp_path, stage2_cache_int8=True))
        assert p2.load_index()
        out = p2.search("quick brown fox topic 2", top_k=3)
        assert len(out["results"]) == 3


class TestCacheUnits:
    def test_token_cache_bf16_bit_exact_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from tristage_rag_tpu.index.token_cache import DeviceTokenCache

        rng = np.random.default_rng(0)
        c = DeviceTokenCache(seq_len=8, dim=16, dtype="bfloat16")
        emb = jnp.asarray(rng.standard_normal((5, 8, 16)), jnp.float32)
        mask = jnp.ones((5, 8), jnp.int32)
        c.add(list(range(5)), emb, mask)
        path = tmp_path / "c.npz"
        c.save(path)
        c2 = DeviceTokenCache(seq_len=8, dim=16, dtype="bfloat16")
        assert c2.load(path)
        assert c2.covers(range(5))
        a, am = c.gather([0, 3])
        b, bm = c2.gather([0, 3])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(am), np.asarray(bm))

    def test_token_cache_guards(self, tmp_path):
        import jax.numpy as jnp

        from tristage_rag_tpu.index.token_cache import DeviceTokenCache

        c = DeviceTokenCache(seq_len=8, dim=16, dtype="bfloat16")
        c.add([0], jnp.zeros((1, 8, 16)), jnp.ones((1, 8), jnp.int32))
        path = tmp_path / "c.npz"
        c.save(path)
        # seq mismatch
        assert not DeviceTokenCache(seq_len=16, dim=16).load(path)
        # int8-mode mismatch
        assert not DeviceTokenCache(
            seq_len=8, dim=16, quantize=True
        ).load(path)
        # missing file
        assert not DeviceTokenCache(seq_len=8, dim=16).load(
            tmp_path / "nope.npz"
        )

    def test_doc_tokens_roundtrip_preserves_max_len(self, tmp_path):
        from tristage_rag_tpu.engine.factory import build_runtime
        from tristage_rag_tpu.index.doc_tokens import DocTokenCache

        _, tok = build_runtime(
            "cross", "tiny-bert", "./models", compute_dtype="float32"
        )
        sep = tok.sep_id if hasattr(tok, "sep_id") else 0
        c = DocTokenCache(seq_len=32, sep_id=sep)
        c.add([0, 1], ["short doc", "a rather longer document here"], tok)
        path = tmp_path / "d.npz"
        c.save(path)
        c2 = DocTokenCache(seq_len=32, sep_id=sep)
        assert c2.load(path)
        assert c2.max_len == c.max_len
        assert c2.covers_count(2)
        a, al = c.state()
        b, bl = c2.state()
        np.testing.assert_array_equal(
            np.asarray(a)[:2], np.asarray(b)[:2]
        )
        np.testing.assert_array_equal(
            np.asarray(al)[:2], np.asarray(bl)[:2]
        )

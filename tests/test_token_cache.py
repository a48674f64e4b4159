import numpy as np
import pytest

from tristage_rag_tpu.index.token_cache import DeviceTokenCache


class TestDeviceTokenCache:
    def _data(self, n, l=8, d=16, seed=0):
        rng = np.random.default_rng(seed)
        emb = rng.standard_normal((n, l, d)).astype(np.float32)
        mask = (rng.random((n, l)) > 0.3).astype(np.int32)
        mask[:, 0] = 1
        return emb, mask

    def test_add_gather_roundtrip(self):
        cache = DeviceTokenCache(seq_len=8, dim=16, dtype="float32")
        emb, mask = self._data(5)
        assert cache.add([0, 1, 2, 3, 4], emb, mask) == 5
        ge, gm = cache.gather([3, 1])
        np.testing.assert_allclose(np.asarray(ge), emb[[3, 1]], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(gm), mask[[3, 1]])

    def test_padding_ids_masked_out(self):
        cache = DeviceTokenCache(seq_len=8, dim=16, dtype="float32")
        emb, mask = self._data(2)
        cache.add([0, 1], emb, mask)
        ge, gm = cache.gather([0, -1, 1, -1])
        gm = np.asarray(gm)
        assert (gm[1] == 0).all() and (gm[3] == 0).all()
        assert (gm[0] == mask[0]).all()

    def test_growth_preserves_rows(self):
        cache = DeviceTokenCache(seq_len=4, dim=8, dtype="float32")
        e1, m1 = self._data(10, l=4, d=8, seed=1)
        cache.add(list(range(10)), e1, m1)
        # trigger growth well past MIN_CAPACITY
        e2, m2 = self._data(1, l=4, d=8, seed=2)
        cache.add([1000], e2, m2)
        ge, _ = cache.gather([7])
        np.testing.assert_allclose(np.asarray(ge)[0], e1[7], rtol=1e-6)
        assert 1000 in cache

    def test_cap_refuses(self):
        cache = DeviceTokenCache(seq_len=4, dim=8, max_docs=16)
        e, m = self._data(1, l=4, d=8)
        assert cache.add([20], e, m) == 0
        assert 20 not in cache
        assert not cache.covers([20])

    def test_sparse_ids_and_contains(self):
        cache = DeviceTokenCache(seq_len=4, dim=8, dtype="float32")
        e, m = self._data(3, l=4, d=8)
        cache.add([5, 17, 100], e, m)
        assert cache.covers([5, 100]) and not cache.covers([5, 6])
        assert cache.size == 3

    def test_clear(self):
        cache = DeviceTokenCache(seq_len=4, dim=8, dtype="float32")
        e, m = self._data(2, l=4, d=8)
        cache.add([0, 1], e, m)
        cache.clear()
        assert cache.size == 0
        _, gm = cache.gather([0])
        assert (np.asarray(gm) == 0).all()


class TestReserve:
    def test_reserve_prevents_mid_fill_growth(self):
        cache = DeviceTokenCache(seq_len=4, dim=8, dtype="float32")
        assert cache.reserve(1023)
        cap = cache.capacity
        assert cap >= 1024
        rng = np.random.default_rng(0)
        for start in range(0, 1024, 256):
            ids = list(range(start, start + 256))
            emb = rng.standard_normal((256, 4, 8)).astype(np.float32)
            mask = np.ones((256, 4), dtype=np.int32)
            cache.add(ids, emb, mask)
            assert cache.capacity == cap  # no growth mid-fill
        assert cache.size == 1024

    def test_reserve_respects_max_docs(self):
        cache = DeviceTokenCache(seq_len=4, dim=8, max_docs=128)
        assert not cache.reserve(1000)
        assert cache.reserve(100)

    def test_over_cap_corpus_still_reserves_cacheable_prefix(self):
        """stage2.precompute clamps reserve to the cap: an over-cap
        corpus must pre-size the cacheable prefix in ONE growth, not
        refuse and regrow per batch (the recompile class reserve()
        exists to prevent)."""
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.stage2 import ColBERTScorer

        cfg = PipelineConfig(
            stage2_model="tiny-modernbert", stage2_max_seq_length=16,
            stage2_cache_doc_embeddings=True, stage2_cache_max_docs=8,
            stage2_batch_size=4, mesh_data_parallel=1,
            compute_dtype="float32",
        )
        s2 = ColBERTScorer(cfg, mesh=None)
        docs = [f"doc {i}" for i in range(12)]  # ids 8..11 over the cap
        stored = s2.precompute(list(range(12)), docs)
        assert stored == 8  # cacheable prefix cached, remainder refused
        assert s2._cache.capacity >= 8

    def test_over_cap_boundary_batch_keeps_cacheable_docs(self):
        """A batch straddling the cap must still store its cacheable
        ids: add() refuses whole batches containing an over-cap id, so
        precompute filters BEFORE batching (ADVICE r2 item 3 — the
        boundary batch silently dropped up to batch_size-1 docs and
        those queries re-encoded host-side forever)."""
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.stage2 import ColBERTScorer

        cfg = PipelineConfig(
            stage2_model="tiny-modernbert", stage2_max_seq_length=16,
            stage2_cache_doc_embeddings=True, stage2_cache_max_docs=10,
            stage2_batch_size=4, mesh_data_parallel=1,
            compute_dtype="float32",
        )
        s2 = ColBERTScorer(cfg, mesh=None)
        docs = [f"doc {i}" for i in range(12)]  # batch [8..11] straddles
        stored = s2.precompute(list(range(12)), docs)
        assert stored == 10  # ids 8 and 9 must not be lost
        assert 8 in s2._cache and 9 in s2._cache
        assert 10 not in s2._cache

    def test_capacity_never_exceeds_rounded_max_docs(self):
        """Shard rounding must round against the same bound the refusal
        check uses (index/token_cache.py::grown_capacity)."""
        from tristage_rag_tpu.index.token_cache import grown_capacity

        cap = grown_capacity(0, 100, max_docs=100, shards=8)
        assert cap == 104  # 100 rounded up to the shard multiple
        assert grown_capacity(0, 101, max_docs=100, shards=8) is None

    def test_doc_token_cache_reserve(self):
        from tristage_rag_tpu.index.doc_tokens import DocTokenCache

        c = DocTokenCache(seq_len=8, sep_id=3)
        assert c.reserve(999)
        assert c.capacity >= 1000


class TestQuantizedTokenCache:
    def _unit_norm_data(self, n, l=8, d=16, seed=0):
        rng = np.random.default_rng(seed)
        emb = rng.standard_normal((n, l, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        mask = (rng.random((n, l)) > 0.3).astype(np.int32)
        mask[:, 0] = 1
        return emb, mask

    def test_roundtrip_error_bounded(self):
        cache = DeviceTokenCache(seq_len=8, dim=16, quantize=True)
        emb, mask = self._unit_norm_data(5)
        assert cache.add([0, 1, 2, 3, 4], emb, mask) == 5
        ge, gm = cache.gather([3, 1])
        # symmetric per-token int8: |err| <= scale/2 = max|x| / 254
        err = np.abs(np.asarray(ge) - emb[[3, 1]])
        bound = np.max(np.abs(emb[[3, 1]]), axis=-1, keepdims=True) / 254
        assert (err <= bound + 1e-7).all()
        np.testing.assert_array_equal(np.asarray(gm), mask[[3, 1]])

    def test_halves_embedding_bytes(self):
        q = DeviceTokenCache(seq_len=8, dim=16, quantize=True)
        f = DeviceTokenCache(seq_len=8, dim=16)  # bf16 default
        emb, mask = self._unit_norm_data(2)
        q.add([0, 1], emb, mask)
        f.add([0, 1], emb, mask)
        assert q.state()[0].dtype == np.int8
        assert q.state()[0].nbytes * 2 == f.state()[0].nbytes

    def test_growth_preserves_quantized_rows(self):
        cache = DeviceTokenCache(seq_len=4, dim=8, quantize=True)
        e1, m1 = self._unit_norm_data(10, l=4, d=8, seed=1)
        cache.add(list(range(10)), e1, m1)
        before = np.asarray(cache.gather([7])[0])
        e2, m2 = self._unit_norm_data(1, l=4, d=8, seed=2)
        cache.add([1000], e2, m2)
        after = np.asarray(cache.gather([7])[0])
        np.testing.assert_array_equal(before, after)

    def test_maxsim_ranking_preserved(self):
        """Quantization keeps MaxSim rankings on well-separated docs."""
        from tristage_rag_tpu.ops.maxsim import maxsim_scores

        q_emb, q_mask = self._unit_norm_data(1, l=6, d=32, seed=3)
        d_emb, d_mask = self._unit_norm_data(16, l=8, d=32, seed=4)
        cache = DeviceTokenCache(seq_len=8, dim=32, quantize=True)
        cache.add(list(range(16)), d_emb, d_mask)
        ge, gm = cache.gather(list(range(16)))
        exact = np.asarray(maxsim_scores(q_emb[0], q_mask[0], d_emb, d_mask))
        quant = np.asarray(
            maxsim_scores(q_emb[0], q_mask[0], np.asarray(ge), np.asarray(gm))
        )
        np.testing.assert_allclose(quant, exact, atol=5e-3)
        assert list(np.argsort(-exact)[:3]) == list(np.argsort(-quant)[:3])


class TestStage2DeviceCacheIntegration:
    def test_cached_scores_match_uncached(self, tiny_config):
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        docs = [f"document body number {i} with shared words" for i in range(12)]
        base = RetrievalPipeline(tiny_config)
        base.add_documents(docs)
        cached_cfg = dataclasses.replace(
            tiny_config, stage2_cache_doc_embeddings=True
        )
        cached = RetrievalPipeline(cached_cfg)
        cached.add_documents(docs)
        assert cached.stage2._cache is not None and cached.stage2._cache.size == 12

        q = "document number 7"
        a = base.search(q, top_k=5)["results"]
        b = cached.search(q, top_k=5)["results"]
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
        np.testing.assert_allclose(
            [r["stage2_score"] for r in a],
            [r["stage2_score"] for r in b],
            rtol=1e-4, atol=1e-5,
        )
        # batched path hits the device cache too
        outs = cached.batch_search([q, "shared words"], top_k=5)
        assert [r["doc_id"] for r in outs[0]["results"]] == [
            r["doc_id"] for r in b
        ]

    def test_cap_fallback_still_correct(self, tiny_config):
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = dataclasses.replace(
            tiny_config, stage2_cache_doc_embeddings=True,
            stage2_cache_max_docs=4,
        )
        p = RetrievalPipeline(cfg)
        docs = [f"text chunk {i}" for i in range(10)]
        p.add_documents(docs)  # ids 4..9 exceed the cap
        out = p.search("text chunk 7", top_k=3)
        assert out["results"]  # falls back to re-encode, still answers


class TestMaxLenTracking:
    """max_len feeds the fused funnel's stage-2 gather bucket
    (engine/fused.py::_d2_budget) — it must never under-report a stored
    row's valid length, or gathered candidates would lose real tokens."""

    def _add(self, cache, ids, lengths, l, d=8, seed=0):
        rng = np.random.default_rng(seed)
        emb = rng.standard_normal((len(ids), l, d)).astype(np.float32)
        mask = np.zeros((len(ids), l), dtype=np.int32)
        for r, n in enumerate(lengths):
            mask[r, :n] = 1
        cache.add(ids, emb, mask)
        return emb, mask

    def test_tracks_longest_row(self):
        cache = DeviceTokenCache(seq_len=16, dim=8, dtype="float32")
        assert cache.max_len == 0
        self._add(cache, [0, 1], [3, 7], l=16)
        assert cache.max_len == 7
        self._add(cache, [2], [5], l=16, seed=1)
        assert cache.max_len == 7  # shorter rows never shrink it
        self._add(cache, [3], [12], l=16, seed=2)
        assert cache.max_len == 12

    def test_device_mask_pins_full_width(self):
        import jax.numpy as jnp

        cache = DeviceTokenCache(seq_len=16, dim=8, dtype="float32")
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((1, 16, 8)).astype(np.float32)
        mask = jnp.asarray(np.ones((1, 16), dtype=np.int32))
        cache.add([0], emb, mask)
        # a device mask would cost a fetch to inspect -> conservative
        assert cache.max_len == cache.seq_len

    def test_interior_zero_mask_reports_last_position(self):
        """max_len must be last-valid-position + 1, not popcount: a
        mask with interior zeros (punctuation skiplists etc.) reaching
        position 11 must not report 2 and let the _d2_budget slice
        drop real tokens (code-review finding, session 12)."""
        cache = DeviceTokenCache(seq_len=16, dim=8, dtype="float32")
        rng = np.random.default_rng(5)
        emb = rng.standard_normal((1, 16, 8)).astype(np.float32)
        mask = np.zeros((1, 16), dtype=np.int32)
        mask[0, 0] = 1
        mask[0, 11] = 1  # two valid tokens, furthest at position 11
        cache.add([0], emb, mask)
        assert cache.max_len == 12

    def test_clear_resets(self):
        cache = DeviceTokenCache(seq_len=16, dim=8, dtype="float32")
        self._add(cache, [0], [9], l=16)
        cache.clear()
        assert cache.max_len == 0

    def test_persistence_roundtrip(self, tmp_path):
        cache = DeviceTokenCache(seq_len=16, dim=8, dtype="float32")
        self._add(cache, [0, 1], [4, 11], l=16)
        path = tmp_path / "cache.npz"
        cache.save(path)
        fresh = DeviceTokenCache(seq_len=16, dim=8, dtype="float32")
        assert fresh.load(path)
        assert fresh.max_len == 11

    def test_legacy_snapshot_defaults_to_seq_len(self, tmp_path):
        import json

        cache = DeviceTokenCache(seq_len=16, dim=8, dtype="float32")
        self._add(cache, [0], [4], l=16)
        path = tmp_path / "cache.npz"
        cache.save(path)
        # strip max_len from the meta, as a pre-tracking snapshot would be
        z = dict(np.load(path))
        meta = json.loads(bytes(z["meta"]).decode())
        meta.pop("max_len")
        z["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
        np.savez(path, **z)
        fresh = DeviceTokenCache(seq_len=16, dim=8, dtype="float32")
        assert fresh.load(path)
        assert fresh.max_len == fresh.seq_len

    def test_int8_dequantize_gather_width_slices_before_f32(self):
        from tristage_rag_tpu.index.token_cache import dequantize_gather
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        x = rng.standard_normal((4, 16, 8)).astype(np.float32)
        cache = DeviceTokenCache(seq_len=16, dim=8, quantize=True)
        mask = np.ones((4, 16), dtype=np.int32)
        cache.add([0, 1, 2, 3], x, mask)
        buf, scale, _ = cache.state()
        ids = jnp.asarray([2, 0])
        full = dequantize_gather(buf, scale, ids)
        sliced = dequantize_gather(buf, scale, ids, width=8)
        np.testing.assert_array_equal(
            np.asarray(full)[:, :8], np.asarray(sliced)
        )

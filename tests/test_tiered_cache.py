"""Two-tier stage-2 token cache (TieredTokenCache).

The one-chip answer to the 192-token-window 500k-doc OOM (VERDICT r4
weak-8): every doc pays HBM for the first ``hot_window`` tokens; only
docs that actually exceed it occupy a tail slot. Scores must be
IDENTICAL to a flat cache at the same total window — through the raw
gather, the staged rescorer, and the fused single-dispatch funnel —
and persistence must round-trip both tiers plus the doc->slot map.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tristage_rag_tpu.index.token_cache import (
    DeviceTokenCache, TieredTokenCache,
)


def _mixed_rows(rng, n, seq, dim, long_every=3):
    """[n, seq, dim] embeddings with row i valid to a varying length —
    every ``long_every``-th row runs past any hot window."""
    emb = rng.standard_normal((n, seq, dim)).astype(np.float32)
    mask = np.zeros((n, seq), dtype=np.int32)
    lengths = []
    for i in range(n):
        ln = seq - (i % 2) if i % long_every == 0 else 2 + (i % 5)
        mask[i, :ln] = 1
        lengths.append(ln)
    emb *= mask[..., None]
    return emb, mask, lengths


class TestTieredUnit:
    @pytest.mark.parametrize("quantize", [False, True])
    def test_gather_matches_flat(self, quantize):
        rng = np.random.default_rng(0)
        seq, hot, dim, n = 24, 16, 8, 30
        emb, mask, _ = _mixed_rows(rng, n, seq, dim)
        flat = DeviceTokenCache(
            seq_len=seq, dim=dim, dtype="float32", quantize=quantize
        )
        tiered = TieredTokenCache(
            seq_len=seq, dim=dim, hot_len=hot, dtype="float32",
            quantize=quantize,
        )
        ids = list(range(n))
        flat.add(ids, emb, mask)
        tiered.add(ids, emb, mask)
        q_ids = [5, 0, 3, -1, 29, 12]
        ef, mf = flat.gather(q_ids)
        et, mt = tiered.gather(q_ids)
        mf, mt = np.asarray(mf), np.asarray(mt)
        np.testing.assert_array_equal(mf, mt)
        # compare the MASKED content (what every consumer scores): a
        # flat gather leaves junk under zero-mask tokens of padding
        # rows, the tiered gather zeroes them. int8 quantizes per
        # token, so values agree to quant error; exact in float mode
        atol = 0.02 if quantize else 0
        np.testing.assert_allclose(
            np.asarray(ef) * mf[..., None],
            np.asarray(et) * mt[..., None],
            atol=atol,
        )

    def test_only_long_docs_occupy_tail(self):
        rng = np.random.default_rng(1)
        seq, hot, dim, n = 24, 16, 8, 30
        emb, mask, lengths = _mixed_rows(rng, n, seq, dim)
        c = TieredTokenCache(seq_len=seq, dim=dim, hot_len=hot, dtype="float32")
        c.add(list(range(n)), emb, mask)
        n_long = sum(1 for ln in lengths if ln > hot)
        assert c.tail_docs == n_long
        assert c.size == n
        assert c.max_len == max(lengths)

    def test_readd_reuses_slot(self):
        rng = np.random.default_rng(2)
        seq, hot, dim = 24, 16, 8
        emb, mask, _ = _mixed_rows(rng, 3, seq, dim, long_every=1)
        c = TieredTokenCache(seq_len=seq, dim=dim, hot_len=hot, dtype="float32")
        c.add([0, 1, 2], emb, mask)
        before = c.tail_docs
        c.add([1], emb[:1], mask[:1])  # overwrite doc 1
        assert c.tail_docs == before  # no slot leak
        e, m = c.gather([1])
        np.testing.assert_allclose(
            np.asarray(e)[0], emb[0] * mask[0][..., None], atol=1e-6
        )

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        seq, hot, dim, n = 24, 16, 8, 20
        emb, mask, _ = _mixed_rows(rng, n, seq, dim)
        c = TieredTokenCache(
            seq_len=seq, dim=dim, hot_len=hot, dtype="float32",
            quantize=True,
        )
        c.add(list(range(n)), emb, mask)
        path = tmp_path / "tiered.npz"
        c.save(path)
        c2 = TieredTokenCache(
            seq_len=seq, dim=dim, hot_len=hot, dtype="float32",
            quantize=True,
        )
        assert c2.load(path)
        assert c2.size == n and c2.tail_docs == c.tail_docs
        e1, m1 = c.gather([0, 3, 9])
        e2, m2 = c2.gather([0, 3, 9])
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        # a FLAT snapshot must not load into a tiered cache (refill)
        flat = DeviceTokenCache(seq_len=seq, dim=dim, dtype="float32")
        flat.add([0], emb[:1], mask[:1])
        flat.save(tmp_path / "flat.npz")
        assert not c2.load(tmp_path / "flat.npz")

    def test_clear(self):
        rng = np.random.default_rng(4)
        emb, mask, _ = _mixed_rows(rng, 6, 24, 8, long_every=1)
        c = TieredTokenCache(seq_len=24, dim=8, hot_len=16, dtype="float32")
        c.add(list(range(6)), emb, mask)
        c.clear()
        assert c.size == 0 and c.tail_docs == 0
        _, m = c.gather([0])
        assert int(np.asarray(m).sum()) == 0

    def test_no_long_docs_still_gathers_and_composes(self):
        """A short-doc corpus (exactly the workload the hot window
        optimizes for) allocates no tail — gather() and state() must
        still work, with an all-zero tail contribution (round-5
        review finding: tail._buf stayed None and crashed)."""
        rng = np.random.default_rng(8)
        seq, hot, dim, n = 24, 16, 8, 10
        emb = rng.standard_normal((n, seq, dim)).astype(np.float32)
        mask = np.zeros((n, seq), dtype=np.int32)
        mask[:, :8] = 1  # every doc fits the hot window
        emb *= mask[..., None]
        c = TieredTokenCache(seq_len=seq, dim=dim, hot_len=hot, dtype="float32")
        c.add(list(range(n)), emb, mask)
        assert c.tail_docs == 0
        e, m = c.gather([0, 5, -1])
        assert e.shape == (3, seq, dim) and m.shape == (3, seq)
        assert int(np.asarray(m)[:, hot:].sum()) == 0
        hot_state, tail_state, tmap = c.state()
        assert tail_state[0] is not None and tmap is not None

    def test_readd_shorter_drops_stale_tail(self):
        """A doc re-added with content that now FITS the hot window
        must not keep scoring its old tail tokens (round-5 review
        finding: the stale slot stayed mapped)."""
        rng = np.random.default_rng(9)
        seq, hot, dim = 24, 16, 8
        emb = rng.standard_normal((1, seq, dim)).astype(np.float32)
        long_mask = np.ones((1, seq), dtype=np.int32)
        c = TieredTokenCache(seq_len=seq, dim=dim, hot_len=hot, dtype="float32")
        flat = DeviceTokenCache(seq_len=seq, dim=dim, dtype="float32")
        c.add([0], emb, long_mask)
        flat.add([0], emb, long_mask)
        assert c.tail_docs == 1
        # re-add doc 0 with only 2 valid tokens
        short_mask = np.zeros((1, seq), dtype=np.int32)
        short_mask[0, :2] = 1
        emb2 = emb * short_mask[..., None]
        c.add([0], emb2, short_mask)
        flat.add([0], emb2, short_mask)
        et, mt = c.gather([0])
        ef, mf = flat.gather([0])
        np.testing.assert_array_equal(np.asarray(mt), np.asarray(mf))
        np.testing.assert_allclose(
            np.asarray(et) * np.asarray(mt)[..., None],
            np.asarray(ef) * np.asarray(mf)[..., None], atol=1e-6,
        )

    def test_reserve_tail_slots_presizes(self):
        c = TieredTokenCache(seq_len=24, dim=8, hot_len=16, dtype="float32")
        c.reserve(9999, tail_slots=3000)
        assert c.tail.capacity >= 3000
        assert c.hot.capacity >= 10000

    def test_bad_hot_len_refused(self):
        with pytest.raises(ValueError, match="hot_len"):
            TieredTokenCache(seq_len=16, dim=8, hot_len=16)
        with pytest.raises(ValueError, match="hot_len"):
            TieredTokenCache(seq_len=16, dim=8, hot_len=0)


class TestTieredPipeline:
    def _docs(self):
        # mixed lengths: some within the 16-token hot window, some past
        short = [f"short doc {i} fox" for i in range(8)]
        long = [
            "long document "
            + " ".join(f"token{j} river fox jumps" for j in range(12))
            + f" tail marker {i}"
            for i in range(8)
        ]
        return [d for pair in zip(short, long) for d in pair]

    def _cfg(self, tiny_config, hot):
        return dataclasses.replace(
            tiny_config,
            stage2_cache_doc_embeddings=True,
            enable_fused_search=True,
            stage2_cache_hot_window=hot,
        )

    def test_fused_matches_flat_cache(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        docs = self._docs()
        flat = RetrievalPipeline(self._cfg(tiny_config, 0))
        tiered = RetrievalPipeline(self._cfg(tiny_config, 16))
        flat.add_documents(docs)
        tiered.add_documents(docs)
        assert tiered.stage2._cache.tail_docs > 0  # long docs spilled
        for q in ("river fox", "tail marker 3", "short doc 5"):
            a = flat.search(q, top_k=5)
            b = tiered.search(q, top_k=5)
            assert a["timing"].get("fused") and b["timing"].get("fused")
            assert [r["doc_id"] for r in a["results"]] == [
                r["doc_id"] for r in b["results"]
            ], q
            np.testing.assert_allclose(
                [r["stage2_score"] for r in a["results"]],
                [r["stage2_score"] for r in b["results"]],
                atol=1e-5,
            )

    def test_staged_matches_flat_cache(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        docs = self._docs()
        kw = dict(enable_fused_search=False)
        flat = RetrievalPipeline(
            dataclasses.replace(self._cfg(tiny_config, 0), **kw)
        )
        tiered = RetrievalPipeline(
            dataclasses.replace(self._cfg(tiny_config, 16), **kw)
        )
        flat.add_documents(docs)
        tiered.add_documents(docs)
        a = flat.search("river fox", top_k=5)
        b = tiered.search("river fox", top_k=5)
        assert [r["doc_id"] for r in a["results"]] == [
            r["doc_id"] for r in b["results"]
        ]

    def test_persist_roundtrip_through_pipeline(self, tiny_config, tmp_path):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = dataclasses.replace(
            self._cfg(tiny_config, 16),
            persist_device_caches=True, index_dir=str(tmp_path),
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(self._docs())
        want = [r["doc_id"] for r in p.search("river fox", top_k=5)["results"]]
        p.save_index()
        p2 = RetrievalPipeline(cfg)
        assert p2.load_index()
        assert p2.stage2._cache.tail_docs == p.stage2._cache.tail_docs
        got = [r["doc_id"] for r in p2.search("river fox", top_k=5)["results"]]
        assert got == want

    def test_mesh_combination_refused(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = dataclasses.replace(
            self._cfg(tiny_config, 16), mesh_data_parallel=0
        )
        with pytest.raises(ValueError, match="single-device"):
            RetrievalPipeline(cfg).initialize_stages()

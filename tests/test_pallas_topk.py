"""Fused Pallas top-k kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tristage_rag_tpu.ops.pallas_topk import fused_matmul_topk
from tristage_rag_tpu.ops.topk import masked_topk


def _case(n, d, b, k, count, seed=0, block=1024, per_block_k=0):
    rng = np.random.default_rng(seed)
    docs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    v1, i1 = masked_topk(jnp.asarray(q), jnp.asarray(docs), jnp.int32(count), k=k)
    v2, i2 = fused_matmul_topk(
        jnp.asarray(q), jnp.asarray(docs), jnp.int32(count), k=k,
        block_size=block, per_block_k=per_block_k, interpret=True,
    )
    return map(np.asarray, (v1, i1, v2, i2))


class TestFusedTopk:
    def test_exact_match_basic(self):
        v1, i1, v2, i2 = _case(4096, 128, 5, 50, count=3000)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(v1, v2, rtol=1e-5)

    def test_single_query_row(self):
        v1, i1, v2, i2 = _case(2048, 128, 1, 10, count=2048)
        np.testing.assert_array_equal(i1, i2)

    def test_count_less_than_k(self):
        v1, i1, v2, i2 = _case(2048, 128, 3, 64, count=20)
        assert (i2[:, 20:] == -1).all()
        np.testing.assert_array_equal(i1[:, :20], i2[:, :20])

    def test_zero_count(self):
        _, _, v2, i2 = _case(1024, 128, 2, 8, count=0)
        assert (i2 == -1).all()

    def test_adversarial_sorted_corpus_with_safety_margin(self):
        """Docs sorted by score — worst case for per-block selection.
        With per_block_k >= k the kernel is exact regardless of order."""
        n, d, b, k = 2048, 64, 2, 16
        rng = np.random.default_rng(1)
        q = rng.standard_normal((b, d)).astype(np.float32)
        direction = rng.standard_normal(d).astype(np.float32)
        mags = np.linspace(1, 2, n).astype(np.float32)[::-1]
        docs = np.outer(mags, direction) + 0.01 * rng.standard_normal((n, d)).astype(np.float32)
        v1, i1 = masked_topk(jnp.asarray(q), jnp.asarray(docs), jnp.int32(n), k=k)
        v2, i2 = fused_matmul_topk(
            jnp.asarray(q), jnp.asarray(docs), jnp.int32(n), k=k,
            block_size=1024, per_block_k=16, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_bf16_corpus(self):
        rng = np.random.default_rng(2)
        docs = jnp.asarray(rng.standard_normal((2048, 128)), dtype=jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((4, 128)), dtype=jnp.bfloat16)
        v1, i1 = masked_topk(q, docs, jnp.int32(2048), k=32)
        v2, i2 = fused_matmul_topk(
            q, docs, jnp.int32(2048), k=32, interpret=True
        )
        agree = (np.asarray(i1) == np.asarray(i2)).mean()
        assert agree > 0.95  # bf16 score ties may order differently

    def test_indivisible_corpus_raises(self):
        with pytest.raises(ValueError, match="multiple"):
            fused_matmul_topk(
                jnp.zeros((2, 128)), jnp.zeros((1000, 128)), jnp.int32(10),
                k=5, interpret=True,
            )


class TestBankMode:
    """Bank-reduce mode: approx_max_k-grade recall, 1-pass selection."""

    def _recall(self, n, k, t, seed=0):
        rng = np.random.default_rng(seed)
        docs = rng.standard_normal((n, 128)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        q = rng.standard_normal((4, 128)).astype(np.float32)
        v1, i1 = masked_topk(jnp.asarray(q), jnp.asarray(docs), jnp.int32(n), k=k)
        v2, i2 = fused_matmul_topk(
            jnp.asarray(q), jnp.asarray(docs), jnp.int32(n), k=k,
            block_size=1024, per_block_k=t, mode="bank", interpret=True,
        )
        i1, i2 = np.asarray(i1), np.asarray(i2)
        return np.mean([len(set(i1[r]) & set(i2[r])) / k for r in range(4)]), i1, i2

    def test_low_occupancy_high_recall(self):
        # 16 blocks x 32 banks = 512 banks for top-16: occupancy 0.03
        recall, i1, i2 = self._recall(n=16384, k=16, t=32)
        assert recall >= 0.95, recall
        # the global top-1 is always its bank's max
        assert (i1[:, 0] == i2[:, 0]).all()

    def test_high_occupancy_degrades_gracefully(self):
        # 128 banks for top-100: occupancy ~0.8 -> recall drops but stays
        # well above half (documents the failure mode)
        recall, _, _ = self._recall(n=16384, k=100, t=8)
        assert 0.6 <= recall <= 1.0

    def test_count_mask_respected(self):
        rng = np.random.default_rng(1)
        docs = rng.standard_normal((2048, 128)).astype(np.float32)
        q = rng.standard_normal((2, 128)).astype(np.float32)
        _, idx = fused_matmul_topk(
            jnp.asarray(q), jnp.asarray(docs), jnp.int32(40), k=16,
            block_size=1024, per_block_k=8, mode="bank", interpret=True,
        )
        idx = np.asarray(idx)
        assert ((idx >= -1) & (idx < 40)).all()

    def test_bank_top2_recovers_two_winner_collisions(self):
        """bank_top=2 keeps each bank's top TWO: any bank holding
        exactly two global winners no longer loses one, so recall at
        high occupancy must strictly beat top-1 and every top-1 result
        stays included (top-2 candidates are a superset per bank)."""
        rng = np.random.default_rng(5)
        n, k, t = 16384, 100, 8
        docs = rng.standard_normal((n, 128)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        q = rng.standard_normal((4, 128)).astype(np.float32)
        v1, exact = masked_topk(
            jnp.asarray(q), jnp.asarray(docs), jnp.int32(n), k=k
        )
        args = (jnp.asarray(q), jnp.asarray(docs), jnp.int32(n))
        _, top1 = fused_matmul_topk(
            *args, k=k, block_size=1024, per_block_k=t, mode="bank",
            interpret=True,
        )
        _, top2 = fused_matmul_topk(
            *args, k=k, block_size=1024, per_block_k=t, mode="bank",
            bank_top=2, interpret=True,
        )
        exact, top1, top2 = map(np.asarray, (exact, top1, top2))

        def recall(ids):
            return np.mean(
                [len(set(exact[r]) & set(ids[r])) / k for r in range(4)]
            )

        r1, r2 = recall(top1), recall(top2)
        assert r2 > r1, (r1, r2)
        # 128 banks for k=100 is ~0.78 occupancy: >=3-winner banks are
        # common (E ~5.6), so ~0.93 here; production shapes (1M docs,
        # 8192 banks, k=500) put occupancy at 0.06 -> ~0.999
        assert r2 >= 0.9, r2
        # the global best is always its bank's max on both paths
        assert (top1[:, 0] == exact[:, 0]).all()
        assert (top2[:, 0] == exact[:, 0]).all()

    def test_bank_top_exceeding_width_refused(self):
        rng = np.random.default_rng(2)
        docs = rng.standard_normal((1024, 128)).astype(np.float32)
        q = rng.standard_normal((2, 128)).astype(np.float32)
        with pytest.raises(ValueError, match="bank_top"):
            fused_matmul_topk(
                jnp.asarray(q), jnp.asarray(docs), jnp.int32(1024), k=16,
                block_size=1024, per_block_k=512, mode="bank", bank_top=4,
                interpret=True,
            )


class TestExactnessGuard:
    def test_bank_mode_exempt_from_exactness_guard(self):
        """Bank mode is approximate by contract: a (k, nblocks) shape
        the exact guard refuses must still run in bank mode (round-2
        regression: the guard fired before mode was consulted, blocking
        the headline k=500/1M-doc bank benchmark entirely)."""
        rng = np.random.default_rng(3)
        docs = rng.standard_normal((2048, 64)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        q = docs[:4]
        k = 500
        with pytest.raises(ValueError, match="cannot guarantee"):
            fused_matmul_topk(
                jnp.asarray(q), jnp.asarray(docs), jnp.int32(2048), k=k,
                interpret=True,
            )
        v1, i1 = masked_topk(
            jnp.asarray(q), jnp.asarray(docs), jnp.int32(2048), k=k
        )
        v2, i2 = fused_matmul_topk(
            jnp.asarray(q), jnp.asarray(docs), jnp.int32(2048), k=k,
            mode="bank", interpret=True,
        )
        i1, i2 = np.asarray(i1), np.asarray(i2)
        # 2 blocks x 128 banks = 256 top-1 banks cannot cover k=500:
        # recall degrades but the top-1 is always its bank's max.
        assert (i1[:, 0] == i2[:, 0]).all()
        recall = np.mean(
            [len(set(i1[r]) & set(i2[r][i2[r] >= 0])) / k for r in range(4)]
        )
        assert recall >= 0.3, recall

    def test_bank_mode_indivisible_block_size_clear_error(self):
        """A block_size not divisible by 8 must refuse with a clear
        message, not raise max() on an empty sequence (ADVICE r2
        item 4)."""
        rng = np.random.default_rng(5)
        docs = rng.standard_normal((300, 64)).astype(np.float32)
        q = docs[:4]
        with pytest.raises(ValueError, match="divisible by 8"):
            fused_matmul_topk(
                jnp.asarray(q), jnp.asarray(docs), jnp.int32(300), k=10,
                mode="bank", block_size=100, per_block_k=12,
                interpret=True,
            )

    def test_auto_t_poisson_bound(self):
        """Auto per-block-k sizes by the Poisson tail: the headline
        config (k=500 over 1024 blocks) must pick T=16 (tail ~1e-17),
        not raise (round-2 regression: the 2*lam+24 heuristic rejected
        the shape round 1 had measured as exact)."""
        from tristage_rag_tpu.ops.pallas_topk import _poisson_tail

        lam = 500 / 1024
        assert 1024 * _poisson_tail(lam, 8) > 1e-9  # T=8 too risky
        assert 1024 * _poisson_tail(lam, 16) < 1e-9  # T=16 safe


    def test_refuses_unguaranteeable_k(self):
        """k large relative to block count must raise, not silently
        drop results (code-review r2 finding: per_block_k caps at 128)."""
        import jax.numpy as jnp
        import numpy as np
        import pytest

        from tristage_rag_tpu.ops.pallas_topk import fused_matmul_topk

        docs = jnp.asarray(
            np.random.default_rng(0).standard_normal((2048, 32)),
            dtype=jnp.float32,
        )
        q = docs[:4]
        with pytest.raises(ValueError, match="cannot guarantee"):
            fused_matmul_topk(q, docs, jnp.int32(2048), k=500, interpret=True)

    def test_int8_corpus_select_matches_dequant_reference(self):
        """scales= routes the dot through int8 x int8 with in-register
        dequant; select mode must equal the host int8 reference (same
        quant contract on both sides) exactly."""
        from tristage_rag_tpu.index.token_cache import symmetric_int8

        rng = np.random.default_rng(3)
        n, d, b, k, count = 4096, 128, 5, 50, 4000
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        d8, ds = symmetric_int8(jnp.asarray(docs))
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
        v, i = fused_matmul_topk(
            q, d8, jnp.int32(count), k=k, interpret=True, scales=ds,
        )
        q8, qs = symmetric_int8(q)
        s = (
            np.asarray(q8, np.float32) @ np.asarray(d8, np.float32).T
        ) * np.asarray(qs)[:, None] * np.asarray(ds)[None, :]
        s[:, count:] = -np.inf
        ref_i = np.argsort(-s, axis=1)[:, :k]
        ref_v = np.take_along_axis(s, ref_i, axis=1)
        np.testing.assert_allclose(np.asarray(v), ref_v, atol=1e-4)
        assert (np.asarray(i) == ref_i).mean() > 0.999

    def test_int8_corpus_bank_mode_recall(self):
        """Bank mode over int8: approx by contract; at this toy scale
        (4 blocks) the collision loss is its worst case — production
        scale (1024 blocks) measured 0.985 (BENCH_NOTES round 1)."""
        from tristage_rag_tpu.index.token_cache import symmetric_int8

        rng = np.random.default_rng(4)
        n, d, b, k = 4096, 128, 4, 50
        docs = rng.standard_normal((n, d)).astype(np.float32)
        d8, ds = symmetric_int8(jnp.asarray(docs))
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
        v, i = fused_matmul_topk(
            q, d8, jnp.int32(n), k=k, mode="bank", interpret=True,
            scales=ds,
        )
        q8, qs = symmetric_int8(q)
        s = (
            np.asarray(q8, np.float32) @ np.asarray(d8, np.float32).T
        ) * np.asarray(qs)[:, None] * np.asarray(ds)[None, :]
        ref_i = np.argsort(-s, axis=1)[:, :k]
        rec = np.mean([
            len(set(np.asarray(i)[r].tolist())
                & set(ref_i[r].tolist())) / k
            for r in range(b)
        ])
        assert rec > 0.85, rec

    def test_int8_scales_dtype_guard(self):
        docs = jnp.zeros((1024, 128), jnp.float32)
        q = jnp.zeros((2, 128), jnp.float32)
        with pytest.raises(ValueError, match="scales"):
            fused_matmul_topk(
                q, docs, jnp.int32(10), k=5, interpret=True,
                scales=jnp.ones((1024,), jnp.float32),
            )

    def test_dense_index_quantized_pallas_end_to_end(self):
        """DenseIndex int8 storage + forced pallas impl: the int8
        kernel serves search() (CPU: interpreted), rankings match the
        XLA exact path on the same quantized buffer up to query-quant
        noise on near-ties."""
        from tristage_rag_tpu.index.dense import DenseIndex

        rng = np.random.default_rng(5)
        emb = rng.standard_normal((900, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        pal = DenseIndex(dim=64, dtype="int8", search_impl="pallas")
        ref = DenseIndex(dim=64, dtype="int8", search_impl="exact")
        pal.add(emb)
        ref.add(emb)
        s_p, i_p = pal.search(emb[:4], k=8)
        s_r, i_r = ref.search(emb[:4], k=8)
        # same top-1 and >=7/8 overlap per query (query-side int8 adds
        # ~0.4% score noise the float-query exact path doesn't have)
        for r in range(4):
            assert i_p[r, 0] == i_r[r, 0]
            assert len(set(i_p[r].tolist()) & set(i_r[r].tolist())) >= 7
        # deletion filter still applies over the kernel path
        pal.delete([int(i_p[0, 0])])
        s_d, i_d = pal.search(emb[:1], k=8)
        assert int(i_p[0, 0]) not in set(i_d[0].tolist())

    def test_dense_index_pallas_bank_impl(self):
        """search_impl="pallas-bank" routes the transposed bank kernel
        at bank_top=2 (the ~0.99-selection-recall point, BENCH_NOTES
        round 5): high overlap with exact on the same buffer, and the
        fused-composite state downgrades to a non-kernel impl (the
        single-dispatch funnel has no bank variant)."""
        from tristage_rag_tpu.index.dense import DenseIndex

        rng = np.random.default_rng(6)
        emb = rng.standard_normal((1500, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        pal = DenseIndex(dim=64, search_impl="pallas-bank")
        ref = DenseIndex(dim=64, search_impl="exact")
        pal.add(emb)
        ref.add(emb)
        assert pal._impl() == "pallas-bank"
        s_p, i_p = pal.search(emb[:4], k=16)
        s_r, i_r = ref.search(emb[:4], k=16)
        for r in range(4):
            assert i_p[r, 0] == i_r[r, 0]
            assert len(set(i_p[r].tolist()) & set(i_r[r].tolist())) >= 14
        assert pal.search_state()[4] in ("exact", "approx")

    def test_pallas_bank_small_corpus_falls_back_exact(self):
        """k larger than the bank candidate table must NOT silently
        return half-recall results (round-5 review: recall 0.448 at
        capacity 1024 / k=500): the min_candidates guard refuses and
        DenseIndex falls back to the exact scan — results identical."""
        from tristage_rag_tpu.index.dense import DenseIndex

        rng = np.random.default_rng(7)
        emb = rng.standard_normal((900, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        pal = DenseIndex(dim=64, search_impl="pallas-bank")
        ref = DenseIndex(dim=64, search_impl="exact")
        pal.add(emb)
        ref.add(emb)
        s_p, i_p = pal.search(emb[:4], k=500)
        s_r, i_r = ref.search(emb[:4], k=500)
        np.testing.assert_array_equal(i_p, i_r)
        # and the raw kernel call with the guard refuses outright
        with pytest.raises(ValueError, match="min_candidates"):
            fused_matmul_topk(
                jnp.asarray(emb[:4]), pal._buf, jnp.int32(900), k=500,
                mode="bankT", bank_top=2, min_candidates=500,
                interpret=True,
            )

    def test_dense_index_falls_back_to_exact(self):
        """DenseIndex with search_impl=pallas on a small corpus + big k
        must return the exact results via the XLA path."""
        import numpy as np

        from tristage_rag_tpu.index.dense import DenseIndex

        rng = np.random.default_rng(0)
        emb = rng.standard_normal((600, 16)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        pal = DenseIndex(dim=16, search_impl="pallas")
        ref = DenseIndex(dim=16, search_impl="exact")
        pal.add(emb)
        ref.add(emb)
        s_p, i_p = pal.search(emb[:4], k=500)
        s_r, i_r = ref.search(emb[:4], k=500)
        np.testing.assert_array_equal(i_p, i_r)
        np.testing.assert_allclose(s_p, s_r, atol=1e-5)

import numpy as np
import pytest

import jax.numpy as jnp

from tristage_rag_tpu.ops.fusion import reciprocal_rank_fusion, weighted_fusion
from tristage_rag_tpu.ops.maxsim import maxsim_scores, similarity_matrix
from tristage_rag_tpu.ops.topk import masked_topk


class TestMaskedTopk:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        q = rng.standard_normal((4, 16)).astype(np.float32)
        docs = rng.standard_normal((100, 16)).astype(np.float32)
        count = 77
        scores, idx = masked_topk(jnp.asarray(q), jnp.asarray(docs), jnp.int32(count), k=10)
        ref = q @ docs[:count].T
        for b in range(4):
            expect = np.argsort(-ref[b])[:10]
            np.testing.assert_array_equal(np.asarray(idx[b]), expect)
            np.testing.assert_allclose(
                np.asarray(scores[b]), np.sort(ref[b])[::-1][:10], rtol=1e-5
            )

    def test_count_below_k_pads_minus_one(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((1, 8)).astype(np.float32)
        docs = rng.standard_normal((64, 8)).astype(np.float32)
        scores, idx = masked_topk(jnp.asarray(q), jnp.asarray(docs), jnp.int32(3), k=10)
        idx = np.asarray(idx[0])
        assert (idx[:3] >= 0).all()
        assert (idx[3:] == -1).all()

    def test_empty_count(self):
        q = np.zeros((1, 8), np.float32)
        docs = np.zeros((16, 8), np.float32)
        _, idx = masked_topk(jnp.asarray(q), jnp.asarray(docs), jnp.int32(0), k=4)
        assert (np.asarray(idx) == -1).all()


def _maxsim_ref(q, qm, d, dm):
    """Reference semantics: mean over valid q tokens of max cosine over
    valid d tokens (mirrors src/stage2_rescorer.py:167-183)."""
    out = []
    qn = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    for c in range(d.shape[0]):
        dv = d[c][dm[c].astype(bool)]
        if dv.size == 0:
            out.append(0.0)
            continue
        dn = dv / np.maximum(np.linalg.norm(dv, axis=-1, keepdims=True), 1e-12)
        sims = qn[qm.astype(bool)] @ dn.T
        out.append(float(sims.max(axis=1).mean()))
    return np.array(out)


class TestMaxSim:
    def test_matches_reference_loop(self):
        rng = np.random.default_rng(2)
        Lq, Ld, D, C = 5, 9, 8, 6
        q = rng.standard_normal((Lq, D)).astype(np.float32)
        qm = np.array([1, 1, 1, 0, 0], np.int32)
        d = rng.standard_normal((C, Ld, D)).astype(np.float32)
        dm = (rng.random((C, Ld)) > 0.3).astype(np.int32)
        dm[0] = 0  # one empty candidate
        got = np.asarray(maxsim_scores(q, qm, d, dm, method="maxsim"))
        want = _maxsim_ref(q, qm, d, dm)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert got[0] == 0.0

    def test_colbert_method_runs(self):
        rng = np.random.default_rng(3)
        q = rng.standard_normal((4, 8)).astype(np.float32)
        qm = np.ones(4, np.int32)
        d = rng.standard_normal((3, 6, 8)).astype(np.float32)
        dm = np.ones((3, 6), np.int32)
        got = np.asarray(maxsim_scores(q, qm, d, dm, method="colbert"))
        assert got.shape == (3,)
        assert np.isfinite(got).all()

    def test_similarity_matrix_zeroes_invalid(self):
        rng = np.random.default_rng(4)
        q = rng.standard_normal((3, 8)).astype(np.float32)
        d = rng.standard_normal((5, 8)).astype(np.float32)
        qm = np.array([1, 1, 0], np.int32)
        dm = np.array([1, 1, 1, 0, 0], np.int32)
        m = np.asarray(similarity_matrix(q, qm, d, dm))
        assert m.shape == (3, 5)
        assert (m[2] == 0).all() and (m[:, 3:] == 0).all()
        assert np.abs(m[:2, :3]).max() <= 1.0 + 1e-5


class TestFusion:
    def test_rrf_matches_manual(self):
        ids, scores = reciprocal_rank_fusion([[5, 3, 1], [3, 9]], rrf_k=60)
        manual = {
            5: 1 / 61,
            3: 1 / 62 + 1 / 61,
            1: 1 / 63,
            9: 1 / 62,
        }
        expect = sorted(manual.items(), key=lambda kv: -kv[1])
        assert ids.tolist() == [k for k, _ in expect]
        np.testing.assert_allclose(scores, [v for _, v in expect], rtol=1e-12)

    def test_weighted_fusion(self):
        # reference semantics: score / max per list
        # (src/stage1_retriever.py:350-360)
        ids, scores = weighted_fusion(
            np.array([0, 1]), np.array([2.0, 1.0]),
            np.array([1, 2]), np.array([5.0, 0.0]),
            dense_weight=0.7, sparse_weight=0.3,
        )
        d = dict(zip(ids.tolist(), scores.tolist()))
        assert d[0] == pytest.approx(0.7)           # 0.7 * 2/2
        assert d[1] == pytest.approx(0.35 + 0.3)    # 0.7 * 1/2 + 0.3 * 5/5
        assert d[2] == pytest.approx(0.0)           # 0.3 * 0/5
        assert ids[0] == 0                          # 0.7 > 0.65

    def test_weighted_fusion_zero_max_guard(self):
        # all-zero sparse list contributes 0 (the reference would divide
        # by zero here)
        ids, scores = weighted_fusion(
            np.array([0]), np.array([1.0]),
            np.array([1]), np.array([0.0]),
        )
        d = dict(zip(ids.tolist(), scores.tolist()))
        assert d[0] == pytest.approx(0.7) and d[1] == pytest.approx(0.0)

    def test_empty(self):
        ids, scores = reciprocal_rank_fusion([[], []])
        assert ids.size == 0 and scores.size == 0

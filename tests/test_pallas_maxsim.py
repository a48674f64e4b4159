"""Fused Pallas MaxSim vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tristage_rag_tpu.ops.maxsim import _normalize, maxsim_scores
from tristage_rag_tpu.ops.pallas_maxsim import fused_maxsim


def _case(c, lq, ld, d, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((lq, d)).astype(np.float32)
    qm = (rng.random(lq) > 0.2).astype(np.int32)
    qm[0] = 1
    dt = rng.standard_normal((c, ld, d)).astype(np.float32)
    dm = (rng.random((c, ld)) > 0.3).astype(np.int32)
    return q, qm, dt, dm


@pytest.mark.parametrize("method", ["maxsim", "colbert"])
@pytest.mark.parametrize("c,lq,ld", [(23, 5, 50), (16, 8, 128), (3, 32, 17)])
def test_matches_xla_reference(method, c, lq, ld):
    q, qm, dt, dm = _case(c, lq, ld, 128)
    ref = np.asarray(maxsim_scores(q, qm, dt, dm, method=method))
    qn = np.asarray(_normalize(jnp.asarray(q)))
    dn = np.asarray(_normalize(jnp.asarray(dt)))
    got = np.asarray(fused_maxsim(qn, qm, dn, dm, method=method, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_empty_candidate_scores_zero():
    q, qm, dt, dm = _case(8, 4, 20, 128, seed=1)
    dm[2] = 0
    qn = np.asarray(_normalize(jnp.asarray(q)))
    dn = np.asarray(_normalize(jnp.asarray(dt)))
    got = np.asarray(fused_maxsim(qn, qm, dn, dm, interpret=True))
    assert got[2] == 0.0


def test_block_boundary_padding():
    # C not a multiple of the candidate block: padded scores must not leak
    q, qm, dt, dm = _case(17, 6, 30, 128, seed=2)
    ref = np.asarray(maxsim_scores(q, qm, dt, dm))
    qn = np.asarray(_normalize(jnp.asarray(q)))
    dn = np.asarray(_normalize(jnp.asarray(dt)))
    got = np.asarray(
        fused_maxsim(qn, qm, dn, dm, block_candidates=16, interpret=True)
    )
    assert got.shape == (17,)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

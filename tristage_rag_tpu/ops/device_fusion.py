"""Device-side rank fusion — RRF / weighted over fixed-size id lists.

The host fusion (ops/fusion.py) is exact parity with the reference
(src/stage1_retriever.py:326-366) but forces a device->host round-trip
between the dense top-k and stage 2. These kernels compute the same
fusion ON DEVICE over static [k] id lists so the whole tri-stage funnel
can run as one XLA program (engine/fused.py).

Semantics match ops/fusion.py (tested against it):

* RRF: score(d) = sum over lists of 1/(rrf_k + rank), rank 1-based.
* Weighted: per-list MAX-normalisation (score / max, zero max -> 0,
  mirroring ops/fusion.py::_maxnorm), then weighted sum.

Tie order also matches: the host sorts a dict built dense-first with a
stable argsort; here the concatenated candidate array is dense-first and
``lax.top_k`` prefers lower indices on ties.

Ids < 0 are padding and never fused. Duplicate ids (present in both
lists) are folded into the dense entry; the bm25 copy is masked out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-jnp.inf)


def _match(dense_ids: jax.Array, sparse_ids: jax.Array) -> jax.Array:
    """[kd, kb] bool — dense_ids[i] == sparse_ids[j], both valid."""
    eq = dense_ids[:, None] == sparse_ids[None, :]
    return eq & (dense_ids >= 0)[:, None] & (sparse_ids >= 0)[None, :]


def _merge(dense_ids, sparse_ids, d_total, b_contrib, eq, k):
    """Shared union + top-k: fold sparse contributions that matched a
    dense entry into it, keep sparse-only entries, take fused top-k."""
    b_valid = sparse_ids >= 0
    b_in_dense = jnp.any(eq, axis=0)
    b_total = jnp.where(b_valid & ~b_in_dense, b_contrib, _NEG)
    d_masked = jnp.where(dense_ids >= 0, d_total, _NEG)
    all_ids = jnp.concatenate([dense_ids, sparse_ids])
    all_scores = jnp.concatenate([d_masked, b_total]).astype(jnp.float32)
    scores, idx = jax.lax.top_k(all_scores, k)
    ids = jnp.where(jnp.isfinite(scores), all_ids[idx], -1)
    return scores, ids


def rrf_fuse_device(
    dense_ids: jax.Array,
    sparse_ids: jax.Array,
    k: int,
    rrf_k: float = 60.0,
) -> tuple[jax.Array, jax.Array]:
    """Reciprocal rank fusion of two id lists on device.

    Args:
      dense_ids: [kd] i32 in rank order (best first), -1 = padding.
      sparse_ids: [kb] i32 in rank order, -1 = padding.
      k: static number of fused results.

    Returns:
      (scores [k] f32, ids [k] i32; -1 beyond the union size).
    """
    kd = dense_ids.shape[0]
    kb = sparse_ids.shape[0]
    d_contrib = 1.0 / (rrf_k + jnp.arange(1, kd + 1, dtype=jnp.float32))
    b_contrib = 1.0 / (rrf_k + jnp.arange(1, kb + 1, dtype=jnp.float32))
    eq = _match(dense_ids, sparse_ids)
    d_total = d_contrib + jnp.sum(
        jnp.where(eq, b_contrib[None, :], 0.0), axis=1
    )
    return _merge(dense_ids, sparse_ids, d_total, b_contrib, eq, k)


def _maxnorm_device(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """score / max over valid entries; zero max -> 0 (parity with
    ops/fusion.py::_maxnorm, including its all-negative inversion
    caveat — see that docstring)."""
    s = scores.astype(jnp.float32)
    mx = jnp.max(jnp.where(valid, s, -jnp.inf))
    return jnp.where(
        jnp.abs(mx) < 1e-12, 0.0, s / jnp.where(jnp.abs(mx) < 1e-12, 1.0, mx)
    )


def weighted_fuse_device(
    dense_ids: jax.Array,
    dense_scores: jax.Array,
    sparse_ids: jax.Array,
    sparse_scores: jax.Array,
    k: int,
    dense_weight: float = 0.7,
    sparse_weight: float = 0.3,
) -> tuple[jax.Array, jax.Array]:
    """Max-normalised weighted fusion on device (see rrf_fuse_device
    for the shape/padding contract)."""
    d_valid = dense_ids >= 0
    b_valid = sparse_ids >= 0
    dn = _maxnorm_device(dense_scores, d_valid) * dense_weight
    bn = _maxnorm_device(sparse_scores, b_valid) * sparse_weight
    eq = _match(dense_ids, sparse_ids)
    d_total = dn + jnp.sum(jnp.where(eq, bn[None, :], 0.0), axis=1)
    return _merge(dense_ids, sparse_ids, d_total, bn, eq, k)

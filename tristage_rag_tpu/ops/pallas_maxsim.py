"""Fused Pallas MaxSim — stage-2 late-interaction scoring kernel.

The XLA path (ops/maxsim.py) materializes the [C, Lq, Ld] similarity
tensor in HBM (C=500, Lq=32, Ld=192 -> 12 MB f32 per query; grows
linearly with candidate count and quadratically with lengths). This
kernel streams candidate token embeddings through VMEM in blocks of BC
candidates, computes each block's similarities on the MXU, reduces to
per-candidate scores in-register, and writes only the [C] scores —
similarity values never touch HBM.

Replaces the reference's per-candidate Python loop + small matmuls
(src/stage2_rescorer.py:167-183, :268-291) with one grid of large
contractions: per block, q [Lq, D] x docs [BC*Ld, D]^T is a single
MXU matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _maxsim_kernel(
    q_ref,  # VMEM [Lq, D] f32 (normalized, zero-padded)
    qmask_ref,  # VMEM [8, Lq] f32 (row 0 = mask; sublane-padded)
    d_ref,  # VMEM [BC, Ld, D] — candidate block (normalized, zero-padded)
    dmask_ref,  # VMEM [BC, Ld] f32
    out_ref,  # VMEM [1, 8, BC] f32 (row 0 = scores)
    *,
    method: str,
):
    bc, ld, dd = d_ref.shape
    lq = q_ref.shape[0]
    # One MXU contraction for the whole block: [Lq, BC*Ld].
    d_flat = d_ref[:].reshape(bc * ld, dd)
    sim = jax.lax.dot_general(
        q_ref[:],
        d_flat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Lq, BC*Ld]
    dmask = dmask_ref[:].reshape(1, bc * ld)
    neg = jnp.float32(-1e30)
    sim = jnp.where(dmask > 0, sim, neg)
    # max over doc tokens: [Lq, BC, Ld] -> [Lq, BC]. Mosaic dislikes
    # splitting the lane dim; reduce with a strided reshape via
    # 3-D view [Lq, BC, Ld] (leading split of the lane dim is the
    # supported direction when Ld is a multiple of 128).
    sim3 = sim.reshape(lq, bc, ld)
    per_q_max = jnp.max(sim3, axis=2)  # [Lq, BC]
    qmask = qmask_ref[0, :]  # [Lq] f32
    dmax = jnp.max(dmask_ref[:], axis=1)  # [BC] f32
    # Mosaic refuses dim-insertion reshapes on i1 vectors ("Insertion
    # of minor dim that is not a no-op only supported for 32-bit
    # types"), so bool[:, None] patterns crash real-TPU compiles
    # (interpret mode masks it). Build the [Lq, BC] pair mask in f32
    # and compare at full shape instead.
    pair_f = qmask[:, None] * dmax[None, :]  # [Lq, BC] f32
    per_q_max = jnp.where(pair_f > 0, per_q_max, 0.0)
    nq = jnp.maximum(jnp.sum(qmask), 1.0)
    if method == "colbert":
        logits = jnp.where(pair_f > 0, per_q_max, neg)
        mx = jnp.max(logits, axis=0, keepdims=True)
        qb = jnp.broadcast_to(qmask[:, None], logits.shape)  # f32
        ex = jnp.where(qb > 0, jnp.exp(logits - mx), 0.0)
        w = ex / jnp.maximum(jnp.sum(ex, axis=0, keepdims=True), 1e-9)
        scores = jnp.sum(w * per_q_max, axis=0)
    else:
        scores = jnp.sum(per_q_max, axis=0) / nq
    scores = jnp.where(dmax > 0, scores, 0.0)  # [BC]
    out_ref[0] = jnp.broadcast_to(scores[None, :], (8, bc))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("method", "block_candidates", "interpret", "normalize"),
)
def fused_maxsim(
    q_tokens: jax.Array,  # [Lq, D]
    q_mask: jax.Array,  # [Lq]
    d_tokens: jax.Array,  # [C, Ld, D]
    d_mask: jax.Array,  # [C, Ld]
    method: str = "maxsim",
    block_candidates: int = 16,
    interpret: bool = False,
    normalize: bool = False,
):
    """[C] MaxSim scores; numerics match ops.maxsim.maxsim_scores
    (same masking/method semantics). ``normalize=True`` L2-normalizes
    tokens inside this jit (XLA fuses it around the kernel call), so
    callers can hand over raw embeddings exactly as they do to the XLA
    path."""
    if method not in ("maxsim", "colbert"):
        # match ops.maxsim.maxsim_scores: unknown methods raise instead
        # of silently scoring as "maxsim"
        raise ValueError(f"unknown scoring method {method!r}")
    c, ld, d = d_tokens.shape
    lq = q_tokens.shape[0]
    if normalize:
        from tristage_rag_tpu.ops.maxsim import _normalize

        q_tokens = _normalize(q_tokens)
        d_tokens = _normalize(d_tokens)
    # Pad shapes to hardware tiles: Lq to sublane 8, Ld to lane 128
    # boundaries for the reshape-reduce, C to the block size.
    lq_p = _round_up(max(lq, 8), 8)
    ld_p = _round_up(ld, 128)
    bc = block_candidates
    c_p = _round_up(max(c, bc), bc)

    qt = jnp.zeros((lq_p, d), jnp.float32).at[:lq].set(
        q_tokens.astype(jnp.float32)
    )
    qm = jnp.zeros((8, lq_p), jnp.float32).at[0, :lq].set(
        q_mask.astype(jnp.float32)
    )
    dt = jnp.zeros((c_p, ld_p, d), jnp.float32).at[:c, :ld].set(
        d_tokens.astype(jnp.float32)
    )
    dm = jnp.zeros((c_p, ld_p), jnp.float32).at[:c, :ld].set(
        d_mask.astype(jnp.float32)
    )

    grid_spec = pl.GridSpec(
        grid=(c_p // bc,),
        in_specs=[
            pl.BlockSpec((lq_p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lq_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, ld_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, ld_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, bc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_maxsim_kernel, method=method),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c_p // bc, 8, bc), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * lq_p * c_p * ld_p * d,
            bytes_accessed=c_p * ld_p * d * 4 + lq_p * d * 4 + c_p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qt, qm, dt, dm)
    return out[:, 0, :].reshape(c_p)[:c]

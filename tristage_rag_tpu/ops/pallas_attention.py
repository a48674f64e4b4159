"""Whole-sequence fused attention for SMALL length buckets.

jax's Pallas flash-attention kernel only engages at lane-aligned
(128-multiple) sequence lengths — and forcing stage-3's 96-token pair
bucket up to 128 costs +33% tokens on EVERY op, which cannot pay for
the attention traffic it would save (BENCH_NOTES session-9a "flash is
a non-lever"). But at these small buckets the WHOLE score matrix fits
VMEM, so one grid step can run a full batch row's attention — QK^T,
padding mask, softmax, AV — in a single pass: the [B, h, L, L] exp
tensor (22 MB/layer at stage-3's [100, 12, 96, 96], the dominant
dense-path HBM tensor) never exists in HBM at all.

Layout lesson (session-10, measured): blocking the NATIVE 4-D
[B, L, h, hd] arrays is 5x slower than the dense path — XLA stores
them with the last two dims (12, 32) padded to (16, 128) tiles, so the
kernel DMA reads 5.3x the logical bytes (580 us/layer vs the dense
path's ~130). Both kernels here therefore take q/k/v as 2-D-lane
[B, L, h*hd] arrays — clean (8, 128) tiling, heads sliced as
CONTIGUOUS-LANE reads inside the kernel.

Scope: bidirectional padding-mask attention (the stage-3 BERT
cross-encoder and every global encoder layer; reference counterpart
`/root/reference/src/stage3_reranker.py` scoring forwards). Windowed /
causal / softcap layers keep the dense-bias path.

``fused_attention_block`` goes further for the post-LN (BERT/MiniLM)
family: since those layers have no RoPE / GQA / qk-norm, q/k/v stay
2-D end-to-end, and the kernel also absorbs the output projection,
residual add, and LayerNorm — the whole attention block downstream of
the QKV matmuls is ONE kernel, eliminating the out-tensor relayout
copies that made a SEPARATE out-proj+LN kernel a measured net loss
(session-10: +88 us/query of reshape/copy marshalling around a 21 us
kernel; that kernel was removed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_attention(q2, k2, v2, valid, *, scale, heads, acc_dtype):
    """Per-head attention over 2-D [L, h*hd] tiles; heads unroll as
    contiguous-lane slices (the head axis cannot be blocked: Mosaic
    requires the block's last two dims be (8, 128)-divisible or equal
    to the array's). Returns the lane-concatenated [L, h*hd] context
    in ``acc_dtype``. Semantics match the dense-bias einsum path
    (models/layers.py::Attention): f32 scores, -1e30 invalid keys,
    unnormalized exp cast to the compute dtype for the AV matmul, f32
    row-sum divide after."""
    hd = q2.shape[-1] // heads
    outs = []
    for j in range(heads):
        sl = slice(j * hd, (j + 1) * hd)
        q, k, v = q2[:, sl], k2[:, sl], v2[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)  # [L, L]
        s = jnp.where(valid[None, :], s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, hd]
        outs.append((o / denom).astype(acc_dtype))
    return jnp.concatenate(outs, axis=-1)  # [L, h*hd]


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, heads):
    valid = mask_ref[0, 0, :] > 0  # key validity [L]
    o_ref[0, :, :] = _head_attention(
        q_ref[0], k_ref[0], v_ref[0], valid,
        scale=scale, heads=heads, acc_dtype=o_ref.dtype,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "out_dtype", "interpret")
)
def fused_attention_small(
    q: jax.Array,      # [B, L, h, hd]
    k: jax.Array,      # [B, L, h, hd] (GQA pre-repeated)
    v: jax.Array,      # [B, L, h, hd]
    mask: jax.Array,   # [B, L] (1 = real token; key validity)
    *,
    scale: float,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Bidirectional padding-masked attention, one fused kernel.

    Semantics match the dense-bias einsum path in
    models/layers.py::Attention for every VALID query row; fully
    padded rows come out as the uniform average of v (identical to the
    dense path's all ``-1e30`` softmax convention) and are masked
    downstream by every pooling/scoring consumer. Returns
    ``[B, L, h, hd]``.
    """
    b, l, h, hd = q.shape
    if k.shape != q.shape or v.shape != q.shape:
        raise ValueError(
            f"q/k/v must share a shape (GQA pre-repeated): "
            f"{q.shape} {k.shape} {v.shape}"
        )
    if mask.shape != (b, l):
        raise ValueError(f"mask {mask.shape} != {(b, l)}")
    if l % 8:
        raise ValueError(f"sequence length must be sublane-aligned: {l}")
    if out_dtype is None:
        out_dtype = q.dtype
    d = h * hd

    # 2-D-lane views (see module docstring: native 4-D blocks DMA the
    # (16, 128) tile padding — 5.3x the logical bytes).
    spec = pl.BlockSpec(
        (1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # mask rides as [B, 1, L] so the block's last two dims (1, L)
    # satisfy the Mosaic checker (equal to the array's).
    spec_mask = pl.BlockSpec(
        (1, 1, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=float(scale), heads=h),
        out_shape=jax.ShapeDtypeStruct((b, l, d), out_dtype),
        grid=(b,),
        in_specs=[spec, spec, spec, spec_mask],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * hd,
            bytes_accessed=4 * b * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(
        q.reshape(b, l, d), k.reshape(b, l, d), v.reshape(b, l, d),
        mask.astype(jnp.int32).reshape(b, 1, l),
    )
    return out.reshape(b, l, h, hd)


def _attn_block_kernel(
    q_ref, k_ref, v_ref, mask_ref, x_ref, wo_ref, bo_ref,
    lns_ref, lnb_ref, o_ref, *, scale, heads, ln_eps,
):
    valid = mask_ref[0, 0, :] > 0
    att = _head_attention(
        q_ref[0], k_ref[0], v_ref[0], valid,
        scale=scale, heads=heads, acc_dtype=q_ref.dtype,
    )  # [L, D] compute dtype
    y = jax.lax.dot_general(
        att, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:].reshape(1, -1)  # [L, N] f32
    z = y + x_ref[0].astype(jnp.float32)
    # LayerNorm epilogue: stats in f32, fast-variance form, matching
    # flax LayerNorm (same as fused_mlp_bf16's post_ln path).
    n_inv = jnp.float32(1.0 / z.shape[-1])
    mu = jnp.sum(z, axis=-1, keepdims=True) * n_inv
    var = jnp.sum(z * z, axis=-1, keepdims=True) * n_inv - mu * mu
    z = (z - mu) * jax.lax.rsqrt(var + jnp.float32(ln_eps))
    z = z * lns_ref[:].reshape(1, -1) + lnb_ref[:].reshape(1, -1)
    o_ref[0, :, :] = z.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "ln_eps", "out_dtype", "interpret"),
)
def fused_attention_block(
    q: jax.Array,        # [B, L, D] (D = h*hd, heads along lanes)
    k: jax.Array,        # [B, L, D]
    v: jax.Array,        # [B, L, D]
    mask: jax.Array,     # [B, L] (1 = real token)
    x_res: jax.Array,    # [B, L, N] residual (the block's input)
    wo: jax.Array,       # [D, N] output projection
    bo,                  # [N] or None
    ln_scale: jax.Array,
    ln_bias,
    *,
    scale: float,
    heads: int,
    ln_eps: float = 1e-12,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """The post-LN attention block downstream of QKV as ONE kernel:

        out = LN(x_res + attention(q, k, v) @ wo + bo)

    For the BERT/MiniLM family (no RoPE / GQA / qk-norm) q/k/v stay
    2-D from the projection matmuls straight into this kernel — no
    4-D head reshapes, no out-tensor relayout, no separate residual+LN
    pass. Returns ``[B, L, N]``.
    """
    b, l, d = q.shape
    n = x_res.shape[-1]
    if k.shape != q.shape or v.shape != q.shape:
        raise ValueError(f"q/k/v shapes differ: {q.shape} {k.shape}")
    if d % heads:
        raise ValueError(f"D={d} not divisible by heads={heads}")
    if mask.shape != (b, l):
        raise ValueError(f"mask {mask.shape} != {(b, l)}")
    if x_res.shape != (b, l, n) or wo.shape != (d, n):
        raise ValueError(
            f"residual {x_res.shape} / wo {wo.shape} mismatch"
        )
    if l % 8:
        raise ValueError(f"sequence length must be sublane-aligned: {l}")
    if d % 128 or n % 128:
        raise ValueError(
            f"fused_attention_block needs D,N % 128 == 0; got {d},{n}"
        )
    if out_dtype is None:
        out_dtype = q.dtype

    def vec(vv, width):
        return (
            jnp.zeros((1, width), jnp.float32)
            if vv is None
            else vv.astype(jnp.float32).reshape(1, width)
        )

    spec_d = pl.BlockSpec(
        (1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_n = pl.BlockSpec(
        (1, l, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_block_kernel, scale=float(scale), heads=heads,
            ln_eps=float(ln_eps),
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, n), out_dtype),
        grid=(b,),
        in_specs=[
            spec_d, spec_d, spec_d,
            pl.BlockSpec(
                (1, 1, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            spec_n, rep((d, n)), rep((1, n)), rep((1, n)), rep((1, n)),
        ],
        out_specs=spec_n,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * d * (2 * l + n),
            bytes_accessed=(5 * b * l * d + d * n) * q.dtype.itemsize,
            transcendentals=b * heads * l * l,
        ),
        interpret=interpret,
    )(
        q, k, v, mask.astype(jnp.int32).reshape(b, 1, l), x_res,
        wo, vec(bo, n), vec(ln_scale, n), vec(ln_bias, n),
    )
    return out

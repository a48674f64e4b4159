"""Fused int8 dense projection: quantize -> int8 x int8 MXU dot ->
dequant (+bias, +activation) in ONE Pallas kernel.

Why this exists (BENCH_NOTES round-3, "int8-activation stage-3 at the
FUNNEL level"): the XLA lowering of the same computation —
``quant_rows/quant_static`` -> int8 ``dot_general`` -> f32 rescale —
materializes the int8 codes and the int32 accumulator between fusion
islands, and breaks the bf16 epilogue fusions (bias+gelu+residual)
around the matmul. At MiniLM shapes the fusion loss exceeded the MXU
gain: per-dot microbench 1.2-2.9x FASTER, in-funnel 10-25% SLOWER.

This kernel keeps the whole sequence in VMEM per (M-tile, N-tile):

    x_tile [bm, K] (bf16/f32, streamed from HBM)
      -> per-row abs-max scale (dynamic) | per-tensor scalar (static)
      -> int8 codes               (VMEM only, never HBM)
      -> MXU int8 x int8 dot      (int32 accumulate)
      -> f32 rescale * x_scale * w_scale[N]
      -> + bias, activation
      -> out_tile [bm, bn] (bf16, one HBM write)

HBM traffic is exactly one read of x, one read of the int8 weights,
one write of the output — the int8 codes, int32 accumulator and f32
pre-activation never leave the chip. Numeric contract is IDENTICAL to
the XLA path (models/layers.py::_int8_matmul): dynamic scales are
``max(|row|, 1e-12)/127`` (index/token_cache.py::symmetric_int8),
static scales are ``max(s, 1e-8)``, codes clip to [-127, 127].

Reference context: the reference has no quantization at all (its
stage-3 is torch fp16/fp32 — /root/reference/src/stage3_reranker.py);
this is a TPU-native perf lever, opt-in via ``stage{1,2,3}_act_int8:
"pallas" | "static-pallas"`` (engine/factory.py::act_int8_overrides).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# erf(x) = tanh(x * q(x^2)): coefficients of q (increasing powers of
# t = x^2), a Chebyshev-node least-squares fit of atanh(erf(x))/x on
# [0, 4] weighted by sech^2 = 1 - erf^2 so the minimized quantity IS
# the erf error. Clamped to |x| <= 4, where 1 - erf = 1.5e-8.
_ERF_TANH_COEF = (
    1.1283796305909783, 0.10276577708839114, -0.00018451031254182159,
    -0.0006259580467677385, 8.990702145830245e-05,
    -6.031833378611733e-06, 1.6232202085609084e-07,
)


def _erf_tpu(x):
    """erf via the tanh form ``erf(x) = tanh(x * q(x^2))`` with a
    degree-6 polynomial q (coefficients above). Mosaic's TPU lowering
    implements no erf/erfc primitive (only erf_inv), so
    ``jax.nn.gelu(..., approximate=False)`` — which lowers through
    erfc — cannot compile inside a kernel.

    Accuracy: |err| <= 2.5e-7 (~2 f32 ulp at erf's |y|<=1 range;
    measured vs math.erf on [-12, 12] incl. the clamp tail), the same
    f32-exactness class as the Abramowitz-Stegun 7.1.26 rational form
    this replaces (1.5e-7). Why tanh: the session-9 traced kernel sweep showed
    exact-GELU epilogues built on exp (A&S rational, erfcx-polynomial)
    cost +52% kernel time at stage-3 MLP shapes (184.7 us vs the
    121.0 us relu floor, i.e. the VPU tax is NOT hidden behind the
    MXU), while tanh-based epilogues are free (gelu_tanh measured
    121.1 us) — Mosaic lowers tanh to the fast transcendental path.
    This form keeps exact-GELU numerics at tanh-GELU speed."""
    xc = jnp.clip(x, -4.0, 4.0)
    t = xc * xc
    q = jnp.float32(_ERF_TANH_COEF[-1])
    for c in _ERF_TANH_COEF[-2::-1]:
        q = q * t + jnp.float32(c)
    return jnp.tanh(xc * q)


def _gelu_exact_tpu(y):
    yf = y.astype(jnp.float32)
    return (0.5 * yf * (1.0 + _erf_tpu(yf * 0.7071067811865476))).astype(
        y.dtype
    )


# Activation epilogues the kernel can fuse. Keys match
# EncoderConfig.activation vocabulary where applicable.
_ACTS = {
    None: lambda y: y,
    "relu": lambda y: jnp.maximum(y, 0.0),
    "gelu": _gelu_exact_tpu,
    "gelu_tanh": lambda y: jax.nn.gelu(y, approximate=True),
    "silu": jax.nn.silu,
}


def _pick_block_n(k: int, n: int, vmem_cap: int = 4 << 20) -> int:
    """Largest N-tile whose int8 weight block fits the VMEM budget.
    Returns 0 when no lane-aligned tile fits (caller raises ValueError
    so _int8_dense's XLA fallback actually triggers — a VMEM-oversized
    block would fail at Mosaic compile with an uncatchable error)."""
    if k * n <= vmem_cap:
        return n
    for cand in (2048, 1024, 512, 256, 128):
        if n % cand == 0 and k * cand <= vmem_cap:
            return cand
    return 0


def _quant_tile(x, s_ref, static):
    """In-VMEM quantization of one activation tile; returns
    (codes int8, scale) with the same numeric contract as the
    quant_rows/quant_static pair in models/layers.py — the ONE
    definition used by every kernel in this file."""
    if static:
        # Per-tensor calibrated scale (models/layers.py::quant_static):
        # a scalar divide the VPU fuses into the quantize itself.
        s = jnp.maximum(s_ref[0, 0], 1e-8)
    else:
        # Per-row abs-max (token_cache.py::symmetric_int8 contract).
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-12) / 127.0
    return jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8), s


def _kernel(x_ref, wq_ref, ws_ref, b_ref, s_ref, o_ref, *, act, static):
    x = x_ref[:].astype(jnp.float32)
    codes, s = _quant_tile(x, s_ref, static)
    acc = jax.lax.dot_general(
        codes, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s * ws_ref[:].reshape(1, -1)
    y = y + b_ref[:].reshape(1, -1)
    o_ref[:] = _ACTS[act](y).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "block_m", "interpret"),
)
def fused_qdense(
    x2d: jax.Array,
    wq: jax.Array,
    wscale: jax.Array,
    bias: Optional[jax.Array] = None,
    x_scale: Optional[jax.Array] = None,
    *,
    act: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """``act(dequant(quant(x2d) @ wq) + bias)`` as one fused kernel.

    x2d     [M, K] float — activations (bf16/f32).
    wq      [K, N] int8 — per-output-channel quantized weights.
    wscale  [N] f32 — weight dequant scales.
    bias    [N] or None.
    x_scale None -> dynamic per-row quant in-kernel; scalar array ->
            static per-tensor scale (calibrated; see quant_static).
    act     one of {None, "relu", "gelu", "gelu_tanh", "silu"}.

    Requires K % 128 == 0 and N % 128 == 0 (MXU lane alignment; all
    shipped encoder shapes qualify — see layers.py call sites). M is
    padded to the block size internally. Raises ValueError otherwise
    so callers can fall back to the XLA path.
    """
    m, k = x2d.shape
    kw, n = wq.shape
    if kw != k:
        raise ValueError(f"x K={k} vs wq K={kw}")
    if k % 128 or n % 128:
        raise ValueError(f"fused_qdense needs K,N % 128 == 0; got {k},{n}")
    if act not in _ACTS:
        raise ValueError(f"unknown act {act!r}")

    bm = _pick_bm(m, block_m)
    mp = -(-m // bm) * bm
    if mp != m:
        x2d = jnp.pad(x2d, ((0, mp - m), (0, 0)))
    bn = _pick_block_n(k, n)
    if not bn:
        raise ValueError(
            f"fused_qdense: no lane-aligned N tile of [K={k}, N={n}] "
            f"fits the VMEM budget"
        )

    static = x_scale is not None
    s_arr = (
        jnp.asarray(x_scale, jnp.float32).reshape(1, 1)
        if static
        else jnp.zeros((1, 1), jnp.float32)
    )
    b_arr = (
        jnp.zeros((1, n), jnp.float32)
        if bias is None
        else bias.astype(jnp.float32).reshape(1, n)
    )

    out = pl.pallas_call(
        functools.partial(_kernel, act=act, static=static),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        grid=(mp // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * x2d.dtype.itemsize + k * n
            + mp * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=mp * n if act in ("gelu", "gelu_tanh", "silu")
            else 0,
        ),
        interpret=interpret,
    )(x2d, wq, wscale.astype(jnp.float32).reshape(1, n), b_arr, s_arr)
    return out[:m] if mp != m else out


# ---------------------------------------------------------------------------
# Fused int8 MLP block: (gate, up) -> act(gate)*up -> down in ONE kernel.
# ---------------------------------------------------------------------------


def _mlp_kernel(x_ref, wg_ref, *refs, act, glu, static):
    """``glu`` is a static trace parameter: the up-projection operands
    (wu/us/bu) are only present in the spec list when glu is on, so the
    non-glu trace never streams dead blocks through VMEM."""
    if glu:
        (wu_ref, wd_ref, gs_ref, us_ref, ds_ref, bg_ref, bu_ref, bd_ref,
         sx_ref, sh_ref, o_ref) = refs
    else:
        (wd_ref, gs_ref, ds_ref, bg_ref, bd_ref, sx_ref, sh_ref,
         o_ref) = refs
    dn = (((1,), (0,)), ((), ()))
    x = x_ref[:].astype(jnp.float32)
    xq, xs = _quant_tile(x, sx_ref, static)
    g = jax.lax.dot_general(
        xq, wg_ref[:], dn, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * xs * gs_ref[:].reshape(1, -1)
    g = g + bg_ref[:].reshape(1, -1)
    if glu:
        u = jax.lax.dot_general(
            xq, wu_ref[:], dn, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * xs * us_ref[:].reshape(1, -1)
        h = _ACTS[act](g) * (u + bu_ref[:].reshape(1, -1))
    else:
        h = _ACTS[act](g)
    hq, hs = _quant_tile(h, sh_ref, static)
    y = jax.lax.dot_general(
        hq, wd_ref[:], dn, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * hs * ds_ref[:].reshape(1, -1)
    o_ref[:] = (y + bd_ref[:].reshape(1, -1)).astype(o_ref.dtype)


def _mlp_block_m(
    k: int, f: int, n: int, wbytes: int = 1, budget: int = 10 << 20
) -> int:
    """Largest M-tile whose activations (x + gate/up/h f32 + out) fit
    the VMEM budget next to the resident weights (int8 or bf16)."""
    weights = (k * f * 2 + f * n) * wbytes
    for bm in (512, 256, 128, 64, 32):
        acts = 4 * bm * (k + 3 * f + n) + 2 * bm * n
        if weights + acts <= budget:
            return bm
    return 32


def _pick_bm(m: int, cap: int) -> int:
    """M-tile under ``cap``, preferring EXACT divisors of ``m`` so the
    grid needs no padded tail: the funnel's 9600-row stage-3 blocks
    otherwise pad to 9728 — a materialized jnp.pad (plus a select for
    kernels that read a residual) per input, measured ~30 us each
    (session-10 trace). Falls back to the plain capped tile (callers
    pad) when no 32-multiple divisor >= 32 exists."""
    cap = max(32, cap)
    if m <= cap:
        return max(32, -(-m // 32) * 32)
    for bm in range(cap - cap % 32, 31, -32):
        if m % bm == 0:
            return bm
    return cap - cap % 32


@functools.partial(
    jax.jit,
    static_argnames=("act", "glu", "out_dtype", "interpret"),
)
def fused_qmlp(
    x2d: jax.Array,
    wg: jax.Array,
    wu: Optional[jax.Array],
    wd: jax.Array,
    gscale: jax.Array,
    uscale: Optional[jax.Array],
    dscale: jax.Array,
    bg: Optional[jax.Array] = None,
    bu: Optional[jax.Array] = None,
    bd: Optional[jax.Array] = None,
    x_scale: Optional[jax.Array] = None,
    h_scale: Optional[jax.Array] = None,
    *,
    act: str = "gelu",
    glu: bool = True,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """The whole MLP block as ONE kernel, int8 x int8 on the MXU:

        h = act(x @ wg + bg) [* (x @ wu + bu)]      (glu)
        y = h @ wd + bd

    The ``[M, mlp_dim]`` intermediate ``h`` lives only in VMEM — the
    XLA lowering (and the bf16 baseline) always materializes it to HBM
    between the two matmuls, plus reads ``x`` twice for gate/up. Per
    M-tile this kernel reads x once, writes y once; that HBM saving is
    structural and independent of the int8-vs-bf16 dot question.

    wg [K, F], wu [K, F] or None, wd [F, N] — int8 per-output-channel
    with f32 scales gscale/uscale [F], dscale [N]. x_scale / h_scale:
    None -> dynamic per-row quant in VMEM; scalars -> static calibrated
    (the ``mlp_in_scale`` / ``mlp_mid_scale`` params). K, F, N must be
    lane-aligned (% 128); raises ValueError otherwise so callers fall
    back to the per-projection path.
    """
    m, k = x2d.shape
    kk, f = wg.shape
    ff, n = wd.shape
    if kk != k or ff != f:
        raise ValueError(f"shape mismatch: x K={k} wg {wg.shape} wd {wd.shape}")
    if k % 128 or f % 128 or n % 128:
        raise ValueError(f"fused_qmlp needs K,F,N % 128 == 0; got {k},{f},{n}")
    if glu != (wu is not None):
        raise ValueError("glu requires wu (and vice versa)")
    if act not in _ACTS or act is None:
        raise ValueError(f"unknown act {act!r}")

    bm = _pick_bm(m, _mlp_block_m(k, f, n, wbytes=1))
    mp = -(-m // bm) * bm
    if mp != m:
        x2d = jnp.pad(x2d, ((0, mp - m), (0, 0)))

    static = x_scale is not None
    if static != (h_scale is not None):
        raise ValueError("x_scale and h_scale must both be set or both None")

    def scalar(v):
        return (
            jnp.asarray(v, jnp.float32).reshape(1, 1)
            if v is not None
            else jnp.zeros((1, 1), jnp.float32)
        )

    def vec(v, width):
        return (
            jnp.zeros((1, width), jnp.float32)
            if v is None
            else v.astype(jnp.float32).reshape(1, width)
        )

    row = lambda i: (i, 0)
    rep = lambda i: (0, 0)

    def spec(shape, index_map=rep, space=pltpu.VMEM):
        return pl.BlockSpec(shape, index_map, memory_space=space)

    # glu is a static argname: the up-projection operands exist only in
    # the glu trace (no dead VMEM streaming for MiniLM-style MLPs).
    inputs = [x2d, wg]
    in_specs = [spec((bm, k), row), spec((k, f))]
    if glu:
        inputs.append(wu)
        in_specs.append(spec((k, f)))
    inputs += [wd, vec(gscale, f)]
    in_specs += [spec((f, n)), spec((1, f))]
    if glu:
        inputs.append(vec(uscale, f))
        in_specs.append(spec((1, f)))
    inputs += [vec(dscale, n), vec(bg, f)]
    in_specs += [spec((1, n)), spec((1, f))]
    if glu:
        inputs.append(vec(bu, f))
        in_specs.append(spec((1, f)))
    inputs += [vec(bd, n), scalar(x_scale), scalar(h_scale)]
    in_specs += [
        spec((1, n)),
        spec((1, 1), space=pltpu.SMEM),
        spec((1, 1), space=pltpu.SMEM),
    ]

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, act=act, glu=glu, static=static),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        grid=(mp // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), row, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * f * (2 if glu else 1) + 2 * mp * f * n,
            bytes_accessed=mp * k * x2d.dtype.itemsize
            + k * f * (2 if glu else 1) + f * n
            + mp * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=mp * f,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:m] if mp != m else out


# ---------------------------------------------------------------------------
# bf16 fused MLP: same whole-block fusion, no quantization — the
# [M, mlp_dim] intermediate saving is independent of the int8 question
# and applies to the DEFAULT serving dtype.
# ---------------------------------------------------------------------------


def _mlp_bf16_kernel(x_ref, wg_ref, *refs, act, glu, w8, post_ln,
                     pre_kind, post_rms, residual, ln_eps):
    refs = list(refs)
    o_ref = refs.pop()
    prs_ref = refs.pop() if post_rms else None
    if pre_kind:
        pb_ref = refs.pop()
        ps_ref = refs.pop()
    else:
        ps_ref = pb_ref = None
    if post_ln:
        lnb_ref = refs.pop()
        lns_ref = refs.pop()
    else:
        lns_ref = lnb_ref = None
    if glu and w8:
        wu_ref, wd_ref, bg_ref, bu_ref, bd_ref, sg_ref, su_ref, sd_ref = refs
    elif glu:
        wu_ref, wd_ref, bg_ref, bu_ref, bd_ref = refs
        sg_ref = su_ref = sd_ref = None
    elif w8:
        wd_ref, bg_ref, bd_ref, sg_ref, sd_ref = refs
        su_ref = None
    else:
        wd_ref, bg_ref, bd_ref = refs
        sg_ref = su_ref = sd_ref = None
    dn = (((1,), (0,)), ((), ()))
    x_raw = x_ref[:]
    eps = jnp.float32(ln_eps)
    if pre_kind:
        # Pre-norm prologue: the normed MLP input never touches HBM
        # (the module path materializes LN(x)/RMS(x) between the norm
        # and the first dot). Stats in f32.
        xf = x_raw.astype(jnp.float32)
        n_inv = jnp.float32(1.0 / xf.shape[-1])
        if pre_kind == "rms":
            var = jnp.sum(xf * xf, axis=-1, keepdims=True) * n_inv
            xn = xf * jax.lax.rsqrt(var + eps)
            # Gemma unit-offset convention (models/layers.py::RMSNorm)
            xn = xn * (1.0 + ps_ref[:].reshape(1, -1))
        else:
            mu = jnp.sum(xf, axis=-1, keepdims=True) * n_inv
            var = jnp.sum(xf * xf, axis=-1, keepdims=True) * n_inv - mu * mu
            xn = (xf - mu) * jax.lax.rsqrt(var + eps)
            xn = xn * ps_ref[:].reshape(1, -1) + pb_ref[:].reshape(1, -1)
        x = xn.astype(x_raw.dtype)
    else:
        x = x_raw

    def dot(a, w_ref, s_ref):
        """a @ w, f32 accumulate. int8 weight tiles convert to the
        activation dtype IN VMEM (codes -127..127 are exact in bf16)
        and the per-output-channel scale folds into the f32
        accumulator AFTER the dot — per-channel scaling commutes with
        the contraction, so this matches dequant-then-dot while the
        weight's HBM read stays int8."""
        w = w_ref[:]
        if w8:
            w = w.astype(a.dtype)
        y = jax.lax.dot_general(a, w, dn, preferred_element_type=jnp.float32)
        if w8:
            y = y * s_ref[:].reshape(1, -1)
        return y

    g = dot(x, wg_ref, sg_ref) + bg_ref[:].reshape(1, -1)
    if glu:
        u = dot(x, wu_ref, su_ref) + bu_ref[:].reshape(1, -1)
        h = _ACTS[act](g) * u
    else:
        h = _ACTS[act](g)
    y = dot(h.astype(x.dtype), wd_ref, sd_ref) + bd_ref[:].reshape(1, -1)
    if post_rms:
        # Gemma post_mlp_norm: RMS on the MLP output before the
        # residual add (unit-offset convention)
        n_inv = jnp.float32(1.0 / y.shape[-1])
        var = jnp.sum(y * y, axis=-1, keepdims=True) * n_inv
        y = y * jax.lax.rsqrt(var + eps)
        y = y * (1.0 + prs_ref[:].reshape(1, -1))
    if residual:
        # Pre-norm residual epilogue: out = x + [post_rms](mlp(pre(x)))
        y = y + x_raw.astype(jnp.float32)
    if post_ln:
        # Post-LN residual epilogue: out = LN(x + mlp(x)). The MLP's
        # input block IS the residual (K == N always holds for the
        # MLP), so no extra HBM stream — this saves materializing the
        # raw MLP output AND the separate residual+LN pass (the XLA
        # module path's 313-us convert_reduce fusions, BENCH_NOTES).
        # Stats in f32, fast-variance form, matching flax LayerNorm.
        z = y + x_raw.astype(jnp.float32)
        n_inv = jnp.float32(1.0 / z.shape[-1])
        mu = jnp.sum(z, axis=-1, keepdims=True) * n_inv
        var = jnp.sum(z * z, axis=-1, keepdims=True) * n_inv - mu * mu
        y = (z - mu) * jax.lax.rsqrt(var + eps)
        y = y * lns_ref[:].reshape(1, -1) + lnb_ref[:].reshape(1, -1)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "glu", "out_dtype", "interpret", "ln_eps",
                     "pre_kind", "residual"),
)
def fused_mlp_bf16(
    x2d: jax.Array,
    wg: jax.Array,
    wu: Optional[jax.Array],
    wd: jax.Array,
    bg: Optional[jax.Array] = None,
    bu: Optional[jax.Array] = None,
    bd: Optional[jax.Array] = None,
    *,
    sg: Optional[jax.Array] = None,
    su: Optional[jax.Array] = None,
    sd: Optional[jax.Array] = None,
    ln_scale: Optional[jax.Array] = None,
    ln_bias: Optional[jax.Array] = None,
    ln_eps: float = 1e-12,
    pre_kind: Optional[str] = None,
    pre_scale: Optional[jax.Array] = None,
    pre_bias: Optional[jax.Array] = None,
    post_rms_scale: Optional[jax.Array] = None,
    residual: bool = False,
    act: str = "gelu",
    glu: bool = True,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """The MLP block as one kernel at the native compute dtype:

        h = act(x @ wg + bg) [* (x @ wu + bu)];  y = h @ wd + bd

    vs the XLA lowering this saves the HBM round-trip of the
    ``[M, mlp_dim]`` intermediate and the second read of x for the
    gate/up pair. Numerics: dots accumulate f32 and the glu epilogue
    runs in f32 before casting back (slightly MORE precise than the
    module path, which materializes bf16 between ops) — gate behind a
    config knob, tolerance-tested. Same alignment contract as
    fused_qmlp.

    Weight-only int8 (``stage*_weights_int8``): pass int8 ``wg/wu/wd``
    with their per-output-channel f32 scales ``sg/su/sd`` — the weight
    HBM read halves, tiles dequantize in VMEM, and the scale folds
    into the f32 accumulator after each dot (mathematically identical
    to dequant-then-dot). The XLA dequant lowering instead
    materializes the dense kernels per dispatch, which measured SLOWER
    than plain bf16 (BENCH_NOTES session 9)."""
    m, k = x2d.shape
    kk, f = wg.shape
    ff, n = wd.shape
    if kk != k or ff != f:
        raise ValueError(f"shape mismatch: x K={k} wg {wg.shape} wd {wd.shape}")
    if k % 128 or f % 128 or n % 128:
        raise ValueError(f"fused_mlp_bf16 needs K,F,N % 128 == 0; got {k},{f},{n}")
    if glu != (wu is not None):
        raise ValueError("glu requires wu (and vice versa)")
    if act not in _ACTS or act is None:
        raise ValueError(f"unknown act {act!r}")
    w8 = sg is not None
    if w8 != (sd is not None) or (glu and w8 != (su is not None)):
        raise ValueError("int8 weights need scales for every projection")
    if w8 and any(
        w.dtype != jnp.int8 for w in ((wg, wd) + ((wu,) if glu else ()))
    ):
        raise ValueError("scales given but weights are not int8")
    post_ln = ln_scale is not None
    if (post_ln or residual) and k != n:
        raise ValueError(
            "residual epilogues reuse x as the residual; need K == N"
        )
    if pre_kind not in (None, "ln", "rms"):
        raise ValueError(f"unknown pre_kind {pre_kind!r}")
    if (pre_kind is not None) != (pre_scale is not None):
        raise ValueError("pre_kind and pre_scale go together")
    if post_ln and (pre_kind or residual or post_rms_scale is not None):
        raise ValueError(
            "post-LN (LN(x+mlp(x))) and pre-norm epilogues are "
            "mutually exclusive"
        )

    wbytes = wg.dtype.itemsize
    bm = _pick_bm(m, _mlp_block_m(k, f, n, wbytes=wbytes))
    mp = -(-m // bm) * bm
    if mp != m:
        x2d = jnp.pad(x2d, ((0, mp - m), (0, 0)))

    def vec(v, width):
        return (
            jnp.zeros((1, width), jnp.float32)
            if v is None
            else v.astype(jnp.float32).reshape(1, width)
        )

    row = lambda i: (i, 0)
    rep = lambda i: (0, 0)

    def spec(shape, index_map=rep):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    inputs = [x2d, wg]
    in_specs = [spec((bm, k), row), spec((k, f))]
    if glu:
        inputs.append(wu)
        in_specs.append(spec((k, f)))
    inputs += [wd, vec(bg, f)]
    in_specs += [spec((f, n)), spec((1, f))]
    if glu:
        inputs.append(vec(bu, f))
        in_specs.append(spec((1, f)))
    inputs.append(vec(bd, n))
    in_specs.append(spec((1, n)))
    if w8:
        inputs.append(vec(sg, f))
        in_specs.append(spec((1, f)))
        if glu:
            inputs.append(vec(su, f))
            in_specs.append(spec((1, f)))
        inputs.append(vec(sd, n))
        in_specs.append(spec((1, n)))
    if post_ln:
        inputs.append(vec(ln_scale, n))
        in_specs.append(spec((1, n)))
        inputs.append(vec(ln_bias, n))
        in_specs.append(spec((1, n)))
    if pre_kind:
        inputs.append(vec(pre_scale, k))
        in_specs.append(spec((1, k)))
        inputs.append(vec(pre_bias, k))
        in_specs.append(spec((1, k)))
    if post_rms_scale is not None:
        inputs.append(vec(post_rms_scale, n))
        in_specs.append(spec((1, n)))

    out = pl.pallas_call(
        functools.partial(
            _mlp_bf16_kernel, act=act, glu=glu, w8=w8,
            post_ln=post_ln, pre_kind=pre_kind,
            post_rms=post_rms_scale is not None, residual=residual,
            ln_eps=float(ln_eps),
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        grid=(mp // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), row, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * f * (2 if glu else 1) + 2 * mp * f * n,
            bytes_accessed=mp * k * x2d.dtype.itemsize
            + (k * f * (2 if glu else 1) + f * n) * wbytes
            + mp * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=mp * f,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:m] if mp != m else out

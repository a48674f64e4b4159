"""Flax building blocks for the encoder family.

Everything here is shape-static and jit-friendly: attention masks are
built with broadcasted iota (no data-dependent control flow), sliding
windows are mask-based (sequences are <=512 tokens — SURVEY.md §5.7 —
so banded attention would not pay for itself on the MXU).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from tristage_rag_tpu.models.config import EncoderConfig


def compute_dtype(cfg: EncoderConfig):
    return jnp.dtype(cfg.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    # Gemma stores (1 + weight); we keep HF semantics at load time by
    # storing the raw checkpoint weight and adding 1 here.
    add_unit_offset: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.zeros, (x.shape[-1],))
        if self.add_unit_offset:
            x = x * (1.0 + scale)
        else:
            x = x * scale
        return x.astype(orig_dtype)


def make_norm(cfg: EncoderConfig, name: str):
    if cfg.norm_type == "rmsnorm":
        return RMSNorm(eps=cfg.norm_eps, name=name)
    return nn.LayerNorm(
        epsilon=cfg.norm_eps,
        use_bias=cfg.use_bias,
        dtype=compute_dtype(cfg),
        name=name,
    )


class _RMSNormParams(nn.Module):
    """Parameter-only stand-in for ``RMSNorm`` — same name ("scale"),
    shape, and zeros init (the unit-offset convention makes zeros the
    identity), so the tree is identical whether the norm runs as a
    module or folded into the fused-MLP kernel."""

    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "scale", nn.initializers.zeros, (self.features,)
        )


class _LayerNormParams(nn.Module):
    """Parameter-only stand-in for ``nn.LayerNorm`` — same names
    ("scale"/"bias"), shapes, and initializers, so the param tree is
    identical whether the norm runs as a module or folded into the
    fused-MLP kernel's post-LN epilogue (checkpoints swap freely)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return scale, bias


def rope_freqs(head_dim: int, max_len: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """Precompute RoPE cos/sin tables [max_len, head_dim//2] (f32)."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)  # [L, hd/2]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate [B, L, H, hd] by position tables [L, hd/2] (HF half-split)."""
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    cos = cos[None, :, None, :].astype(x.dtype)
    sin = sin[None, :, None, :].astype(x.dtype)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


def attention_bias(
    attn_mask: jax.Array,
    sliding_window: int = 0,
    causal: bool = False,
) -> jax.Array:
    """Build an additive [B, 1, L, L] attention bias.

    ``attn_mask`` is [B, L] with 1 for real tokens. Default is
    bidirectional (encoder) attention with an optional symmetric
    sliding-window band ``abs(q-k) <= window//2`` — this matches both
    ModernBERT's ``local_attention`` and bidirectional Gemma3's
    transformed window (transformers sets w//2+1 exclusive, i.e. the
    same band). ``causal=True`` adds the decoder triangle (plain Gemma3
    checkpoints); the causal sliding band is ``q - k < window``.
    """
    b, l = attn_mask.shape
    valid = attn_mask.astype(bool)
    pair = valid[:, None, None, :]  # key validity [B,1,1,L]
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    if causal:
        band = k_pos <= q_pos
        if sliding_window > 0:
            band = band & (q_pos - k_pos < sliding_window)
        pair = pair & band[None, None, :, :]
    elif sliding_window > 0:
        band = jnp.abs(q_pos - k_pos) <= (sliding_window // 2)
        pair = pair & band[None, None, :, :]
    return jnp.where(pair, 0.0, -1e30).astype(jnp.float32)


def quant_rows(x2d: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (per-token) symmetric int8: ``(codes [M,K], scales [M])``.
    Delegates to index/token_cache.py::symmetric_int8 — the ONE int8
    contract. Split out so sibling projections sharing one input
    (q/k/v; gate/up) quantize it ONCE — the quant pass is a full HBM
    read of the activations, and amortizing it across matmuls is what
    the int8 MXU win survives on (scripts/bench_int8_mxu.py: unshared
    dynamic quant gives back most of the 2.1-2.5x static int8 speedup;
    contraction-heavy shapes go below 1x)."""
    from tristage_rag_tpu.index.token_cache import symmetric_int8

    return symmetric_int8(x2d)


def quant_static(x2d: jax.Array, scale: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-tensor static int8: ``(codes [M,K], scale scalar)``.

    ``scale`` is a calibrated scalar (abs-max of representative
    activations / 127 — EncoderRuntime.calibrate_act_static). Unlike
    :func:`quant_rows` there is no reduction over the activations: the
    rescale is a compile-time-shaped scalar divide that XLA fuses into
    the producing elementwise op, which is what recovers the static
    column of scripts/bench_int8_mxu.py (2.4-2.9x on the
    contraction-heavy shapes where the dynamic mode loses). Values
    beyond the calibrated range saturate at +-127.
    """
    s = jnp.maximum(scale, 1e-8).astype(jnp.float32)
    codes = jnp.clip(
        jnp.round(x2d.astype(jnp.float32) / s), -127.0, 127.0
    ).astype(jnp.int8)
    return codes, s


def _int8_matmul(x2d, kernel, out_dtype, pre=None) -> jax.Array:
    """``x2d @ kernel`` on the int8 MXU path: dynamic per-token
    symmetric int8 activations x per-output-channel int8 weights, int32
    accumulation, f32 rescale.

    ``kernel`` is either a plain ``[K, N]`` array (quantized in-jit; the
    weight pass is O(K*N) next to the O(M*K*N) matmul) or a
    pre-quantized ``{"q8": [K, N] int8, "scale": [N]}`` dict (weights
    ride int8 in HBM; see EncoderRuntime.quantize_weights_int8).
    ``pre`` is an optional precomputed ``quant_rows(x2d)`` shared with
    sibling projections.

    v5e MXU: int8 x int8 peaks at 2x bf16 FLOPs — this is the
    "int8 activations" lever BENCH_NOTES round-3 records as the real
    stage-3 speedup path (weight-only int8 measured latency-neutral
    because the stage is MXU compute-bound).
    """
    from tristage_rag_tpu.index.token_cache import symmetric_int8

    xq, xs = quant_rows(x2d) if pre is None else pre
    if isinstance(kernel, dict):
        acc = jax.lax.dot_general(
            xq, kernel["q8"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        ws = kernel["scale"]
    else:
        wq, ws = symmetric_int8(kernel.astype(jnp.float32).T)  # [N,K],[N]
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    # xs is [M] (dynamic per-token) or a scalar (static per-tensor).
    xsb = xs if xs.ndim == 0 else xs[:, None]
    y = acc.astype(jnp.float32) * xsb * ws[None, :]
    return y.astype(out_dtype)


def _int8_dense(x2d, kernel, bias, out_dtype, pre=None):
    """One int8 projection through the fused Pallas kernel
    (ops/pallas_qdense.py — quant/dot/dequant/bias in one VMEM pass).
    ``bias`` is a flat ``[N]`` array or None. Shapes the kernel
    refuses (K or N not lane-aligned) fall back to the XLA lowering
    (:func:`_int8_matmul` + bias) — the only remaining use of that
    path after the measured-off XLA act-int8 modes were pruned
    (VERDICT r3 next-7)."""
    from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

    wq, ws = _weights_int8_kn(kernel)  # [K,N]; O(K*N), trivial vs dot
    # Static mode hands the calibrated scalar to the kernel; in
    # dynamic mode the kernel computes per-row scales in VMEM and
    # the shared `pre` codes are dead (DCE'd by XLA).
    xs = pre[1] if (pre is not None and pre[1].ndim == 0) else None
    try:
        return fused_qdense(
            x2d, wq, ws, bias=bias, x_scale=xs, out_dtype=out_dtype,
            interpret=jax.default_backend() == "cpu",
        )
    except ValueError:
        pass
    y = _int8_matmul(x2d, kernel, out_dtype, pre=pre)
    if bias is not None:
        y = y + bias.astype(out_dtype)
    return y


def _act_site(mod: nn.Module, cfg, name: str, x2d, dynamic_ok: bool = True):
    """One activation-quantization site (attn_in / attn_out / mlp_in /
    mlp_mid). Returns a precomputed ``(codes, scale)`` for
    ``QDense(pre=...)``, or ``None`` when this forward should take the
    bf16 dense path:

    * dynamic mode on a contraction-heavy site (``dynamic_ok=False`` —
      measured below 1x, see bench_int8_mxu), or int8 off entirely;
    * static mode during a CALIBRATION pass (``act_stats`` mutable):
      the forward runs bf16 so downstream sites see true activations,
      and each site sows its abs-max for
      EncoderRuntime.calibrate_act_static to turn into scales.

    In static mode the scale rides the param tree as ``<name>_scale``
    (declared here in every pass so ``module.init`` creates it).
    """
    if not cfg.int8_activations:
        return None
    # Under the fused Pallas kernel the dynamic per-row quant pass is
    # VMEM-local (no HBM read), so the contraction-heavy-site gate
    # (dynamic_ok=False at o_proj/down_proj) does not apply — but only
    # when the kernel will actually take these shapes (K and the
    # output hidden lane-aligned); otherwise _int8_dense falls back to
    # the XLA dynamic-quant lowering bench_int8_mxu measured below 1x
    # on contraction shapes.
    if x2d.shape[1] % 128 == 0 and cfg.hidden_size % 128 == 0:
        dynamic_ok = True
    if cfg.int8_act_static:
        s = mod.param(name + "_scale", nn.initializers.ones, ())
        if mod.is_mutable_collection("act_stats"):
            mod.sow(
                "act_stats", name,
                jnp.max(jnp.abs(x2d.astype(jnp.float32))),
                init_fn=lambda: jnp.float32(0.0), reduce_fn=jnp.maximum,
            )
            return None
        return quant_static(x2d, s)
    return quant_rows(x2d) if dynamic_ok else None


class QDense(nn.Module):
    """Drop-in for ``nn.Dense`` that runs the matmul int8 x int8.

    Param names/shapes are identical to ``nn.Dense`` (``kernel``
    [in, features], ``bias`` [features]) so checkpoints and param trees
    swap between the bf16 and int8 modules unchanged.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre=None):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        lead = x.shape[:-1]
        y = _int8_dense(
            x.reshape(-1, x.shape[-1]), kernel, b, self.dtype, pre=pre,
        )
        return y.reshape(*lead, self.features)


class QDenseGeneral(nn.Module):
    """Drop-in for ``nn.DenseGeneral`` (trailing-axes contraction only —
    the two forms Attention uses: ``axis=-1`` with tuple features for
    q/k/v, ``axis=(-2,-1)`` with int features for o_proj). Param layout
    matches ``nn.DenseGeneral`` exactly.
    """

    features: Any
    axis: Any = -1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre=None):
        feats = (
            (self.features,) if isinstance(self.features, int)
            else tuple(self.features)
        )
        axes = (self.axis,) if isinstance(self.axis, int) else tuple(self.axis)
        axes = tuple(a % x.ndim for a in axes)
        if axes != tuple(range(x.ndim - len(axes), x.ndim)):
            raise ValueError(f"QDenseGeneral needs trailing axes, got {axes}")
        in_dims = tuple(x.shape[a] for a in axes)
        k = 1
        for d in in_dims:
            k *= d
        n = 1
        for d in feats:
            n *= d

        def kernel_init(rng, shape, dtype=jnp.float32):
            # match nn.DenseGeneral: init on the flattened 2-D shape so
            # fan-in/out (and hence random-init values) are identical
            flat = nn.initializers.lecun_normal()(rng, (k, n), dtype)
            return flat.reshape(shape)

        kernel = self.param("kernel", kernel_init, in_dims + feats)
        lead = x.shape[: x.ndim - len(axes)]
        kern2d = (
            {"q8": kernel["q8"].reshape(k, n),
             "scale": kernel["scale"].reshape(n)}
            if isinstance(kernel, dict) else kernel.reshape(k, n)
        )
        b = (
            self.param("bias", nn.initializers.zeros, feats).reshape(-1)
            if self.use_bias
            else None
        )
        y = _int8_dense(
            x.reshape(-1, k), kern2d, b, self.dtype, pre=pre,
        )
        return y.reshape(*lead, *feats)


class Attention(nn.Module):
    cfg: EncoderConfig
    layer_idx: int

    @staticmethod
    def post_ln_foldable(cfg) -> bool:
        """Can the out-proj + residual + LN fold engage (lane-aligned
        value width)? EncoderLayer checks this before passing post_ln."""
        return (cfg.num_heads * cfg.dims_per_head) % 128 == 0

    def _fused_qkv(self, x, pre, dt):
        """q/k/v as ONE fused Pallas int8 call: the three projections
        share the input, so concatenating their (per-output-channel
        quantized) kernels along N turns three kernels + three HBM
        reads of x into one of each. Per-channel scales make the
        concatenation numerically exact vs separate calls. Returns
        (q, k, v) or None when shapes are not lane-aligned (callers
        then take the per-projection path — no params declared here in
        that case, so module names never collide)."""
        cfg = self.cfg
        h, kvh, hd = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
        kdim = x.shape[-1]
        nq, nkv = h * hd, kvh * hd
        if kdim % 128 or nq % 128 or nkv % 128:
            return None
        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        kq, bq = _ProjParams((kdim,), (h, hd), cfg.attn_bias, name="q_proj")()
        kk, bk = _ProjParams((kdim,), (kvh, hd), cfg.attn_bias, name="k_proj")()
        kv, bv = _ProjParams((kdim,), (kvh, hd), cfg.attn_bias, name="v_proj")()
        parts = [
            _weights_int8_kn(_flat2d(w, kdim, n))
            for w, n in ((kq, nq), (kk, nkv), (kv, nkv))
        ]
        w_all = jnp.concatenate([p[0] for p in parts], axis=1)
        s_all = jnp.concatenate([p[1] for p in parts])
        b_all = (
            jnp.concatenate([b.reshape(-1) for b in (bq, bk, bv)])
            if cfg.attn_bias
            else None
        )
        xs = pre[1] if pre[1].ndim == 0 else None
        y = fused_qdense(
            x.reshape(-1, kdim), w_all, s_all, bias=b_all, x_scale=xs,
            out_dtype=dt, interpret=jax.default_backend() == "cpu",
        )
        b, l = x.shape[0], x.shape[1]
        q, k, v = jnp.split(y, [nq, nq + nkv], axis=1)
        return (
            q.reshape(b, l, h, hd),
            k.reshape(b, l, kvh, hd),
            v.reshape(b, l, kvh, hd),
        )

    def _fused_block(self, x, mask, post_ln, dt):
        """The whole post-LN attention block as QKV matmuls + ONE
        Pallas kernel (ops/pallas_attention.py::fused_attention_block):
        q/k/v stay 2-D end-to-end (no RoPE / GQA / qk-norm in this
        family), and the kernel absorbs per-head attention, o_proj,
        residual, and LayerNorm. Returns None when the runtime swapped
        quantized weight dicts in (weights_int8) — those dequantize
        inline, same numerics as runtime.DequantModule (in practice
        attention kernels never ride as dicts: only the MLP
        projections stay q8 — runtime._FUSED_MLP_PROJ)."""
        cfg = self.cfg
        h, hd = cfg.num_heads, cfg.dims_per_head
        b, l, _ = x.shape
        d, n = h * hd, cfg.hidden_size

        def dq(w):
            if isinstance(w, dict):
                return (
                    w["q8"].astype(jnp.float32) * w["scale"]
                ).astype(dt)
            return w.astype(dt)

        params = []
        for name in ("q_proj", "k_proj", "v_proj"):
            kk, bb = _ProjParams(
                (n,), (h, hd), cfg.attn_bias, name=name
            )()
            params.append((dq(_flat2d(kk, n, d)), bb))
        ko, bo = _ProjParams(
            (h, hd), (n,), cfg.attn_bias, name="o_proj"
        )()
        wo = dq(_flat2d(ko, d, n))
        x2 = x.reshape(-1, n).astype(dt)
        qkv = []
        for w, bb in params:
            y = x2 @ w
            if bb is not None:
                y = y + bb.reshape(-1).astype(dt)
            qkv.append(y.reshape(b, l, d))
        lns, lnb, eps = post_ln
        from tristage_rag_tpu.ops.pallas_attention import (
            fused_attention_block,
        )

        scale = (cfg.query_scale or hd) ** -0.5
        return fused_attention_block(
            *qkv, mask, x.astype(dt), wo.astype(dt),
            None if bo is None else bo.reshape(-1),
            lns, lnb, scale=scale, heads=h, ln_eps=eps, out_dtype=dt,
            interpret=jax.default_backend() == "cpu",
        )

    def _flash(self, q, k, v, mask, scale, dt):
        """Fused attention for padding-only masks: the [B,h,L,L]
        logits/probs never materialize to HBM. ``mask`` [B, L] (1 =
        real token) keys validity — identical to the dense key-validity
        bias for every valid query row; padded rows differ but are
        masked downstream by every pooling/scoring consumer.

        Dispatch on L: jax's Pallas flash kernel at lane-aligned
        lengths (its hard requirement), the whole-sequence small-bucket
        kernel (ops/pallas_attention.py) otherwise — the encoder only
        passes a mask when one of the two engages. On CPU, pure-jax
        mha_reference / interpret mode keep the mapping testable."""
        flash_here = (
            getattr(self.cfg, "flash_attention", False)
            and q.shape[1] % 128 == 0
        )
        if not flash_here:
            from tristage_rag_tpu.ops.pallas_attention import (
                fused_attention_small,
            )

            return fused_attention_small(
                q, k, v, mask, scale=scale, out_dtype=dt,
                interpret=jax.default_backend() == "cpu",
            )
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        qh = q.transpose(0, 2, 1, 3)  # [B, h, L, hd]
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        seg = fa.SegmentIds(
            q=mask.astype(jnp.int32), kv=mask.astype(jnp.int32)
        )
        if jax.default_backend() == "cpu":
            o = fa.mha_reference(
                qh, kh, vh, None, segment_ids=seg, sm_scale=scale
            )
        else:
            o = fa.flash_attention(
                qh, kh, vh, segment_ids=seg, sm_scale=scale
            )
        return o.transpose(0, 2, 1, 3).astype(dt)  # [B, L, h, hd]

    @nn.compact
    def __call__(self, x, bias, cos, sin, mask=None, post_ln=None):
        """``post_ln``: optional ``(scale, bias, eps)`` — the post-LN
        encoder's residual+LayerNorm applied INSIDE this module so it
        can fuse with the output projection: with the whole-block
        kernel engaged (ops/pallas_attention.py::fused_attention_block)
        the QKV-to-LN tail runs as ONE Pallas call; otherwise the LN
        applies inline after o_proj (numerically the module path).
        EncoderLayer passes it iff the fused kernel stack engages."""
        cfg = self.cfg
        dt = compute_dtype(cfg)
        h, kvh, hd = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
        b, l, _ = x.shape
        # q/k/v share one input: quantize it ONCE (the quant pass is a
        # full activation read; sharing it across the three matmuls is
        # what keeps dynamic int8 ahead of bf16 — see
        # scripts/bench_int8_mxu.py + BENCH_NOTES round-3).
        pre = _act_site(self, cfg, "attn_in", x.reshape(-1, x.shape[-1]))
        blk = (
            mask is not None
            and post_ln is not None
            and pre is None
            and cos is None
            and not cfg.qk_norm
            and kvh == h
            and (h * hd) % 128 == 0
            and cfg.hidden_size % 128 == 0
        )
        if blk:
            return self._fused_block(x, mask, post_ln, dt)
        if pre is not None:
            qkv = self._fused_qkv(x, pre, dt)
            if qkv is not None:
                q, k, v = qkv
            else:
                dense = lambda feats, name: QDenseGeneral(
                    features=feats, use_bias=cfg.attn_bias, dtype=dt,
                    name=name,
                )
                q = dense((h, hd), "q_proj")(x, pre=pre)
                k = dense((kvh, hd), "k_proj")(x, pre=pre)
                v = dense((kvh, hd), "v_proj")(x, pre=pre)
        else:
            dense = lambda feats, name: nn.DenseGeneral(
                features=feats, use_bias=cfg.attn_bias, dtype=dt, name=name
            )
            q = dense((h, hd), "q_proj")(x)
            k = dense((kvh, hd), "k_proj")(x)
            v = dense((kvh, hd), "v_proj")(x)
        if cfg.qk_norm:
            qn = RMSNorm(eps=cfg.norm_eps, name="q_norm")
            kn = RMSNorm(eps=cfg.norm_eps, name="k_norm")
            q, k = qn(q), kn(k)
        if cos is not None:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        if kvh != h:
            rep = h // kvh
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        scale = (cfg.query_scale or hd) ** -0.5
        if mask is not None:
            out = self._flash(q, k, v, mask, scale, dt)
        else:
            logits = jnp.einsum(
                "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
            )
            logits = logits * scale
            if cfg.attn_logit_softcap > 0:
                c = cfg.attn_logit_softcap
                logits = jnp.tanh(logits / c) * c
            logits = logits + bias
            # Softmax with the normalization AFTER the V einsum:
            # softmax(l) @ v == (exp(l - max) @ v) / sum(exp(l - max)).
            # jax.nn.softmax would materialize the normalized probs in
            # f32 before the .astype — at [B,h,L,L] that f32
            # write+read is the dominant attention HBM traffic on the
            # dense path (e.g. indexing batches: 64x512 rows, ~2.4
            # GB/layer; the fused-funnel trace showed it at 92
            # us/layer). Casting the UNnormalized exp to the compute
            # dtype lets the producer fusion emit bf16 directly (~3x
            # less traffic); the f32 row-sum rides out as a [B,h,L]
            # side output and divides the einsum result. Same padding
            # semantics as jax.nn.softmax (all -1e30 rows -> uniform);
            # rounding differs from normalize-then-cast by ~1 ulp.
            m = jax.lax.stop_gradient(
                jnp.max(logits, axis=-1, keepdims=True)
            )
            e = jnp.exp(logits - m)
            denom = jnp.sum(e, axis=-1)  # [B, h, L] f32
            # Force the bf16 exps to MATERIALIZE: without the barrier
            # XLA fuses the .astype into the consuming einsum and still
            # writes e to HBM in f32 (the session-9 stage-3 funnel
            # trace showed f32[100,12,96,96] between the two fusions —
            # the dominant dense-attention HBM tensor at 2x the
            # intended width). The barrier pins the producer fusion's
            # output to bf16; numerics are unchanged (the cast happens
            # either way, barrier or not).
            eb, denom = jax.lax.optimization_barrier(
                (e.astype(dt), denom)
            )
            out = jnp.einsum(
                "bhlm,bmhd->blhd", eb, v,
                preferred_element_type=jnp.float32,
            )
            out = out / jnp.transpose(denom, (0, 2, 1))[..., None]
            out = out.astype(dt)
        # o_proj stays bf16 under DYNAMIC int8: its input is unique (no
        # quant sharing) and square K=N shapes measured BELOW 1x with
        # dynamic quant (bench_int8_mxu: 0.67-0.90x). Static scales
        # remove the per-row reduction, so o_proj quantizes too
        # (2.4-2.9x on contraction shapes in the static column).
        if post_ln is not None:
            # Residual + LayerNorm applied inline (same math as
            # flax LayerNorm; params arrive from EncoderLayer's
            # _LayerNormParams so the tree is unchanged). A separate
            # out-proj+LN Pallas kernel measured a NET LOSS here
            # (session-10: 21 us kernel + ~250 us of relayout copies
            # around it); the whole-block kernel (_fused_block) is the
            # winning fold — this branch is its fallback when the
            # block kernel can't engage (RoPE/GQA/int8/unaligned).
            lns, lnb, eps = post_ln
            y = nn.DenseGeneral(
                features=cfg.hidden_size, axis=(-2, -1),
                use_bias=cfg.attn_bias, dtype=dt, name="o_proj",
            )(out)
            z = (x + y).astype(jnp.float32)
            mu = jnp.mean(z, axis=-1, keepdims=True)
            var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
            z = (z - mu) * jax.lax.rsqrt(var + jnp.float32(eps))
            z = z * lns.reshape(1, 1, -1)
            if lnb is not None:
                z = z + lnb.reshape(1, 1, -1)
            return z.astype(dt)
        o_pre = _act_site(
            self, cfg, "attn_out",
            out.reshape(-1, h * hd), dynamic_ok=False,
        )
        if o_pre is not None:
            return QDenseGeneral(
                features=cfg.hidden_size, axis=(-2, -1),
                use_bias=cfg.attn_bias, dtype=dt, name="o_proj",
            )(out, pre=o_pre)
        return nn.DenseGeneral(
            features=cfg.hidden_size,
            axis=(-2, -1),
            use_bias=cfg.attn_bias,
            dtype=dt,
            name="o_proj",
        )(out)


class _ProjParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense``/``nn.DenseGeneral``:
    declares ``kernel`` / ``bias`` with identical names, shapes and
    initializers (flattened-2D lecun fan, like QDenseGeneral), so the
    fused-block paths (which consume raw weights in one Pallas call)
    keep the EXACT param tree of the per-projection modules —
    checkpoints and trained params swap between all int8 modes."""

    in_dims: tuple
    feats: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = n = 1
        for d in self.in_dims:
            k *= d
        for d in self.feats:
            n *= d

        def kernel_init(rng, shape, dtype=jnp.float32):
            flat = nn.initializers.lecun_normal()(rng, (k, n), dtype)
            return flat.reshape(shape)

        kern = self.param("kernel", kernel_init, self.in_dims + self.feats)
        b = (
            self.param("bias", nn.initializers.zeros, self.feats)
            if self.use_bias
            else None
        )
        return kern, b


def _flat2d(kernel, k: int, n: int):
    """View an nd (or pre-quantized dict) kernel as 2-D [k, n]."""
    if isinstance(kernel, dict):
        return {
            "q8": kernel["q8"].reshape(k, n),
            "scale": kernel["scale"].reshape(n),
        }
    return kernel.reshape(k, n)


def _weights_int8_kn(kernel):
    """Per-output-channel int8 weights as ``([K, N] int8, [N] f32)``,
    accepting either a plain float kernel (quantized in-jit) or the
    pre-quantized ``{"q8", "scale"}`` dict (stage*_weights_int8)."""
    from tristage_rag_tpu.index.token_cache import symmetric_int8

    if isinstance(kernel, dict):
        return kernel["q8"], kernel["scale"]
    wq_nk, ws = symmetric_int8(kernel.astype(jnp.float32).T)
    return wq_nk.T, ws


class Mlp(nn.Module):
    cfg: EncoderConfig

    # EncoderConfig.activation -> fused-kernel gate epilogue
    _FUSED_ACTS = {
        "geglu": "gelu", "geglu_tanh": "gelu_tanh", "swiglu": "silu",
        "gelu": "gelu", "relu": "relu",
    }

    @classmethod
    def fused_bf16_engages(cls, cfg) -> bool:
        """Static predicate: will __call__ take the bf16 fused-kernel
        path? Shared with EncoderLayer (post-LN epilogue gating) and
        EncoderRuntime (weight-int8 q8-dict pass-through) so the three
        can never drift."""
        return bool(
            not cfg.int8_activations
            and getattr(cfg, "fused_mlp", False)
            and cfg.hidden_size % 128 == 0
            and cfg.mlp_dim % 128 == 0
            and cfg.activation in cls._FUSED_ACTS
        )

    def _fused_pallas(self, x, glu: bool):
        """The whole MLP block as one Pallas kernel
        (ops/pallas_qdense.py::fused_qmlp): the [M, mlp_dim]
        intermediate stays in VMEM instead of round-tripping HBM
        between the two matmuls, and x is read once for gate+up."""
        from tristage_rag_tpu.ops.pallas_qdense import fused_qmlp

        cfg = self.cfg
        dt = compute_dtype(cfg)
        hid, f, bias = cfg.hidden_size, cfg.mlp_dim, cfg.mlp_bias_flag
        kg, bg = _ProjParams((hid,), (f,), bias,
                             name="gate_proj" if glu else "up_proj")()
        if glu:
            ku, bu = _ProjParams((hid,), (f,), bias, name="up_proj")()
            wu, us = _weights_int8_kn(ku)
        else:
            ku = bu = wu = us = None
        kd, bd = _ProjParams((f,), (hid,), bias, name="down_proj")()
        wg, gs = _weights_int8_kn(kg)
        wd, ds = _weights_int8_kn(kd)
        sx = sh = None
        if cfg.int8_act_static:
            sx = self.param("mlp_in_scale", nn.initializers.ones, ())
            sh = self.param("mlp_mid_scale", nn.initializers.ones, ())
        lead = x.shape[:-1]
        y = fused_qmlp(
            x.reshape(-1, hid), wg, wu, wd, gs, us, ds, bg, bu, bd,
            x_scale=sx, h_scale=sh,
            act=self._FUSED_ACTS[cfg.activation], glu=glu, out_dtype=dt,
            interpret=jax.default_backend() == "cpu",
        )
        return y.reshape(*lead, hid)

    def _fused_bf16(self, x, glu: bool, post_ln=None, pre_norm=None,
                    post_rms=None):
        """Whole-block bf16 fused MLP (fused_mlp_bf16): the
        [M, mlp_dim] intermediate stays in VMEM at the native compute
        dtype — no quantization involved."""
        from tristage_rag_tpu.ops.pallas_qdense import fused_mlp_bf16

        cfg = self.cfg
        dt = compute_dtype(cfg)
        hid, f, bias = cfg.hidden_size, cfg.mlp_dim, cfg.mlp_bias_flag
        kg, bg = _ProjParams((hid,), (f,), bias,
                             name="gate_proj" if glu else "up_proj")()
        ku, bu = (
            _ProjParams((hid,), (f,), bias, name="up_proj")()
            if glu
            else (None, None)
        )
        kd, bd = _ProjParams((f,), (hid,), bias, name="down_proj")()

        # weight-int8 (stage*_weights_int8): q8 dicts pass through to
        # the kernel — int8 weight tiles dequantize in VMEM and the
        # per-channel scale folds into the f32 accumulator after each
        # dot. Dequantizing here instead would materialize the dense
        # kernels to HBM per dispatch, which measured SLOWER than
        # never quantizing (BENCH_NOTES session 9).
        def wq(kern):
            if isinstance(kern, dict):
                return kern["q8"], kern["scale"].reshape(1, -1)
            return (None, None) if kern is None else (kern.astype(dt), None)

        (wg_, sg), (wu_, su), (wd_, sd) = wq(kg), wq(ku), wq(kd)
        lead = x.shape[:-1]
        ln_scale = ln_bias = None
        ln_eps = cfg.norm_eps
        if post_ln is not None:
            ln_scale, ln_bias, ln_eps = post_ln
        pre_kind = pre_scale = pre_bias = None
        post_rms_scale = None
        residual = False
        if pre_norm is not None:
            pre_kind, pre_scale, pre_bias = pre_norm
            post_rms_scale = post_rms
            residual = True
        y = fused_mlp_bf16(
            x.reshape(-1, hid).astype(dt),
            wg_, wu_ if glu else None, wd_,
            bg, bu, bd, sg=sg, su=su, sd=sd,
            ln_scale=ln_scale, ln_bias=ln_bias, ln_eps=ln_eps,
            pre_kind=pre_kind, pre_scale=pre_scale, pre_bias=pre_bias,
            post_rms_scale=post_rms_scale, residual=residual,
            act=self._FUSED_ACTS[cfg.activation], glu=glu, out_dtype=dt,
            interpret=jax.default_backend() == "cpu",
        )
        return y.reshape(*lead, hid)

    @nn.compact
    def __call__(self, x, post_ln=None, pre_norm=None, post_rms=None):
        """``post_ln``: optional ``(scale, bias, eps)`` — the caller's
        residual+LayerNorm epilogue ``LN(x + mlp(x))`` folded into the
        fused kernel (post-LN encoders only). ``pre_norm``: optional
        ``(kind, scale, bias)`` — the pre-LN encoders' input norm as a
        kernel prologue, with the residual add folded into the
        epilogue: ``x + [post_rms](mlp(pre(x)))``; ``post_rms`` is the
        Gemma post_mlp_norm scale. EncoderLayer passes these iff
        ``fused_bf16_engages``; the module path never receives them."""
        cfg = self.cfg
        dt = compute_dtype(cfg)
        glu = cfg.activation in ("geglu", "geglu_tanh", "swiglu")
        calibrating = cfg.int8_act_static and self.is_mutable_collection(
            "act_stats"
        )
        aligned = (
            cfg.hidden_size % 128 == 0
            and cfg.mlp_dim % 128 == 0
            and cfg.activation in self._FUSED_ACTS
        )
        if cfg.int8_activations and not calibrating and aligned:
            return self._fused_pallas(x, glu)
        if self.fused_bf16_engages(cfg):
            return self._fused_bf16(
                x, glu, post_ln=post_ln, pre_norm=pre_norm,
                post_rms=post_rms,
            )
        assert post_ln is None and pre_norm is None, (
            "norm folding requires the fused kernel path"
        )
        dense = lambda feats, name: nn.Dense(
            features=feats, use_bias=cfg.mlp_bias_flag, dtype=dt, name=name
        )
        # Expansion matmuls (gate/up, N = mlp_dim >> K) are where
        # dynamic-quant int8 wins (1.1-1.7x measured); gate and up
        # share the input, so quantize it once.
        pre = _act_site(self, cfg, "mlp_in", x.reshape(-1, x.shape[-1]))
        if pre is not None:
            qdense = lambda feats, name: QDense(
                features=feats, use_bias=cfg.mlp_bias_flag, dtype=dt,
                name=name,
            )
        else:
            qdense = dense

        def expand(feats, name, xin):
            if pre is not None:
                return qdense(feats, name)(xin, pre=pre)
            return dense(feats, name)(xin)

        if cfg.activation in ("geglu", "geglu_tanh", "swiglu"):
            gate = expand(cfg.mlp_dim, "gate_proj", x)
            up = expand(cfg.mlp_dim, "up_proj", x)
            if cfg.activation == "swiglu":
                act = nn.silu(gate)
            elif cfg.activation == "geglu_tanh":  # gelu_pytorch_tanh (Gemma)
                act = nn.gelu(gate, approximate=True)
            else:  # exact gelu (ModernBERT)
                act = nn.gelu(gate, approximate=False)
            h = act * up
        else:
            h = expand(cfg.mlp_dim, "up_proj", x)
            h = nn.gelu(h, approximate=False) if cfg.activation == "gelu" else nn.relu(h)
        # down_proj stays bf16 under DYNAMIC int8: the quant-reduction
        # pass over the 4x-wide intermediate costs more than the int8
        # matmul saves (bench_int8_mxu: 0.87-0.98x). With static scales
        # it quantizes too (2.9x static column on 3072->768).
        mid_pre = _act_site(
            self, cfg, "mlp_mid", h.reshape(-1, h.shape[-1]),
            dynamic_ok=False,
        )
        if mid_pre is not None:
            return QDense(
                features=cfg.hidden_size, use_bias=cfg.mlp_bias_flag,
                dtype=dt, name="down_proj",
            )(h, pre=mid_pre)
        return dense(cfg.hidden_size, "down_proj")(h)


class EncoderLayer(nn.Module):
    cfg: EncoderConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, bias, cos, sin, mask=None):
        cfg = self.cfg
        attn = Attention(cfg, self.layer_idx, name="attn")
        mlp = Mlp(cfg, name="mlp")
        if cfg.pre_norm:
            # Pre-LN (Gemma3 / ModernBERT).
            if cfg.skip_first_attn_norm and self.layer_idx == 0:
                h = x  # ModernBERT layer 0: attn input norm is Identity
            else:
                h = make_norm(cfg, "attn_norm")(x)
            h = attn(h, bias, cos, sin, mask=mask)
            if cfg.gemma_norms:
                h = make_norm(cfg, "post_attn_norm")(h)
            x = x + h
            if Mlp.fused_bf16_engages(cfg):
                # Fold the input norm (prologue), optional Gemma
                # post_mlp_norm, and the residual add into the fused
                # kernel: x + [post_rms](mlp(norm(x))) in one pass —
                # the normed input and raw MLP output never touch HBM.
                # Param stand-ins keep the tree identical.
                if cfg.norm_type == "rmsnorm":
                    ps = _RMSNormParams(cfg.hidden_size, name="mlp_norm")()
                    pre = ("rms", ps, None)
                else:
                    lns, lnb = _LayerNormParams(
                        cfg.hidden_size, cfg.use_bias, name="mlp_norm"
                    )()
                    pre = ("ln", lns, lnb)
                prs = (
                    _RMSNormParams(cfg.hidden_size, name="post_mlp_norm")()
                    if cfg.gemma_norms
                    else None
                )
                x = mlp(x, pre_norm=pre, post_rms=prs)
            else:
                h = make_norm(cfg, "mlp_norm")(x)
                h = mlp(h)
                if cfg.gemma_norms:
                    h = make_norm(cfg, "post_mlp_norm")(h)
                x = x + h
        else:
            # Post-LN (BERT/MiniLM).
            if (
                cfg.norm_type != "rmsnorm"
                and Mlp.fused_bf16_engages(cfg)
                and Attention.post_ln_foldable(cfg)
            ):
                lns_a, lnb_a = _LayerNormParams(
                    cfg.hidden_size, cfg.use_bias, name="attn_norm"
                )()
                x = attn(
                    x, bias, cos, sin, mask=mask,
                    post_ln=(lns_a, lnb_a, cfg.norm_eps),
                )
            else:
                x = make_norm(cfg, "attn_norm")(
                    x + attn(x, bias, cos, sin, mask=mask)
                )
            if cfg.norm_type != "rmsnorm" and Mlp.fused_bf16_engages(cfg):
                # Fold the residual+LN into the fused-MLP kernel's
                # epilogue: LN(x + mlp(x)) in one pass — the raw MLP
                # output and the pre-norm sum never touch HBM (the XLA
                # path's dominant per-layer fusion, BENCH_NOTES s8).
                # _LayerNormParams keeps the tree identical to the
                # module path.
                lns, lnb = _LayerNormParams(
                    cfg.hidden_size, cfg.use_bias, name="mlp_norm"
                )()
                x = mlp(x, post_ln=(lns, lnb, cfg.norm_eps))
            else:
                x = make_norm(cfg, "mlp_norm")(x + mlp(x))
        return x

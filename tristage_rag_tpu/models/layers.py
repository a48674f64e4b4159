"""Flax building blocks for the encoder family.

Everything here is shape-static and jit-friendly: attention masks are
built with broadcasted iota (no data-dependent control flow), sliding
windows are mask-based (sequences are <=512 tokens — SURVEY.md §5.7 —
so banded attention would not pay for itself on the MXU).
"""

from __future__ import annotations

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


class Attention(nn.Module):
    cfg: EncoderConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, bias, cos, sin):
        cfg = self.cfg
        dt = compute_dtype(cfg)
        h, kvh, hd = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
        dense = lambda feats, name: nn.DenseGeneral(
            features=feats, use_bias=cfg.attn_bias, dtype=dt, name=name
        )
        b, l, _ = x.shape
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
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
        logits = logits * scale
        if cfg.attn_logit_softcap > 0:
            c = cfg.attn_logit_softcap
            logits = jnp.tanh(logits / c) * c
        logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(dt)
        out = jnp.einsum("bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32)
        out = out.astype(dt)
        return nn.DenseGeneral(
            features=cfg.hidden_size,
            axis=(-2, -1),
            use_bias=cfg.attn_bias,
            dtype=dt,
            name="o_proj",
        )(out)


class Mlp(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = compute_dtype(cfg)
        dense = lambda feats, name: nn.Dense(
            features=feats, use_bias=cfg.mlp_bias_flag, dtype=dt, name=name
        )
        if cfg.activation in ("geglu", "geglu_tanh", "swiglu"):
            gate = dense(cfg.mlp_dim, "gate_proj")(x)
            up = dense(cfg.mlp_dim, "up_proj")(x)
            if cfg.activation == "swiglu":
                act = nn.silu(gate)
            elif cfg.activation == "geglu_tanh":  # gelu_pytorch_tanh (Gemma)
                act = nn.gelu(gate, approximate=True)
            else:  # exact gelu (ModernBERT)
                act = nn.gelu(gate, approximate=False)
            h = act * up
        else:
            h = dense(cfg.mlp_dim, "up_proj")(x)
            h = nn.gelu(h, approximate=False) if cfg.activation == "gelu" else nn.relu(h)
        return dense(cfg.hidden_size, "down_proj")(h)


class EncoderLayer(nn.Module):
    cfg: EncoderConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, bias, cos, sin):
        cfg = self.cfg
        attn = Attention(cfg, self.layer_idx, name="attn")
        mlp = Mlp(cfg, name="mlp")
        if cfg.pre_norm:
            # Pre-LN (Gemma3 / ModernBERT).
            if cfg.skip_first_attn_norm and self.layer_idx == 0:
                h = x  # ModernBERT layer 0: attn input norm is Identity
            else:
                h = make_norm(cfg, "attn_norm")(x)
            h = attn(h, bias, cos, sin)
            if cfg.gemma_norms:
                h = make_norm(cfg, "post_attn_norm")(h)
            x = x + h
            h = make_norm(cfg, "mlp_norm")(x)
            h = mlp(h)
            if cfg.gemma_norms:
                h = make_norm(cfg, "post_mlp_norm")(h)
            x = x + h
        else:
            # Post-LN (BERT/MiniLM).
            x = make_norm(cfg, "attn_norm")(x + attn(x, bias, cos, sin))
            x = make_norm(cfg, "mlp_norm")(x + mlp(x))
        return x

"""Task heads over the shared TextEncoder.

* BiEncoder — sentence embeddings (stage 1). Parity target:
  sentence-transformers pooling+projection+normalize semantics
  (reference loads ST models at src/stage1_retriever.py:137-228).
* ColBERTEncoder — per-token embeddings (stage 2). Parity target:
  AutoModel token outputs + linear projection
  (src/stage2_rescorer.py:134-242).
* CrossEncoder — joint (query, doc) relevance logit (stage 3). Parity
  target: AutoModelForSequenceClassification / ST CrossEncoder
  (src/stage3_reranker.py:120-190).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from tristage_rag_tpu.models.config import (
    ColBERTConfig,
    CrossEncoderConfig,
    EncoderConfig,
    PoolingConfig,
)
from tristage_rag_tpu.models.encoder import TextEncoder
from tristage_rag_tpu.models.layers import compute_dtype


def pool(hidden: jax.Array, mask: jax.Array, method: str) -> jax.Array:
    """[B, L, H] x [B, L] -> [B, H] in f32."""
    h = hidden.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    if method == "mean":
        s = jnp.einsum("blh,bl->bh", h, m)
        n = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1e-9)
        return s / n
    if method == "cls":
        return h[:, 0, :]
    if method == "max":
        neg = jnp.where(mask.astype(bool)[..., None], h, -1e30)
        return jnp.max(neg, axis=1)
    if method == "lasttoken":
        idx = jnp.maximum(jnp.sum(mask.astype(jnp.int32), axis=-1) - 1, 0)
        return jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0, :]
    raise ValueError(f"unknown pooling: {method!r}")


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


class BiEncoder(nn.Module):
    cfg: EncoderConfig
    head: PoolingConfig

    @nn.compact
    def __call__(self, input_ids, attn_mask, token_type_ids=None):
        hidden = TextEncoder(self.cfg, name="encoder")(
            input_ids, attn_mask, token_type_ids
        )
        x = pool(hidden, attn_mask, self.head.pooling)
        dt = compute_dtype(self.cfg)
        bias_flags = self.head.projection_bias
        for i, dim in enumerate(self.head.projection_dims):
            use_bias = bias_flags[i] if i < len(bias_flags) else False
            x = nn.Dense(dim, use_bias=use_bias, dtype=dt, name=f"proj_{i}")(
                x.astype(dt)
            ).astype(jnp.float32)
        if self.head.normalize:
            x = l2_normalize(x)
        return x  # [B, E] f32


class ColBERTEncoder(nn.Module):
    cfg: EncoderConfig
    head: ColBERTConfig

    @nn.compact
    def __call__(self, input_ids, attn_mask, token_type_ids=None):
        hidden = TextEncoder(self.cfg, name="encoder")(
            input_ids, attn_mask, token_type_ids
        )
        dt = compute_dtype(self.cfg)
        if self.head.project:
            tok = nn.Dense(
                self.head.output_dim, use_bias=self.head.project_bias,
                dtype=dt, name="colbert_proj",
            )(hidden).astype(jnp.float32)
        else:
            # reference-faithful raw-hidden-state MaxSim
            # (src/stage2_rescorer.py:156-165)
            tok = hidden.astype(jnp.float32)
        if self.head.normalize:
            tok = l2_normalize(tok)
        # Zero out padded positions so downstream kernels can rely on it.
        tok = tok * attn_mask.astype(jnp.float32)[..., None]
        return tok  # [B, L, output_dim] f32


class CrossEncoder(nn.Module):
    cfg: EncoderConfig
    head: CrossEncoderConfig

    @nn.compact
    def __call__(self, input_ids, attn_mask, token_type_ids=None):
        hidden = TextEncoder(self.cfg, name="encoder")(
            input_ids, attn_mask, token_type_ids
        )
        dt = compute_dtype(self.cfg)
        x = hidden[:, 0, :]  # CLS
        if self.head.pooler_tanh:
            x = nn.tanh(
                nn.Dense(
                    self.cfg.hidden_size, use_bias=True, dtype=dt, name="pooler"
                )(x)
            )
        logits = nn.Dense(
            self.head.num_labels, use_bias=True, dtype=jnp.float32, name="classifier"
        )(x.astype(jnp.float32))
        return logits  # [B, num_labels] f32 (activation applied by caller)


def apply_score_activation(logits: jax.Array, activation: str) -> jax.Array:
    """Collapse classifier logits [B, num_labels] to one score per pair.

    Matches src/stage3_reranker.py:168-183: 1-label heads use sigmoid
    (or raw for "none"); multi-label heads use the softmax probability
    of the last (positive) class.
    """
    if logits.shape[-1] == 1:
        raw = logits[..., 0]
        return raw if activation == "none" else jax.nn.sigmoid(raw)
    if activation == "none":
        return logits[..., -1]
    return jax.nn.softmax(logits, axis=-1)[..., -1]

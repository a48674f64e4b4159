"""Batched masked MaxSim — the stage-2 (late-interaction) hot op.

TPU-native replacement for the per-candidate Python loop in the
reference's ColBERT rescorer (src/stage2_rescorer.py:167-201,268-291):
instead of one small matmul per document, all C candidates are scored in
a single batched einsum over padded token embeddings with attention
masks, so the MXU sees one large contraction.

Semantics (matching the reference):

* ``maxsim``: mean over valid query tokens of (max over valid doc tokens
  of cosine similarity) — src/stage2_rescorer.py:167-183.
* ``colbert``: softmax(per-query-token max sims) weighted sum —
  src/stage2_rescorer.py:185-201.

Token embeddings are L2-normalised here, so dot product == cosine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1e30)


def _normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("method", "normalize"))
def maxsim_scores(
    q_tokens: jax.Array,
    q_mask: jax.Array,
    d_tokens: jax.Array,
    d_mask: jax.Array,
    method: str = "maxsim",
    normalize: bool = True,
):
    """Score C candidate documents against one query.

    Args:
      q_tokens: [Lq, D] query token embeddings.
      q_mask: [Lq] bool/int — 1 for real query tokens.
      d_tokens: [C, Ld, D] padded candidate token embeddings.
      d_mask: [C, Ld] — 1 for real doc tokens.
      method: "maxsim" (mean of max) or "colbert" (softmax-weighted).
      normalize: L2-normalise token embeddings (cosine similarity).

    Returns:
      [C] f32 scores. Candidates with no valid tokens score 0.
    """
    if normalize:
        q_tokens = _normalize(q_tokens)
        d_tokens = _normalize(d_tokens)
    # [C, Lq, Ld] similarity; f32 accumulation on the MXU.
    sim = jnp.einsum(
        "qd,cld->cql",
        q_tokens.astype(d_tokens.dtype),
        d_tokens,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d_valid = d_mask.astype(bool)[:, None, :]  # [C, 1, Ld]
    sim = jnp.where(d_valid, sim, _NEG)
    per_q_max = jnp.max(sim, axis=-1)  # [C, Lq]
    q_valid = q_mask.astype(bool)[None, :]  # [1, Lq]
    has_doc = jnp.any(d_mask.astype(bool), axis=-1)  # [C]
    per_q_max = jnp.where(q_valid & has_doc[:, None], per_q_max, 0.0)

    nq = jnp.maximum(jnp.sum(q_mask.astype(jnp.float32)), 1.0)
    if method == "colbert":
        # softmax over valid query tokens of their max sims, then a
        # weighted sum (reference: src/stage2_rescorer.py:185-201).
        logits = jnp.where(q_valid & has_doc[:, None], per_q_max, _NEG)
        w = jax.nn.softmax(logits, axis=-1)
        scores = jnp.sum(w * jnp.where(q_valid, per_q_max, 0.0), axis=-1)
    elif method == "maxsim":
        scores = jnp.sum(per_q_max, axis=-1) / nq
    else:
        raise ValueError(f"unknown maxsim method: {method!r}")
    return jnp.where(has_doc, scores, 0.0)


@functools.partial(jax.jit, static_argnames=("normalize",))
def similarity_matrix(
    q_tokens: jax.Array,
    q_mask: jax.Array,
    d_tokens: jax.Array,
    d_mask: jax.Array,
    normalize: bool = True,
):
    """Full token-level similarity matrix [Lq, Ld] for one (q, d) pair.

    Parity with src/stage2_rescorer.py:307-320 (compute_similarity_matrix);
    invalid positions are 0.
    """
    if normalize:
        q_tokens = _normalize(q_tokens)
        d_tokens = _normalize(d_tokens)
    sim = jnp.einsum(
        "qd,ld->ql",
        q_tokens.astype(jnp.float32),
        d_tokens.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    valid = q_mask.astype(bool)[:, None] & d_mask.astype(bool)[None, :]
    return jnp.where(valid, sim, 0.0)

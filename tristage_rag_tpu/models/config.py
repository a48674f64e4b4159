"""Architecture configs for the encoder family.

One config dataclass drives a single Flax encoder implementation that
covers the reference's three model families (SURVEY.md §2.1):

* BERT/MiniLM (cross-encoder/ms-marco-MiniLM-L6-v2): learned positions,
  post-LayerNorm, GELU MLP, token-type embeddings, biases everywhere.
* Gemma3 text (google/embeddinggemma-300m): RoPE, RMSNorm (pre+post for
  both attention and MLP), GQA, QK-norm, GeGLU, no biases, embedding
  scaled by sqrt(hidden).
* ModernBERT (lightonai/GTE-ModernColBERT-v1): RoPE with alternating
  local (sliding-window) / global attention, pre-LayerNorm (no bias),
  GeGLU, fused QKV semantics.

Exact hyperparameters for real checkpoints are read from the HF
``config.json`` at load time (models/hf_loader.py); the registry entries
in models/registry.py are defaults/fallbacks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    num_kv_heads: Optional[int] = None  # None -> num_heads (MHA)
    head_dim: Optional[int] = None  # None -> hidden // heads
    mlp_dim: int = 1536
    max_position_embeddings: int = 512

    # Architecture style knobs
    position_type: str = "learned"  # "learned" | "rope" | "none"
    rope_theta: float = 10000.0
    rope_local_theta: Optional[float] = None  # theta for local layers
    sliding_window: int = 0  # 0 = all-global attention
    global_attn_every: int = 1  # layer i is global iff i % this == 0
    # Exact per-layer attention types from a checkpoint's config.json
    # (e.g. Gemma3 "layer_types"); entries containing "sliding" are
    # local. Overrides the modulo rule when set.
    layer_types: Optional[tuple[str, ...]] = None
    causal: bool = False  # encoders are bidirectional; True only for
    # decoder-style checkpoints (plain Gemma3 without
    # use_bidirectional_attention)
    norm_type: str = "layernorm"  # "layernorm" | "rmsnorm"
    norm_eps: float = 1e-12
    pre_norm: bool = False  # False = post-LN (BERT), True = pre-LN
    gemma_norms: bool = False  # extra post-attn / post-mlp norms (Gemma3)
    qk_norm: bool = False
    # ModernBERT: layer 0's attention input norm is Identity in HF.
    skip_first_attn_norm: bool = False
    # Gemma3: attention scale is query_pre_attn_scalar**-0.5, not
    # head_dim**-0.5. None -> head_dim.
    query_scale: Optional[float] = None
    activation: str = "gelu"  # "gelu" | "geglu" | "swiglu" | "relu"
    use_bias: bool = True
    # Per-part overrides (ModernBERT configures attention_bias,
    # mlp_bias, and norm_bias independently); None -> use_bias.
    attention_bias: Optional[bool] = None
    mlp_bias: Optional[bool] = None

    @property
    def attn_bias(self) -> bool:
        return self.use_bias if self.attention_bias is None else self.attention_bias

    @property
    def mlp_bias_flag(self) -> bool:
        return self.use_bias if self.mlp_bias is None else self.mlp_bias
    attn_logit_softcap: float = 0.0
    embedding_scale: bool = False  # multiply embeddings by sqrt(hidden)
    type_vocab_size: int = 0  # >0 -> BERT token-type embeddings
    embedding_norm: bool = True  # LayerNorm after embeddings (BERT/ModernBERT)
    tie_word_embeddings: bool = True

    # Numerics
    dtype: str = "bfloat16"  # compute dtype; params are float32
    # int8 x int8 MXU matmuls for all dense projections (dynamic
    # per-token activation quantization, per-output-channel weights).
    # int8 activations x int8 weights on the MXU (v5e int8 peak is 2x
    # bf16), routed through the fused Pallas kernel
    # (ops/pallas_qdense.py): quant -> int8 dot -> dequant+bias in one
    # VMEM pass. The plain-XLA int8 lowering was REMOVED after
    # measuring as an in-context loss (BENCH_NOTES round-3: per-dot
    # 1.2-2.9x faster isolated, in-funnel 10-25% SLOWER — the quant/
    # dequant epilogues break XLA's matmul fusions); it survives only
    # as the automatic fallback for lane-misaligned shapes the kernel
    # refuses. Mosaic TPU backends only; on CPU the kernel runs
    # interpreted (tests). Attention score/probs einsums stay bf16.
    int8_activations: bool = False
    # Static (calibrated) per-tensor activation scales instead of the
    # kernel's dynamic per-row abs-max. Scales live in the param tree
    # (``*_scale`` scalars) and are filled by an abs-max calibration
    # pass on the first real batch
    # (EncoderRuntime.calibrate_act_static); out-of-range activations
    # saturate at +-127.
    int8_act_static: bool = False
    # bf16 whole-block fused MLP (ops/pallas_qdense.py::fused_mlp_bf16)
    # when int8 activations are OFF: gate/up/act/mul/down in one kernel
    # — the [M, mlp_dim] intermediate stays in VMEM instead of
    # round-tripping HBM, x is read once for gate+up. Slightly MORE
    # precise than the module path (f32 epilogue before the cast);
    # opt-in, tolerance-tested.
    fused_mlp: bool = False
    # Flash attention (JAX's shipped Pallas TPU kernel): the [B,h,L,L]
    # logits/probs never materialize to HBM — the dominant attention
    # traffic at cross-encoder shapes (100 pairs x 256 tokens x 12
    # heads => ~300 MB/layer at f32). Opt-in; applies to layers whose
    # mask is padding-only (no sliding window, no causal, no logit
    # softcap) with lane-aligned seq (L % 128 == 0); other layers keep
    # the dense-bias einsum path. On CPU the mha_reference fallback
    # keeps tests meaningful.
    flash_attention: bool = False
    # Whole-sequence fused attention for SMALL buckets
    # (ops/pallas_attention.py): one (batch, head) block per grid step,
    # the [B,h,L,L] exp tensor never touches HBM. Covers the
    # off-lane-aligned lengths flash cannot (stage-3's 96-token pair
    # bucket, where the exp tensor is the dominant dense-path HBM
    # tensor at 22 MB/layer). Same padding-only mask scope as flash;
    # layers where flash engages (L % 128 == 0 + flash_attention) keep
    # flash. On CPU the kernel runs interpreted (tests).
    fused_attention: bool = False

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @property
    def dims_per_head(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    def is_global_layer(self, layer_idx: int) -> bool:
        if self.layer_types is not None:
            return "sliding" not in self.layer_types[layer_idx]
        if self.sliding_window <= 0:
            return True
        return layer_idx % max(self.global_attn_every, 1) == 0

    def replace(self, **kw) -> "EncoderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class PoolingConfig:
    """Sentence-embedding head: pooling + dense projection stack.

    Matches sentence-transformers module semantics (SURVEY.md §7 "ST
    semantic parity"): e.g. embeddinggemma is mean-pool -> Dense(3072)
    -> Dense(768) -> L2 normalize.
    """

    pooling: str = "mean"  # "mean" | "cls" | "max" | "lasttoken"
    projection_dims: tuple[int, ...] = ()
    # per-layer bias flags (ST Dense defaults to bias=True; PyLate
    # projections typically bias=False); empty = all bias-free
    projection_bias: tuple[bool, ...] = ()
    normalize: bool = True


@dataclasses.dataclass(frozen=True)
class ColBERTConfig:
    """Late-interaction head: linear projection to a small token dim.

    ``project=False`` scores MaxSim on raw last-hidden-state tokens —
    the reference's behavior (src/stage2_rescorer.py:156-165 applies NO
    projection even for checkpoints that ship one). Default True uses
    the checkpoint's intended PyLate ``1_Dense`` projection; the
    divergence is flagged in PARITY.md and toggled by
    ``stage2_use_projection``.
    """

    output_dim: int = 128
    normalize: bool = True
    query_max_len: int = 32
    doc_max_len: int = 192
    project: bool = True
    project_bias: bool = False


@dataclasses.dataclass(frozen=True)
class CrossEncoderConfig:
    """Sequence-classification head over the CLS token."""

    num_labels: int = 1
    pooler_tanh: bool = False  # BERT pooler dense+tanh before classifier
    activation: str = "sigmoid"  # "sigmoid" | "softmax" | "none"
    max_length: int = 256

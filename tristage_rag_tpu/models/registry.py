"""Named model configurations.

The ``tiny-*`` entries are deterministic test models (SURVEY.md §4 —
orchestrator tests run with tiny fake encoders, no downloads). The
full-size entries are fallback hyperparameters for the reference's three
checkpoints; when a real checkpoint directory is given, the HF loader
(models/hf_loader.py) overrides these from its ``config.json``.

Reference model choices: src/stage1_retriever.py:18 (embeddinggemma),
src/stage2_rescorer.py:17 (GTE-ModernColBERT), src/stage3_reranker.py:17
(ms-marco-MiniLM-L6-v2).
"""

from __future__ import annotations

from tristage_rag_tpu.models.config import (
    ColBERTConfig,
    CrossEncoderConfig,
    EncoderConfig,
    PoolingConfig,
)

_TINY = dict(
    vocab_size=1024,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    mlp_dim=128,
    max_position_embeddings=512,
)

# Lane-aligned tiny variants (hidden/attn-N/mlp all % 128): the fused
# Pallas kernels and flash attention only engage at MXU-aligned
# shapes, so pipeline-level CPU tests of the kernel stack use these
# (tests/test_kernel_stack_pipeline.py). Still deterministic
# random-init test models — no downloads.
_TINY_ALIGNED = dict(
    vocab_size=1024,
    hidden_size=128,
    num_layers=2,
    num_heads=2,
    mlp_dim=256,
    max_position_embeddings=512,
)

ENCODER_CONFIGS: dict[str, EncoderConfig] = {
    # --- test models -----------------------------------------------------
    "tiny-bert": EncoderConfig(**_TINY, position_type="learned", type_vocab_size=2),
    # 1-layer distillation student for tiny-bert (train/distill.py).
    "tiny-bert-1l": EncoderConfig(
        **{**_TINY, "num_layers": 1},
        position_type="learned", type_vocab_size=2,
    ),
    "tiny-gemma": EncoderConfig(
        **_TINY,
        position_type="rope",
        norm_type="rmsnorm",
        norm_eps=1e-6,
        pre_norm=True,
        gemma_norms=True,
        qk_norm=True,
        activation="geglu_tanh",
        use_bias=False,
        embedding_scale=True,
        embedding_norm=False,
        num_kv_heads=2,
    ),
    "tiny-modernbert": EncoderConfig(
        **_TINY,
        position_type="rope",
        pre_norm=True,
        activation="geglu",
        use_bias=False,
        sliding_window=8,
        global_attn_every=2,
        rope_local_theta=10000.0,
        rope_theta=160000.0,
        norm_eps=1e-5,
    ),
    "tiny-bert-aligned": EncoderConfig(
        **_TINY_ALIGNED, position_type="learned", type_vocab_size=2,
    ),
    "tiny-gemma-aligned": EncoderConfig(
        **_TINY_ALIGNED,
        position_type="rope",
        norm_type="rmsnorm",
        norm_eps=1e-6,
        pre_norm=True,
        gemma_norms=True,
        qk_norm=True,
        activation="geglu_tanh",
        use_bias=False,
        embedding_scale=True,
        embedding_norm=False,
    ),
    "tiny-modernbert-aligned": EncoderConfig(
        **_TINY_ALIGNED,
        position_type="rope",
        pre_norm=True,
        activation="geglu",
        use_bias=False,
        sliding_window=8,
        global_attn_every=2,
        rope_local_theta=10000.0,
        rope_theta=160000.0,
        norm_eps=1e-5,
    ),
    # --- reference-parity fallbacks (overridden by checkpoint config.json)
    "embeddinggemma-300m": EncoderConfig(
        vocab_size=262144,
        hidden_size=768,
        num_layers=24,
        num_heads=3,
        num_kv_heads=1,
        head_dim=256,
        mlp_dim=1152,
        max_position_embeddings=2048,
        position_type="rope",
        norm_type="rmsnorm",
        norm_eps=1e-6,
        pre_norm=True,
        gemma_norms=True,
        qk_norm=True,
        activation="geglu_tanh",
        use_bias=False,
        embedding_scale=True,
        embedding_norm=False,
        query_scale=256.0,
        # real checkpoint attention layout (config.json of
        # google/embeddinggemma-300m): 5 sliding-window layers per
        # global layer (layers 5/11/17/23 global — Gemma counts
        # (i+1) % pattern, unlike ModernBERT's i % pattern, so the
        # pattern is spelled out), window 512 in the hub file's
        # convention (band |q-k| <= 256), dual rope thetas — kept in
        # the fallback so random-weight runs use the true architecture
        # (tests/test_fullsize_load_parity.py pins this against the
        # checkpoint-derived config)
        sliding_window=512,
        global_attn_every=6,
        layer_types=(
            ("sliding_attention",) * 5 + ("full_attention",)
        ) * 4,
        rope_theta=1_000_000.0,
        rope_local_theta=10_000.0,
    ),
    "gte-moderncolbert": EncoderConfig(
        vocab_size=50368,
        hidden_size=768,
        num_layers=22,
        num_heads=12,
        mlp_dim=1152,
        max_position_embeddings=8192,
        position_type="rope",
        pre_norm=True,
        activation="geglu",
        use_bias=False,
        sliding_window=128,
        global_attn_every=3,
        rope_theta=160000.0,
        rope_local_theta=10000.0,
        norm_eps=1e-5,
        skip_first_attn_norm=True,
    ),
    "minilm-l6-cross": EncoderConfig(
        vocab_size=30522,
        hidden_size=384,
        num_layers=6,
        num_heads=12,
        mlp_dim=1536,
        max_position_embeddings=512,
        position_type="learned",
        type_vocab_size=2,
        norm_eps=1e-12,
    ),
    # 2-layer sibling of the reference reranker (the published
    # ms-marco-MiniLM-L2-v2 layout) — the natural distillation student
    # for stage-3 (train/distill.py, scripts/bench_distill.py).
    "minilm-l2-cross": EncoderConfig(
        vocab_size=30522,
        hidden_size=384,
        num_layers=2,
        num_heads=12,
        mlp_dim=1536,
        max_position_embeddings=512,
        position_type="learned",
        type_vocab_size=2,
        norm_eps=1e-12,
    ),
}

POOLING_CONFIGS: dict[str, PoolingConfig] = {
    "tiny-bert": PoolingConfig(pooling="mean", projection_dims=(32,)),
    "tiny-gemma": PoolingConfig(pooling="mean", projection_dims=(32,)),
    "tiny-gemma-aligned": PoolingConfig(pooling="mean", projection_dims=(32,)),
    # embeddinggemma: mean pool -> Dense(3072) -> Dense(768) -> normalize
    "embeddinggemma-300m": PoolingConfig(
        pooling="mean", projection_dims=(3072, 768)
    ),
}

COLBERT_CONFIGS: dict[str, ColBERTConfig] = {
    "tiny-modernbert": ColBERTConfig(output_dim=32),
    "tiny-modernbert-aligned": ColBERTConfig(output_dim=32),
    "gte-moderncolbert": ColBERTConfig(output_dim=128),
}

CROSS_CONFIGS: dict[str, CrossEncoderConfig] = {
    "tiny-bert": CrossEncoderConfig(num_labels=1, activation="sigmoid"),
    "tiny-bert-aligned": CrossEncoderConfig(num_labels=1, activation="sigmoid"),
    "tiny-bert-1l": CrossEncoderConfig(num_labels=1, activation="sigmoid"),
    # BertForSequenceClassification routes CLS through the tanh pooler.
    "minilm-l6-cross": CrossEncoderConfig(
        num_labels=1, activation="sigmoid", pooler_tanh=True
    ),
    "minilm-l2-cross": CrossEncoderConfig(
        num_labels=1, activation="sigmoid", pooler_tanh=True
    ),
}


def encoder_config(name: str) -> EncoderConfig:
    if name not in ENCODER_CONFIGS:
        raise KeyError(
            f"unknown encoder config {name!r}; known: {sorted(ENCODER_CONFIGS)}"
        )
    return ENCODER_CONFIGS[name]

from tristage_rag_tpu.models.config import (
    ColBERTConfig,
    CrossEncoderConfig,
    EncoderConfig,
    PoolingConfig,
)
from tristage_rag_tpu.models.heads import BiEncoder, ColBERTEncoder, CrossEncoder
from tristage_rag_tpu.models.registry import (
    COLBERT_CONFIGS,
    CROSS_CONFIGS,
    ENCODER_CONFIGS,
    POOLING_CONFIGS,
    encoder_config,
)
from tristage_rag_tpu.models.hf_loader import load_checkpoint
from tristage_rag_tpu.models.runtime import EncoderRuntime
from tristage_rag_tpu.models.tokenizer import (
    HashTokenizer,
    HFTokenizer,
    WordPieceTokenizer,
    load_tokenizer,
)

__all__ = [
    "EncoderConfig",
    "PoolingConfig",
    "ColBERTConfig",
    "CrossEncoderConfig",
    "BiEncoder",
    "ColBERTEncoder",
    "CrossEncoder",
    "EncoderRuntime",
    "HashTokenizer",
    "WordPieceTokenizer",
    "HFTokenizer",
    "load_tokenizer",
    "encoder_config",
    "ENCODER_CONFIGS",
    "POOLING_CONFIGS",
    "COLBERT_CONFIGS",
    "CROSS_CONFIGS",
]

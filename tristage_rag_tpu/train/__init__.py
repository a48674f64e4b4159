from tristage_rag_tpu.train.contrastive import (
    TrainConfig,
    Trainer,
    info_nce_loss,
    make_optimizer,
    make_param_shardings,
)

__all__ = [
    "TrainConfig",
    "Trainer",
    "info_nce_loss",
    "make_optimizer",
    "make_param_shardings",
]

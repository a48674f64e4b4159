from tristage_rag_tpu.train.contrastive import (
    TrainConfig,
    Trainer,
    info_nce_loss,
    make_optimizer,
    make_param_shardings,
)
from tristage_rag_tpu.train.distill import (
    CrossEncoderDistiller,
    DistillConfig,
    init_student_from_teacher,
)

__all__ = [
    "TrainConfig",
    "Trainer",
    "info_nce_loss",
    "make_optimizer",
    "make_param_shardings",
    "CrossEncoderDistiller",
    "DistillConfig",
    "init_student_from_teacher",
]

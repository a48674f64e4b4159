from tristage_rag_tpu.ops.topk import masked_topk
from tristage_rag_tpu.ops.maxsim import maxsim_scores
from tristage_rag_tpu.ops.fusion import reciprocal_rank_fusion, weighted_fusion

__all__ = [
    "masked_topk",
    "maxsim_scores",
    "reciprocal_rank_fusion",
    "weighted_fusion",
]

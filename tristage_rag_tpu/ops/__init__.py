from tristage_rag_tpu.ops.topk import masked_approx_topk, masked_topk
from tristage_rag_tpu.ops.maxsim import maxsim_scores, similarity_matrix
from tristage_rag_tpu.ops.fusion import reciprocal_rank_fusion, weighted_fusion

__all__ = [
    "masked_topk",
    "masked_approx_topk",
    "maxsim_scores",
    "similarity_matrix",
    "reciprocal_rank_fusion",
    "weighted_fusion",
]

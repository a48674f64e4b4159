"""Rank fusion for stage 1 (dense + BM25).

Host-side numpy — fusion operates on two short top-k lists (sparse,
branchy, tiny), the wrong shape for the TPU. Semantics match the
reference:

* RRF: score(d) = sum over systems of 1 / (rrf_k + rank_d), rank is
  1-based (src/stage1_retriever.py:326-343).
* Weighted: MAX-normalise each system's scores (score / max — the
  reference's exact scheme, src/stage1_retriever.py:350-360; NOT
  min-max), then ``dense_w * dense + sparse_w * sparse``. Verified
  against the executed reference in tests/test_reference_parity.py.
  One guard the reference lacks: a zero max contributes 0 instead of
  dividing by zero.
"""

from __future__ import annotations

import numpy as np


def reciprocal_rank_fusion(
    ranked_lists: list[list[int]],
    rrf_k: float = 60.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse ranked id lists with Reciprocal Rank Fusion.

    Args:
      ranked_lists: each a list of doc ids in rank order (best first).
      rrf_k: RRF constant (reference default 60).

    Returns:
      (ids [M] i64, scores [M] f64) sorted by fused score descending.
    """
    fused: dict[int, float] = {}
    for ranked in ranked_lists:
        for rank, doc_id in enumerate(ranked, start=1):
            fused[doc_id] = fused.get(doc_id, 0.0) + 1.0 / (rrf_k + rank)
    if not fused:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ids = np.fromiter(fused.keys(), dtype=np.int64, count=len(fused))
    scores = np.fromiter(fused.values(), dtype=np.float64, count=len(fused))
    order = np.argsort(-scores, kind="stable")
    return ids[order], scores[order]


def _maxnorm(scores: np.ndarray) -> np.ndarray:
    """score / max(score) — reference semantics
    (src/stage1_retriever.py:352-360), guarded against max == 0.

    Bug-for-bug parity caveat: when a list's scores are ALL negative
    (possible for dense cosine on out-of-domain queries), dividing by a
    negative max inverts that list's ordering — exactly as the
    reference does. Prefer fusion_method="rrf" (rank-based, inversion-
    proof) when that regime matters."""
    if scores.size == 0:
        return scores
    mx = float(scores.max())
    if abs(mx) < 1e-12:
        return np.zeros_like(scores)
    return scores / mx


def weighted_fusion(
    dense_ids: np.ndarray,
    dense_scores: np.ndarray,
    sparse_ids: np.ndarray,
    sparse_scores: np.ndarray,
    dense_weight: float = 0.7,
    sparse_weight: float = 0.3,
) -> tuple[np.ndarray, np.ndarray]:
    """Max-normalised weighted score fusion of two result lists."""
    dn = _maxnorm(np.asarray(dense_scores, dtype=np.float64))
    sn = _maxnorm(np.asarray(sparse_scores, dtype=np.float64))
    fused: dict[int, float] = {}
    for doc_id, s in zip(np.asarray(dense_ids).tolist(), dn.tolist()):
        fused[doc_id] = fused.get(doc_id, 0.0) + dense_weight * s
    for doc_id, s in zip(np.asarray(sparse_ids).tolist(), sn.tolist()):
        fused[doc_id] = fused.get(doc_id, 0.0) + sparse_weight * s
    if not fused:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ids = np.fromiter(fused.keys(), dtype=np.int64, count=len(fused))
    scores = np.fromiter(fused.values(), dtype=np.float64, count=len(fused))
    order = np.argsort(-scores, kind="stable")
    return ids[order], scores[order]

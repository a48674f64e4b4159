"""The single orchestrator serving every front-end.

Rebuild of src/retrieval_pipeline.py with one deliberate change: the
reference has TWO orchestrators (RetrievalPipeline and the standalone
app's ThreeStageRetrievalSystem, non_mcp/main.py:244-339 — duplication
noted in SURVEY.md §1); here there is exactly one, and the CLI / web UI
/ MCP server / eval harness all use it.

Parity surface: lazy stage init, funnel stage1_top_k -> stage2_top_k ->
stage3_top_k -> final [:top_k], early-return on empty stage output,
per-stage wall-clock timing with running averages + last-100 history,
``save_intermediate_results``, index save/load, ``get_pipeline_info``,
``export_config`` (src/retrieval_pipeline.py:323-634).
"""

from __future__ import annotations

import logging
import threading
import time
from pathlib import Path
from typing import Any, Optional, Sequence

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.stage1 import Stage1Retriever
from tristage_rag_tpu.engine.stage2 import ColBERTScorer
from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker
from tristage_rag_tpu.parallel.mesh import (
    create_hybrid_mesh,
    create_mesh,
    mesh_info,
)
from tristage_rag_tpu.utils.profiling import StageTimer

logger = logging.getLogger(__name__)

_HISTORY_LIMIT = 100


class RetrievalPipeline:
    def __init__(
        self,
        config: Optional[PipelineConfig | str | Path] = None,
        lazy_init: bool = True,
    ):
        if config is None:
            config = PipelineConfig()
        elif isinstance(config, (str, Path)):
            config = PipelineConfig.from_yaml(config)
        self.config = config
        self._setup_logging()
        if getattr(config, "compilation_cache_dir", None):
            from tristage_rag_tpu.utils.compilecache import (
                enable_compilation_cache,
            )

            enable_compilation_cache(config.compilation_cache_dir)
        if getattr(config, "mesh_dcn_parallel", 1) > 1:
            self.mesh = create_hybrid_mesh(
                config.mesh_dcn_parallel, config.mesh_data_parallel
            )
        else:
            self.mesh = create_mesh(config.mesh_data_parallel)
        self.stage1: Optional[Stage1Retriever] = None
        self.stage2: Optional[ColBERTScorer] = None
        self.stage3: Optional[CrossEncoderReranker] = None
        self._fused = None  # FusedSearcher (engine/fused.py), built lazily
        self._fused_failures = 0  # consecutive; breaker at _FUSED_FAILURE_LIMIT
        self.performance_stats: dict[str, Any] = {
            "total_queries": 0,
            "avg_stage1_time": 0.0,
            "avg_stage2_time": 0.0,
            "avg_stage3_time": 0.0,
            "avg_total_time": 0.0,
            "search_history": [],
        }
        self.stage_timer = StageTimer()
        # Serving result cache (enable_result_cache): the fused path
        # encodes the query INSIDE its single XLA dispatch, so an
        # embedding-level cache cannot skip any device work there
        # (splitting the program would ADD a host round-trip) — the
        # serving win for repeated queries is caching the RESULT.
        # Invalidated on any index mutation. Measured under a Zipf
        # query mix in scripts/bench_mcp.py --zipf.
        from collections import OrderedDict

        self._result_cache: "OrderedDict[tuple, dict]" = OrderedDict()
        self.result_cache_stats = {"hits": 0, "misses": 0}
        # Two-phase serving (batch_search_dispatch): the fetch closure
        # runs on a separate thread, so the host-side shared state it
        # touches (result cache, performance stats) is lock-guarded,
        # and cache inserts are epoch-guarded — a mutation that lands
        # between dispatch and fetch bumps the epoch, voiding the
        # in-flight batch's right to seed the cache.
        self._index_epoch = 0
        self._serve_lock = threading.Lock()
        # warmup() and bench warmups set this so their throwaway
        # queries neither collapse the batch shapes they exist to
        # compile nor seed the cache with entries that would turn the
        # measured window into cache hits
        self._cache_bypass = False
        if not lazy_init:
            self.initialize_stages()

    def _setup_logging(self) -> None:
        level = getattr(logging, str(self.config.log_level).upper(), logging.INFO)
        logging.getLogger("tristage_rag_tpu").setLevel(level)
        if self.config.log_file:
            handler = logging.FileHandler(self.config.log_file)
            handler.setFormatter(
                logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
            )
            logging.getLogger("tristage_rag_tpu").addHandler(handler)

    def initialize_stages(self) -> None:
        if self.stage1 is None:
            self.stage1 = Stage1Retriever(self.config, mesh=self.mesh)
        if self.stage2 is None:
            self.stage2 = ColBERTScorer(self.config, mesh=self.mesh)
        if self.stage3 is None:
            self.stage3 = CrossEncoderReranker(self.config, mesh=self.mesh)
        if (
            self._fused is None
            and self.config.enable_fused_search
            and self.config.stage2_cache_doc_embeddings
        ):
            # with a mesh, the fused funnel shard-maps over it (sharded
            # index + sharded stage-2/3 caches; engine/fused.py
            # _build_fn_sharded) — single-device and multi-chip both
            # serve through ONE XLA program per query
            from tristage_rag_tpu.engine.fused import FusedSearcher

            self._fused = FusedSearcher(
                self.config, self.stage1, self.stage2, self.stage3
            )

    # ---- indexing --------------------------------------------------------

    def add_documents(
        self,
        documents: Sequence[str],
        metadata: Optional[Sequence[dict[str, Any]]] = None,
    ) -> dict[str, Any]:
        if self.stage1 is None:
            self.initialize_stages()
        self._invalidate_result_cache()
        t0 = time.time()
        start_id = len(self.stage1.documents)
        n = self.stage1.add_documents(documents, metadata)
        if n and self.config.stage2_cache_doc_embeddings and self.stage2:
            # Precompute stage-2 token embeddings at indexing time so
            # queries skip candidate re-encoding entirely.
            self.stage2.precompute(
                range(start_id, start_id + n), list(documents)[:n]
            )
        if n and self._fused is not None:
            # stage-3 doc token ids, for the single-dispatch fused path
            self._fused.precompute(
                range(start_id, start_id + n), list(documents)[:n]
            )
        return {
            "documents_added": n,
            "total_documents": len(self.stage1.documents),
            "indexing_time": time.time() - t0,
        }

    # ---- result cache ----------------------------------------------------

    def _cache_get(self, query: str, top_k: int) -> Optional[dict[str, Any]]:
        if not self.config.enable_result_cache or self._cache_bypass:
            return None
        import copy

        with self._serve_lock:
            hit = self._result_cache.get((query, top_k))
            if hit is None:
                self.result_cache_stats["misses"] += 1
                return None
            self._result_cache.move_to_end((query, top_k))
            self.result_cache_stats["hits"] += 1
            out = copy.deepcopy(hit)
            out["performance_stats"] = dict(self.performance_stats)
        out["timing"] = dict(out.get("timing") or {})
        out["timing"]["cached"] = True
        return out

    def _cache_put(
        self,
        query: str,
        top_k: int,
        resp: dict[str, Any],
        epoch: Optional[int] = None,
    ) -> None:
        """``epoch`` (two-phase serving): the _index_epoch snapshotted
        at dispatch. If a mutation landed between dispatch and this
        fetch-thread insert, the entry reflects a superseded index and
        is dropped — checked under the lock so the bump-and-clear in
        _invalidate_result_cache cannot interleave."""
        if (
            not self.config.enable_result_cache
            or self._cache_bypass
            or not resp.get("results")
        ):
            return
        import copy

        # Intermediates are debug data and can hold stage1_top_k full
        # documents per entry — storing them would blow the host cache
        # up to GBs under save_intermediate_results; hits return them
        # empty.
        entry = copy.deepcopy({
            k: ([] if k in ("stage1_results", "stage2_results") else v)
            for k, v in resp.items() if k != "performance_stats"
        })
        with self._serve_lock:
            if epoch is not None and epoch != self._index_epoch:
                return
            self._result_cache[(query, top_k)] = entry
            while len(self._result_cache) > self.config.result_cache_size:
                self._result_cache.popitem(last=False)

    def _invalidate_result_cache(self) -> None:
        with self._serve_lock:
            self._index_epoch += 1
            if self._result_cache:
                self._result_cache.clear()

    # ---- search ----------------------------------------------------------

    def _empty_response(self, query: str, timing: dict) -> dict[str, Any]:
        return {
            "query": query,
            "results": [],
            "stage1_results": [],
            "stage2_results": [],
            "timing": timing,
            "performance_stats": dict(self.performance_stats),
        }

    def search(self, query: str, top_k: Optional[int] = None) -> dict[str, Any]:
        if self.stage1 is None or self.stage2 is None or self.stage3 is None:
            self.initialize_stages()
        top_k = top_k or self.config.stage3_top_k
        cached = self._cache_get(query, top_k)
        if cached is not None:
            return cached
        if self._fused is not None and self._fused.ready():
            try:
                out = self._fused.search(query, top_k)
                self._fused_failures = 0
                if self.config.enable_timing:
                    self._update_performance_stats(query, out["timing"])
                out["performance_stats"] = dict(self.performance_stats)
                self._cache_put(query, top_k, out)
                return out
            except Exception:
                logger.exception(
                    "fused search failed; falling back to the staged path"
                )
                self._note_fused_failure()
        timing: dict[str, Optional[float]] = {
            "stage1_time": None,
            "stage2_time": None,
            "stage3_time": None,
            "total_time": None,
        }
        total_start = time.time()

        t = time.time()
        stage1_results = self.stage1.search(query, self.config.stage1_top_k)
        timing["stage1_time"] = time.time() - t
        if not stage1_results:
            timing["total_time"] = time.time() - total_start
            return self._empty_response(query, timing)

        t = time.time()
        stage2_results = self.stage2.rescore_candidates(query, stage1_results)
        timing["stage2_time"] = time.time() - t
        if not stage2_results:
            timing["total_time"] = time.time() - total_start
            out = self._empty_response(query, timing)
            out["stage1_results"] = (
                stage1_results if self.config.save_intermediate_results else []
            )
            return out

        t = time.time()
        final_results = self.stage3.rerank(query, stage2_results)
        timing["stage3_time"] = time.time() - t
        final_results = final_results[:top_k]
        timing["total_time"] = time.time() - total_start

        if self.config.enable_timing:
            self._update_performance_stats(query, timing)

        keep = self.config.save_intermediate_results
        resp = {
            "query": query,
            "results": final_results,
            "stage1_results": stage1_results if keep else [],
            "stage2_results": stage2_results if keep else [],
            "timing": timing,
            "performance_stats": dict(self.performance_stats),
        }
        self._cache_put(query, top_k, resp)
        return resp

    def batch_search(
        self, queries: Sequence[str], top_k: Optional[int] = None
    ) -> list[dict[str, Any]]:
        """Batched search: stage 1 runs ONE fused encode+top-k for the
        whole batch (vs the reference's sequential loop,
        src/retrieval_pipeline.py:426-448); stages 2/3 then refine per
        query. Output shape matches ``search`` per query."""
        if self.stage1 is None or self.stage2 is None or self.stage3 is None:
            self.initialize_stages()
        if not queries:
            return []
        top_k = top_k or self.config.stage3_top_k
        if self.config.enable_result_cache:
            import copy

            resolved: list = [self._cache_get(q, top_k) for q in queries]
            miss_idx = [i for i, r in enumerate(resolved) if r is None]
            if not miss_idx:
                return resolved
            # dedupe repeated misses within the batch: each distinct
            # query runs once through the funnel
            uniq: dict[str, list[int]] = {}
            for i in miss_idx:
                uniq.setdefault(queries[i], []).append(i)
            miss_out = self._batch_search_uncached(list(uniq), top_k)
            for q, resp in zip(uniq, miss_out):
                self._cache_put(q, top_k, resp)
                idxs = uniq[q]
                resolved[idxs[0]] = resp
                for j in idxs[1:]:
                    resolved[j] = copy.deepcopy(resp)
            return resolved
        return self._batch_search_uncached(list(queries), top_k)

    def _batch_search_uncached(
        self, queries: Sequence[str], top_k: int
    ) -> list[dict[str, Any]]:
        if self._fused is not None and self._fused.ready():
            try:
                out = self._fused.search_batch(queries, top_k)
                self._fused_failures = 0
                for q, resp in zip(queries, out):
                    if self.config.enable_timing:
                        self._update_performance_stats(q, resp["timing"])
                    resp["performance_stats"] = dict(self.performance_stats)
                return out
            except Exception:
                logger.exception(
                    "fused batch search failed; falling back to staged path"
                )
                self._note_fused_failure()
        n = len(queries)

        t = time.time()
        s1_batches = self.stage1.search_batch(queries, self.config.stage1_top_k)
        stage1_time = (time.time() - t) / n
        t = time.time()
        s2_batches = self.stage2.rescore_batch(list(queries), s1_batches)
        stage2_time = (time.time() - t) / n
        t = time.time()
        s3_batches = self.stage3.batch_rerank(list(queries), s2_batches)
        stage3_time = (time.time() - t) / n

        out = []
        keep = self.config.save_intermediate_results
        for query, s1, s2, s3 in zip(queries, s1_batches, s2_batches, s3_batches):
            timing = {
                "stage1_time": stage1_time,
                "stage2_time": stage2_time if s1 else None,
                "stage3_time": stage3_time if s2 else None,
                "total_time": stage1_time
                + (stage2_time if s1 else 0.0)
                + (stage3_time if s2 else 0.0),
            }
            if not s1 or not s2:
                resp = self._empty_response(query, timing)
                if keep:
                    resp["stage1_results"] = s1
                    resp["stage2_results"] = s2
                out.append(resp)
                continue
            if self.config.enable_timing:
                self._update_performance_stats(query, timing)
            out.append(
                {
                    "query": query,
                    "results": s3[:top_k],
                    "stage1_results": s1 if keep else [],
                    "stage2_results": s2 if keep else [],
                    "timing": timing,
                    "performance_stats": dict(self.performance_stats),
                }
            )
        return out

    def batch_search_dispatch(
        self, queries: Sequence[str], top_k: Optional[int] = None
    ):
        """Two-phase batched search for pipelined serving.

        Phase 1 (this call, on the serving worker thread) resolves
        result-cache hits, dedupes repeats, and fires the fused path's
        single device dispatch, returning immediately — the relay acks
        dispatches before the device finishes. The returned closure is
        phase 2: the blocking device->host fetch plus host formatting,
        safe to run on a dedicated fetch thread so the NEXT micro-
        batch's host prep and dispatch overlap this batch's device time
        and fetch round-trip (~30 ms over the tunnel).

        Semantics: results reflect the index as of dispatch. A mutation
        landing between dispatch and fetch voids this batch's right to
        seed the result cache (epoch guard in _cache_put) but the
        in-flight results still return. When the fused path is
        unavailable (or its dispatch fails) the whole search runs
        inline in phase 1 and the closure just hands back the result —
        callers need no second code path.
        """
        if self.stage1 is None or self.stage2 is None or self.stage3 is None:
            self.initialize_stages()
        if not queries:
            return lambda: []
        queries = list(queries)
        top_k = top_k or self.config.stage3_top_k
        if self._fused is None or not self._fused.ready():
            out = self.batch_search(queries, top_k)
            return lambda: out

        import copy

        resolved: list = [None] * len(queries)
        uniq: dict[str, list[int]] = {}
        if self.config.enable_result_cache:
            for i, q in enumerate(queries):
                hit = self._cache_get(q, top_k)
                if hit is None:
                    uniq.setdefault(q, []).append(i)
                else:
                    resolved[i] = hit
        else:
            for i, q in enumerate(queries):
                uniq.setdefault(q, []).append(i)
        if not uniq:
            return lambda: resolved
        miss_queries = list(uniq)
        epoch = self._index_epoch
        try:
            fused_finalize = self._fused.search_batch_dispatch(
                miss_queries, top_k
            )
        except Exception:
            logger.exception(
                "fused dispatch failed; falling back to staged path"
            )
            self._note_fused_failure()
            out = self.batch_search(queries, top_k)
            return lambda: out

        def finalize() -> list[dict[str, Any]]:
            try:
                miss_out = fused_finalize()
                self._fused_failures = 0
            except Exception:
                if self._index_epoch != epoch:
                    # A mutation raced the in-flight fetch (clear_index
                    # empties the doc store the formatter reads) — not
                    # a fused-program failure; re-run on the new index.
                    logger.warning(
                        "in-flight fused batch voided by an index "
                        "mutation; re-running"
                    )
                else:
                    logger.exception(
                        "fused fetch failed; falling back to staged path"
                    )
                    self._note_fused_failure()
                # Rare-path caveat: this retry runs on the fetch thread
                # and may overlap the worker thread's next dispatch;
                # searches mutate no index state (cache/stats are
                # lock-guarded), so the overlap is safe.
                return self.batch_search(queries, top_k)
            for q, resp in zip(miss_queries, miss_out):
                if self.config.enable_timing:
                    self._update_performance_stats(q, resp["timing"])
                resp["performance_stats"] = dict(self.performance_stats)
                self._cache_put(q, top_k, resp, epoch=epoch)
                idxs = uniq[q]
                resolved[idxs[0]] = resp
                for j in idxs[1:]:
                    resolved[j] = copy.deepcopy(resp)
            return resolved

        return finalize

    _FUSED_FAILURE_LIMIT = 3

    def _note_fused_failure(self) -> None:
        """Circuit breaker: a deterministically failing fused program
        must not pay a failed dispatch + traceback on EVERY query —
        after a few consecutive failures the staged path takes over for
        the rest of the session."""
        self._fused_failures += 1
        if self._fused_failures >= self._FUSED_FAILURE_LIMIT:
            logger.error(
                "fused search disabled after %d consecutive failures; "
                "serving via the staged path", self._fused_failures,
            )
            self._fused = None

    def _update_performance_stats(self, query: str, timing: dict) -> None:
        with self._serve_lock:
            s = self.performance_stats
            n = s["total_queries"]
            for key in ("stage1_time", "stage2_time", "stage3_time", "total_time"):
                t = timing.get(key) or 0.0
                avg_key = f"avg_{key}"
                s[avg_key] = (s[avg_key] * n + t) / (n + 1)
                self.stage_timer.record(key.replace("_time", ""), t)
            s["total_queries"] = n + 1
            s["search_history"].append(
                {"query": query[:200], "timestamp": time.time(), **timing}
            )
            if len(s["search_history"]) > _HISTORY_LIMIT:
                s["search_history"] = s["search_history"][-_HISTORY_LIMIT:]

    # ---- persistence -----------------------------------------------------

    def save_index(self, index_dir: Optional[str] = None) -> None:
        if self.stage1 is None:
            raise ValueError("pipeline not initialized")
        self.stage1.save_index(index_dir)
        if getattr(self.config, "persist_device_caches", False):
            self._save_device_caches(index_dir)

    def _cache_paths(self, index_dir: Optional[str]):
        import json
        from pathlib import Path

        root = Path(index_dir or self.config.index_dir)
        return (
            root / "stage2_cache.npz",
            root / "stage3_tokens.npz",
            root / "device_caches.json",
            json,
        )

    def _corpus_sha(self) -> str:
        """Fingerprint of the doc store: row ids double as cache keys,
        so persisted caches are only valid for the exact corpus that
        filled them — a same-count different-content corpus must refill
        (the doc-count check alone cannot tell them apart)."""
        import hashlib

        h = hashlib.sha256()
        for d in self.stage1.documents:
            h.update(d.encode())
            h.update(b"\x00")
        return h.hexdigest()

    def _save_device_caches(self, index_dir: Optional[str]) -> None:
        """Persist the stage-2 token-embedding cache and the stage-3
        token-id cache next to the index, so load_index can skip the
        corpus re-encode (the dominant restart cost — SURVEY §5.4's
        checkpoint/resume surface extended to the device caches)."""
        s2_path, s3_path, meta_path, json = self._cache_paths(index_dir)
        meta = {
            "stage2_model": self.config.stage2_model,
            "stage3_model": self.config.stage3_model,
            "docs": len(self.stage1.documents),
            "corpus_sha": self._corpus_sha(),
            # The stage-2 cache holds ENCODER OUTPUTS: embeddings
            # written under one weight/activation quant mode must not
            # serve a pipeline configured with another. (Stage-3's
            # cache is token IDS — tokenizer-only, no such key.)
            "stage2_encode_mode": [
                str(getattr(self.config, "stage2_weights_int8", False)),
                str(getattr(self.config, "stage2_act_int8", False)),
            ],
        }
        wrote = False
        cache = getattr(self.stage2, "_cache", None) if self.stage2 else None
        if cache is not None and cache.size:
            cache.save(s2_path)
            wrote = True
        if self._fused is not None and self._fused.doc_tokens.size:
            self._fused.doc_tokens.save(s3_path)
            wrote = True
        if wrote:
            meta_path.write_text(json.dumps(meta))

    def _load_device_caches(self, index_dir: Optional[str]) -> tuple[bool, bool]:
        """(stage2_loaded, stage3_loaded) — False on any mismatch, and
        the caller refills from the doc store exactly as before."""
        s2_path, s3_path, meta_path, json = self._cache_paths(index_dir)
        if not meta_path.exists():
            return False, False
        try:
            meta = json.loads(meta_path.read_text())
        except Exception:
            return False, False
        if (
            meta.get("stage2_model") != self.config.stage2_model
            or meta.get("stage3_model") != self.config.stage3_model
            or meta.get("docs") != len(self.stage1.documents)
            or meta.get("corpus_sha") != self._corpus_sha()
            or meta.get("stage2_encode_mode", ["False", "False"]) != [
                str(getattr(self.config, "stage2_weights_int8", False)),
                str(getattr(self.config, "stage2_act_int8", False)),
            ]
        ):
            return False, False
        n = len(self.stage1.documents)
        s2_ok = s3_ok = False
        cache = getattr(self.stage2, "_cache", None) if self.stage2 else None
        if cache is not None and s2_path.exists():
            s2_ok = cache.load(s2_path) and cache.covers(range(n))
            if not s2_ok:
                cache.clear()
        if self._fused is not None and s3_path.exists():
            s3_ok = (
                self._fused.doc_tokens.load(s3_path)
                and self._fused.doc_tokens.covers_count(n)
            )
            if not s3_ok:
                self._fused.doc_tokens.clear()
        return s2_ok, s3_ok

    def load_index(self, index_dir: Optional[str] = None) -> bool:
        if self.stage1 is None:
            self.initialize_stages()
        ok = self.stage1.load_index(index_dir)
        if ok:
            self._invalidate_result_cache()
        if ok and self.stage1.documents:
            # Repopulate the device caches the fused path depends on.
            # With persist_device_caches the saved buffers restore
            # directly (skipping the corpus re-encode); otherwise the
            # doc store is the source of truth. Clear first: the loaded
            # corpus reuses row ids 0..n-1, and precompute skips ids
            # already present — stale entries from a previously indexed
            # corpus would otherwise silently serve wrong embeddings.
            docs = self.stage1.documents
            s2_loaded = s3_loaded = False
            if getattr(self.config, "persist_device_caches", False):
                s2_loaded, s3_loaded = self._load_device_caches(index_dir)
            if (
                self.config.stage2_cache_doc_embeddings
                and self.stage2
                and not s2_loaded
            ):
                self.stage2.clear_cache()
                self.stage2.precompute(range(len(docs)), docs)
            if self._fused is not None and not s3_loaded:
                self._fused.doc_tokens.clear()
                self._fused.precompute(range(len(docs)), docs)
        return ok

    def delete_documents(self, doc_ids) -> dict[str, Any]:
        """Tombstone documents by id (stage-1 dense + BM25 exclusion)."""
        if self.stage1 is None:
            self.initialize_stages()
        self._invalidate_result_cache()
        n = self.stage1.delete_documents(doc_ids)
        return {
            "documents_deleted": n,
            "live_documents": (
                self.stage1.index.live_count if self.stage1.index else 0
            ),
        }

    def clear_index(self) -> None:
        self._invalidate_result_cache()
        if self.stage1 is not None:
            self.stage1.clear()
        if self.stage2 is not None:
            self.stage2.clear_cache()
        if self._fused is not None:
            self._fused.doc_tokens.clear()

    # ---- introspection ---------------------------------------------------

    def get_pipeline_info(self) -> dict[str, Any]:
        info = {
            "config": self.config.as_dict(),
            "initialized": self.stage1 is not None,
            "device": mesh_info(self.mesh),
            "performance_stats": dict(self.performance_stats),
            "latency_percentiles": self.stage_timer.summary(),
            "result_cache": {
                "enabled": self.config.enable_result_cache,
                "entries": len(self._result_cache),
                **self.result_cache_stats,
            },
        }
        if self.stage1 is not None:
            info["stage1"] = self.stage1.get_stats()
        if self.stage2 is not None:
            info["stage2"] = self.stage2.get_model_info()
        if self.stage3 is not None:
            info["stage3"] = self.stage3.get_model_info()
        if self.stage1 is not None:
            info["weights_loaded"] = self.all_weights_loaded()
        info["fused_search"] = {
            "enabled": self.config.enable_fused_search,
            "active": self._fused is not None and self._fused.ready(),
            "doc_tokens_cached": (
                self._fused.doc_tokens.size if self._fused else 0
            ),
        }
        return info

    def all_weights_loaded(self) -> bool:
        """True only when EVERY initialized stage serves real checkpoint
        weights — quality numbers from random-init stages are
        meaningless and must be flagged (VERDICT r1 weak-3)."""
        stages = [s for s in (self.stage1, self.stage2, self.stage3) if s]
        if not stages:
            return False
        return all(
            getattr(s.runtime, "weights_loaded", False) for s in stages
        )

    def profile_search(
        self, query: str, log_dir: str = "/tmp/tristage_trace",
        top_k: Optional[int] = None,
    ) -> dict[str, Any]:
        """Run one search under a jax.profiler trace (SURVEY.md §5.1 —
        the reference has wall-clock timing only). The returned dict
        includes the trace directory for TensorBoard/Perfetto."""
        from tristage_rag_tpu.utils.profiling import trace

        with trace(log_dir):
            out = self.search(query, top_k)
        out["trace_dir"] = log_dir
        return out

    def warmup(self) -> bool:
        """Trigger the search-path compiles (fused single-query AND
        small-batch programs, or the staged stages) with throwaway
        queries so the first real requests don't pay XLA compilation
        latency. Larger batch buckets still compile on first use — the
        bucket set is open-ended. No-op on an empty index. Returns True
        if a warmup search ran."""
        if self.stage1 is None:
            self.initialize_stages()
        if self.stage1.index is None or not self.stage1.documents:
            return False
        timing_was = self.config.enable_timing
        self.config.enable_timing = False  # keep stats clean
        self._cache_bypass = True  # preserve batch shapes; don't seed
        try:
            q = self.stage1.documents[0][:64] or "warmup"
            self.search(q, top_k=1)
            # bucket-2 batch: the common micro-batch coalesce size
            self.batch_search([q, q], top_k=1)
        finally:
            self.config.enable_timing = timing_was
            self._cache_bypass = False
        return True

    def get_document_count(self) -> int:
        return len(self.stage1.documents) if self.stage1 else 0

    def export_config(self, path: str | Path) -> None:
        self.config.export(path)

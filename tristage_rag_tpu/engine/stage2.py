"""Stage 2 — ColBERT-style late-interaction rescoring.

TPU-native rebuild of src/stage2_rescorer.py: one batched masked MaxSim
einsum over all candidates (ops/maxsim.py) replaces the reference's
per-candidate Python loop (:268-291). Candidate counts are padded to
buckets so XLA compiles a bounded shape set (SURVEY.md §7).

Default behavior re-encodes candidates per query for parity with the
reference (:259); the TPU-native win is the optional persistent doc
token-embedding cache (``stage2_cache_doc_embeddings``).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.factory import encoder_perf_overrides, build_runtime
from tristage_rag_tpu.ops.maxsim import maxsim_scores, similarity_matrix

logger = logging.getLogger(__name__)

_CAND_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)


def _cand_bucket(n: int) -> int:
    for b in _CAND_BUCKETS:
        if b >= n:
            return b
    return n


class ColBERTScorer:
    def __init__(self, config: PipelineConfig, mesh: Optional[Mesh] = None):
        self.config = config
        self.mesh = mesh
        self.runtime, self.tokenizer = build_runtime(
            "colbert",
            config.stage2_model,
            config.model_dir,
            compute_dtype=config.compute_dtype,
            mesh=mesh,
            seed=config.seed + 1,
            head_overrides=(
                None if config.stage2_use_projection else {"project": False}
            ),
            encoder_overrides=encoder_perf_overrides(config, "stage2"),
            # weight-int8 must quantize from the original f32 kernels,
            # not bf16-pre-cast ones (stacked rounding)
            precast_kernels=not getattr(
                config, "stage2_weights_int8", False
            ),
        )
        if getattr(config, "stage2_weights_int8", False):
            n = self.runtime.quantize_weights_int8()
            logger.info("stage2 weights quantized to int8 (%d kernels)", n)
        # Token-embedding dim: the projection's output, or the raw
        # hidden size in reference-faithful no-projection mode.
        self.token_dim = (
            self.runtime.head_cfg.output_dim
            if self.runtime.head_cfg.project
            else self.runtime.cfg.hidden_size
        )
        # Device-resident token-embedding cache keyed by doc_id (HBM;
        # per-query host traffic = the candidate id list only).
        self._cache = None
        if config.stage2_cache_doc_embeddings:
            from tristage_rag_tpu.index.token_cache import (
                DeviceTokenCache, TieredTokenCache,
            )

            hot = int(getattr(config, "stage2_cache_hot_window", 0) or 0)
            if hot:
                if mesh is not None:
                    # The sharded funnel row-shards the FLAT cache over
                    # the mesh (capacity already scales with devices);
                    # the tiered form targets the one-chip envelope.
                    raise ValueError(
                        "stage2_cache_hot_window is single-device only "
                        "— on a mesh, cache capacity scales by row-"
                        "sharding the flat cache instead"
                    )
                if not 0 < hot < config.stage2_max_seq_length:
                    raise ValueError(
                        f"stage2_cache_hot_window={hot} must be in "
                        f"(0, stage2_max_seq_length="
                        f"{config.stage2_max_seq_length})"
                    )
                self._cache = TieredTokenCache(
                    seq_len=config.stage2_max_seq_length,
                    dim=self.token_dim,
                    hot_len=hot,
                    max_docs=config.stage2_cache_max_docs,
                    quantize=config.stage2_cache_int8,
                )
            else:
                self._cache = DeviceTokenCache(
                    seq_len=config.stage2_max_seq_length,
                    dim=self.token_dim,
                    max_docs=config.stage2_cache_max_docs,
                    quantize=config.stage2_cache_int8,
                    mesh=mesh,
                )

    def encode_query(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        """([Lq, D] token embeddings, [Lq] mask) — un-padded semantics
        live in the mask (reference un-pads eagerly, :134-165)."""
        max_len = min(
            self.runtime.head_cfg.query_max_len, self.config.stage2_max_seq_length
        )
        emb, mask = self.runtime.encode_token_embeddings(
            [query], self.tokenizer, max_length=max_len, batch_size=1
        )
        return emb[0], mask[0]

    def encode_documents(
        self, documents: Sequence[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        """([N, Ld, D], [N, Ld]) padded token embeddings + masks."""
        return self.runtime.encode_token_embeddings(
            list(documents),
            self.tokenizer,
            max_length=self.config.stage2_max_seq_length,
            batch_size=self.config.stage2_batch_size,
        )

    def _candidate_embeddings(self, candidates: list[dict[str, Any]], bucket: int):
        """([bucket, Ld, D], [bucket, Ld]) token embeddings + masks,
        padded to ``bucket`` candidates. Device arrays when the device
        cache serves the request; numpy otherwise."""
        if self._cache is None or any(
            c["doc_id"] >= self._cache.max_docs for c in candidates
        ):
            # cap check BEFORE encoding: if any candidate can't fit the
            # cache, add() would refuse the whole batch and the encode
            # work would be thrown away, doubling stage-2 cost
            d_emb, d_mask = self.encode_documents(
                [c["document"] for c in candidates]
            )
            n = d_emb.shape[0]
            if bucket > n:
                pad = bucket - n
                d_emb = np.concatenate(
                    [d_emb, np.zeros((pad,) + d_emb.shape[1:], d_emb.dtype)]
                )
                d_mask = np.concatenate(
                    [d_mask, np.zeros((pad, d_mask.shape[1]), d_mask.dtype)]
                )
            return d_emb, d_mask
        missing = [c for c in candidates if c["doc_id"] not in self._cache]
        if missing:
            emb, mask = self.encode_documents([c["document"] for c in missing])
            self._cache.add([c["doc_id"] for c in missing], emb, mask)
        ids = [c["doc_id"] for c in candidates]
        if not self._cache.covers(ids):
            # over the HBM cap — re-encode this candidate set host-side
            saved, self._cache = self._cache, None
            try:
                return self._candidate_embeddings(candidates, bucket)
            finally:
                self._cache = saved
        ids += [-1] * (bucket - len(ids))
        return self._cache.gather(ids)

    def precompute(self, doc_ids, documents: Sequence[str]) -> int:
        """Populate the device token-embedding cache at indexing time —
        the TPU-native win over the reference's per-query re-encode of
        every candidate (SURVEY.md §7 "stage-2 doc token embeddings").
        """
        if self._cache is None:
            return 0
        fresh = [
            (int(i), d) for i, d in zip(doc_ids, documents)
            if int(i) not in self._cache
        ]
        if not fresh:
            return 0
        # Device-to-device fill: each forward's output scatters straight
        # into the HBM cache (no per-batch host fetch + re-upload — on
        # tunneled TPUs that round-trip costs more than the forward).
        # Over-cap corpora: drop uncacheable ids BEFORE batching — add()
        # refuses a whole batch when any id exceeds max_docs, so a mixed
        # boundary batch would silently lose its cacheable docs (those
        # queries would then re-encode host-side every search).
        fresh = [(i, d) for i, d in fresh if i < self._cache.max_docs]
        if not fresh:
            return 0
        ids = [i for i, _ in fresh]
        docs = [d for _, d in fresh]
        bs = self.config.stage2_batch_size
        # One capacity reservation for the whole fill: growth inside the
        # loop would re-key the scatter jit per doubling (remote XLA
        # compiles mid-fill) and pay eager growth copies.
        self._cache.reserve(max(ids))
        stored = 0
        batches = self.runtime.token_embedding_batches(
            docs, self.tokenizer,
            max_length=self.config.stage2_max_seq_length, batch_size=bs,
        )
        for j, (emb, mask) in zip(range(0, len(docs), bs), batches):
            stored += self._cache.add(ids[j : j + bs], emb, mask)
        return stored

    def _maxsim(self, q_emb, q_mask, d_emb, d_mask):
        """One query's MaxSim scores, routed by ``stage2_maxsim_impl``:
        "xla" (default) materializes the [C, Lq, Ld] similarity tensor
        in HBM; "pallas" streams candidate blocks through VMEM and the
        similarities never leave the chip (ops/pallas_maxsim.py — the
        win grows with candidate count and token lengths). Both paths
        re-normalize at score time (identical semantics)."""
        method = self.config.stage2_scoring_method
        if (
            getattr(self.config, "stage2_maxsim_impl", "xla") == "pallas"
            and self.mesh is None
            # a mesh-sharded token-cache gather cannot feed a plain
            # pallas_call on real multi-device hardware (no shard_map
            # here) — keep the XLA path, which shards fine
        ):
            import jax

            from tristage_rag_tpu.ops.pallas_maxsim import fused_maxsim

            return fused_maxsim(
                jnp.asarray(q_emb), jnp.asarray(q_mask),
                jnp.asarray(d_emb), jnp.asarray(d_mask),
                method=method, normalize=True,
                interpret=jax.default_backend() == "cpu",
            )
        return maxsim_scores(q_emb, q_mask, d_emb, d_mask, method=method)

    def rescore_candidates(
        self, query: str, candidates: list[dict[str, Any]]
    ) -> list[dict[str, Any]]:
        """Rescore; on stage-level failure return the input candidates
        unchanged (graceful-degradation parity, SURVEY.md §5.3 /
        src/stage2_rescorer.py:258-263)."""
        if not candidates:
            return []
        try:
            return self._rescore(query, candidates)
        except Exception:
            logger.exception("stage2 rescoring failed; passing candidates through")
            return candidates

    def _rescore(
        self, query: str, candidates: list[dict[str, Any]]
    ) -> list[dict[str, Any]]:
        q_emb, q_mask = self.encode_query(query)
        n = len(candidates)
        # Pad candidate count to a bucket: extra rows have empty masks
        # and score 0 by construction in the kernel.
        bucket = _cand_bucket(n)
        d_emb, d_mask = self._candidate_embeddings(candidates, bucket)
        scores = np.asarray(
            self._maxsim(q_emb, q_mask, d_emb, d_mask)
            # normalize stays ON even though the encoder emits
            # unit-norm tokens: the device cache stores bf16, whose
            # rounding perturbs norms by ~1e-3 — re-normalizing at
            # score time restores exact cosine semantics (the
            # reference's F.normalize-at-scoring behavior)
        )[:n]

        rescored = []
        for cand, s in zip(candidates, scores.tolist()):
            c = dict(cand)
            c["stage2_score"] = float(s)
            c["stage"] = "stage2"
            rescored.append(c)
        rescored.sort(key=lambda x: x["stage2_score"], reverse=True)
        top = rescored[: self.config.stage2_top_k]
        logger.info(
            "stage2 rescored %d candidates; top score %.4f",
            len(candidates),
            top[0]["stage2_score"] if top else 0.0,
        )
        return top

    def rescore_batch(
        self, queries: Sequence[str], candidates_list: Sequence[list[dict[str, Any]]]
    ) -> list[list[dict[str, Any]]]:
        """Batched rescoring across queries: ONE forward for all query
        token embeddings and ONE forward for the UNION of candidate
        documents (deduped by doc_id), then per-query MaxSim."""
        if len(queries) != len(candidates_list):
            raise ValueError("queries and candidate lists must align")
        if not queries:
            return []
        try:
            max_q = min(
                self.runtime.head_cfg.query_max_len,
                self.config.stage2_max_seq_length,
            )
            q_embs, q_masks = self.runtime.encode_token_embeddings(
                list(queries), self.tokenizer, max_length=max_q,
                batch_size=self.config.stage2_batch_size,
            )
            # union of candidates across queries, encoded once
            union: dict[int, int] = {}
            union_docs: list[str] = []
            for cands in candidates_list:
                for c in cands:
                    if c["doc_id"] not in union:
                        union[c["doc_id"]] = len(union_docs)
                        union_docs.append(c["document"])
            use_device_cache = self._cache is not None and all(
                i < self._cache.max_docs for i in union
            )
            if use_device_cache:
                self.precompute(list(union.keys()), union_docs)
                use_device_cache = self._cache.covers(union.keys())
            if not use_device_cache:
                d_emb, d_mask = self.encode_documents(union_docs)
            # Two passes: dispatch every query's MaxSim first (the
            # device pipelines them), then ONE concatenated fetch — a
            # per-query np.asarray would pay a full host round trip per
            # query (~30 ms each on tunneled dev TPUs).
            dispatched: list[tuple[Any, int]] = []  # (scores_dev, n)
            for q_emb, q_mask, cands in zip(q_embs, q_masks, candidates_list):
                if not cands:
                    dispatched.append((None, 0))
                    continue
                n = len(cands)
                bucket = _cand_bucket(n)
                if use_device_cache:
                    ids = [c["doc_id"] for c in cands] + [-1] * (bucket - n)
                    ce, cm = self._cache.gather(ids)
                else:
                    sel = np.asarray([union[c["doc_id"]] for c in cands])
                    ce, cm = d_emb[sel], d_mask[sel]
                    if bucket > n:
                        pad = bucket - n
                        ce = np.concatenate(
                            [ce, np.zeros((pad,) + ce.shape[1:], ce.dtype)]
                        )
                        cm = np.concatenate(
                            [cm, np.zeros((pad, cm.shape[1]), cm.dtype)]
                        )
                scores_dev = self._maxsim(q_emb, q_mask, ce, cm)[:n]
                dispatched.append((scores_dev, n))
            live = [s for s, n in dispatched if n]
            flat = (
                np.asarray(jnp.concatenate(live)) if live
                else np.zeros((0,), dtype=np.float32)
            )
            out = []
            offset = 0
            for (scores_dev, n), cands in zip(dispatched, candidates_list):
                if not n:
                    out.append([])
                    continue
                scores = flat[offset : offset + n]
                offset += n
                rescored = []
                for cand, s in zip(cands, scores.tolist()):
                    c = dict(cand)
                    c["stage2_score"] = float(s)
                    c["stage"] = "stage2"
                    rescored.append(c)
                rescored.sort(key=lambda x: x["stage2_score"], reverse=True)
                out.append(rescored[: self.config.stage2_top_k])
            return out
        except Exception:
            logger.exception("stage2 batch rescoring failed; passing through")
            return [list(c) for c in candidates_list]

    def compute_similarity_matrix(self, query: str, document: str) -> np.ndarray:
        """Token-level [Lq, Ld] similarity (src/stage2_rescorer.py:307-320)."""
        q_emb, q_mask = self.encode_query(query)
        d_emb, d_mask = self.encode_documents([document])
        return np.asarray(
            similarity_matrix(q_emb, q_mask, d_emb[0], d_mask[0])
        )

    def clear_cache(self) -> None:
        if self._cache is not None:
            self._cache.clear()

    def get_model_info(self) -> dict[str, Any]:
        return {
            "weights_loaded": getattr(self.runtime, "weights_loaded", False),
            "model": self.config.stage2_model,
            "max_seq_length": self.config.stage2_max_seq_length,
            "scoring_method": self.config.stage2_scoring_method,
            "output_dim": self.token_dim,
            "use_projection": self.runtime.head_cfg.project,
            "cache_enabled": self.config.stage2_cache_doc_embeddings,
            "cached_docs": self._cache.size if self._cache else 0,
        }

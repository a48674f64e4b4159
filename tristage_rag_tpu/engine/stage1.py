"""Stage 1 — dense + lexical candidate generation.

TPU-native rebuild of src/stage1_retriever.py: the bi-encoder runs as a
jitted Flax forward (bf16, bucketed shapes), FAISS is replaced by the
HBM-resident DenseIndex (exact matmul top-k, document-sharded on a
mesh), BM25 is the incremental vectorized index, and fusion is RRF or
weighted min-max (ops/fusion.py). Result schema parity:
``{doc_id, document, score, stage1_score, metadata, stage}``
(src/stage1_retriever.py:402-417).
"""

from __future__ import annotations

import functools
import json
import logging
from pathlib import Path
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.factory import encoder_perf_overrides, build_runtime
from tristage_rag_tpu.index.bm25 import BM25Index
from tristage_rag_tpu.index.dense import DenseIndex
from tristage_rag_tpu.ops.fusion import reciprocal_rank_fusion, weighted_fusion

logger = logging.getLogger(__name__)


def _cluster_kwargs(config) -> dict:
    """Clustered-index knobs (index_search_impl: "clustered")."""
    return {
        "cluster_block_size": getattr(
            config, "index_cluster_block_size", 1024
        ),
        "cluster_n_probe": getattr(config, "index_cluster_n_probe", 32),
        "cluster_tile_q": getattr(config, "index_cluster_tile_q", 8),
        "cluster_iters": getattr(config, "index_cluster_iters", 10),
        "cluster_factor": getattr(config, "index_cluster_factor", 4),
        "cluster_kernel": getattr(config, "index_cluster_kernel", "auto"),
    }


class Stage1Retriever:
    def __init__(
        self,
        config: PipelineConfig,
        mesh: Optional[Mesh] = None,
    ):
        self.config = config
        self.mesh = mesh
        self.runtime, self.tokenizer = build_runtime(
            "bi",
            config.stage1_model,
            config.model_dir,
            compute_dtype=config.compute_dtype,
            mesh=mesh,
            seed=config.seed,
            prompt_mode=getattr(config, "stage1_prompt_mode", "auto"),
            encoder_overrides=encoder_perf_overrides(config, "stage1"),
            # weight-int8 must quantize from the original f32 kernels,
            # not bf16-pre-cast ones (stacked rounding)
            precast_kernels=not getattr(
                config, "stage1_weights_int8", False
            ),
        )
        if getattr(config, "stage1_weights_int8", False):
            n = self.runtime.quantize_weights_int8()
            logger.info("stage1 weights quantized to int8 (%d kernels)", n)
        self.documents: list[str] = []
        self.doc_metadata: list[dict[str, Any]] = []
        self.index: Optional[DenseIndex] = None
        self._fused_fn = None  # lazy encode+top-k composite jit
        self.bm25: Optional[BM25Index] = (
            BM25Index() if config.stage1_enable_bm25 else None
        )

    # ---- embedding -------------------------------------------------------

    @property
    def embedding_dim(self) -> int:
        head = self.runtime.head_cfg
        return (
            head.projection_dims[-1]
            if head.projection_dims
            else self.runtime.cfg.hidden_size
        )

    def encode(
        self, texts: Sequence[str], kind: str = "document",
        device_out: bool = False,
    ) -> np.ndarray:
        """[N, E] f32, L2-normalized; applies the model's ST prompt for
        ``kind`` in {"query", "document"} (parity with
        SentenceTransformer.encode's prompt handling)."""
        prompt = self.runtime.prompts.get(kind, "")
        texts = [prompt + t for t in texts] if prompt else list(texts)
        return self.runtime.encode_texts(
            texts,
            self.tokenizer,
            max_length=self.config.stage1_max_text_length,
            batch_size=self.config.stage1_batch_size,
            device_out=device_out,
        )

    # ---- indexing --------------------------------------------------------

    def add_documents(
        self,
        documents: Sequence[str],
        metadata: Optional[Sequence[dict[str, Any]]] = None,
    ) -> int:
        documents = list(documents)
        if not documents:
            return 0
        if metadata is None:
            metadata = [{} for _ in documents]
        if len(metadata) != len(documents):
            raise ValueError("metadata length must match documents")
        # Embeddings stay on device end-to-end: encoder -> index buffer.
        emb = self.encode(documents, device_out=True)
        if self.index is None:
            self.index = DenseIndex(
                dim=emb.shape[1],
                dtype=self.config.index_dtype,
                mesh=self.mesh,
                search_impl=getattr(
                    self.config, "index_search_impl", "auto"
                ),
                recall_target=getattr(
                    self.config, "index_recall_target", 0.95
                ),
                **_cluster_kwargs(self.config),
            )
        self.index.add(emb)
        if self.bm25 is not None:
            self.bm25.add(documents)
        self.documents.extend(documents)
        self.doc_metadata.extend(dict(m) for m in metadata)
        logger.info("stage1 indexed %d docs (total %d)", len(documents), len(self.documents))
        return len(documents)

    def delete_documents(self, doc_ids) -> int:
        """Tombstone documents by id: excluded from dense top-k on
        device and filtered from BM25 results host-side. Ids stay
        stable (no reindexing)."""
        if self.index is None:
            return 0
        n = self.index.delete(doc_ids)
        # Mirror the index's tombstone set rather than the raw request:
        # the index ignores out-of-range ids, and recording those here
        # would poison the host-side BM25 filter for ids assigned later.
        self.deleted_ids = set(self.index.deleted_ids)
        return n

    def clear(self) -> None:
        self.documents = []
        self.doc_metadata = []
        self.deleted_ids = set()
        if self.index is not None:
            self.index.clear()
        if self.bm25 is not None:
            self.bm25 = BM25Index()

    # ---- search ----------------------------------------------------------

    def _fuse_and_format(
        self, query: str, dense: list[tuple[int, float]], top_k: int
    ) -> list[dict[str, Any]]:
        deleted = getattr(self, "deleted_ids", set())
        if deleted:
            dense = [(d, s) for d, s in dense if d not in deleted]
        fused: list[tuple[int, float]]
        if self.bm25 is not None and self.bm25.corpus_size > 0:
            sparse = self.bm25.search(query, self.config.stage1_bm25_top_k)
            if deleted:
                sparse = [(d, s) for d, s in sparse if d not in deleted]
            if self.config.stage1_fusion_method == "rrf":
                f_ids, f_scores = reciprocal_rank_fusion(
                    [[d for d, _ in dense], [d for d, _ in sparse]],
                    rrf_k=self.config.stage1_rrf_k,
                )
            else:
                f_ids, f_scores = weighted_fusion(
                    np.asarray([d for d, _ in dense], dtype=np.int64),
                    np.asarray([s for _, s in dense]),
                    np.asarray([d for d, _ in sparse], dtype=np.int64),
                    np.asarray([s for _, s in sparse]),
                    dense_weight=self.config.stage1_dense_weight,
                    sparse_weight=self.config.stage1_bm25_weight,
                )
            fused = list(zip(f_ids.tolist(), f_scores.tolist()))[:top_k]
        else:
            fused = dense[:top_k]

        results = []
        for doc_idx, score in fused:
            if 0 <= doc_idx < len(self.documents):
                results.append(
                    {
                        "doc_id": doc_idx,
                        "document": self.documents[doc_idx],
                        "score": score,
                        "stage1_score": score,
                        "metadata": self.doc_metadata[doc_idx],
                        "stage": "stage1",
                    }
                )
        return results

    def search(self, query: str, top_k: Optional[int] = None) -> list[dict[str, Any]]:
        return self.search_batch([query], top_k)[0]

    def _fused_dense_search(self, queries: Sequence[str], top_k: int):
        """Encode + top-k in ONE device dispatch (single-device
        exact/approx paths; mesh and Pallas paths keep the two-step
        route). Saves a device round-trip per query batch — on
        tunneled dev TPUs that is ~30 ms of the stage-1 budget."""
        corpus, count, bias, scale, impl = self.index.search_state()
        # Route on the RAW impl: search_state downgrades pallas+int8 and
        # clustered to plain scans for the fused composites, but forced
        # pallas/clustered configs should reach their kernels through
        # index.search()'s two-step route.
        if self.mesh is not None or self.index._impl() in (
            "pallas", "clustered",
        ):
            q = self.encode(list(queries), kind="query")
            return self.index.search(q, top_k)
        if self._fused_fn is None:
            module = self.runtime.module
            from tristage_rag_tpu.ops.topk import (
                masked_approx_topk, masked_topk,
            )

            @functools.partial(
                jax.jit, static_argnames=("k", "impl", "recall")
            )
            def fused(params, ids, mask, types, corpus, count, bias,
                      scale, k, impl, recall):
                emb = module.apply({"params": params}, ids, mask, types)
                if impl == "approx":
                    return masked_approx_topk(
                        emb, corpus, count, k=k, bias=bias, scale=scale,
                        recall_target=recall,
                    )
                return masked_topk(
                    emb, corpus, count, k=k, bias=bias, scale=scale
                )

            self._fused_fn = fused
        prompt = self.runtime.prompts.get("query", "")
        texts = [prompt + q for q in queries] if prompt else list(queries)
        from tristage_rag_tpu.models.runtime import batch_bucket, pad_batch

        tb = self.tokenizer.encode_batch(
            texts, self.config.stage1_max_text_length
        )
        n = tb.input_ids.shape[0]
        tb = pad_batch(tb, batch_bucket(n))
        k_eff = max(min(top_k, self.index.capacity), 1)
        s, i = self._fused_fn(
            self.runtime.params,
            jnp.asarray(tb.input_ids), jnp.asarray(tb.attn_mask),
            jnp.asarray(tb.token_type_ids),
            corpus, count, bias, scale,
            k=k_eff, impl=impl, recall=self.index.recall_target,
        )
        s = np.asarray(s)[:n]
        i = np.asarray(i, dtype=np.int64)[:n]
        if k_eff < top_k:
            s = np.concatenate(
                [s, np.full((n, top_k - k_eff), -np.inf, s.dtype)], axis=1
            )
            i = np.concatenate(
                [i, np.full((n, top_k - k_eff), -1, i.dtype)], axis=1
            )
        return s, i

    def search_batch(
        self, queries: Sequence[str], top_k: Optional[int] = None
    ) -> list[list[dict[str, Any]]]:
        """Batched candidate generation: ONE encoder forward + ONE
        device top-k for all queries (the reference loops query-by-query,
        src/retrieval_pipeline.py:426-448)."""
        if self.index is None or not self.documents:
            raise ValueError("No documents indexed. Call add_documents() first.")
        top_k = top_k or self.config.stage1_top_k
        scores, ids = self._fused_dense_search(queries, top_k)
        out = []
        for qi, query in enumerate(queries):
            dense = [
                (int(i), float(s))
                for i, s in zip(ids[qi], scores[qi])
                if i >= 0
            ]
            out.append(self._fuse_and_format(query, dense, top_k))
        return out

    # ---- persistence (npz + JSON, never pickle — SURVEY.md §5.4) ---------

    def save_index(self, index_dir: Optional[str] = None) -> None:
        d = Path(index_dir or self.config.index_dir)
        d.mkdir(parents=True, exist_ok=True)
        if self.index is not None:
            self.index.save(d / "stage1_dense")
        if self.bm25 is not None:
            self.bm25.save(d / "stage1_bm25")
        (d / "stage1_docs.json").write_text(
            json.dumps(
                {"documents": self.documents, "metadata": self.doc_metadata}
            )
        )

    def load_index(self, index_dir: Optional[str] = None) -> bool:
        d = Path(index_dir or self.config.index_dir)
        docs_file = d / "stage1_docs.json"
        dense_file = (d / "stage1_dense").with_suffix(".npz")
        # Validate BEFORE mutating: a doc store without its dense index
        # must not overwrite in-memory state and report success — the
        # stale index's row ids would map onto the new documents list.
        if not docs_file.exists() or not dense_file.exists():
            return False
        payload = json.loads(docs_file.read_text())
        self.documents = payload["documents"]
        self.doc_metadata = payload["metadata"]
        self.index = DenseIndex.load(
            d / "stage1_dense", mesh=self.mesh,
            search_impl=getattr(self.config, "index_search_impl", "auto"),
            recall_target=getattr(self.config, "index_recall_target", 0.95),
            **_cluster_kwargs(self.config),
        )
        # restore the host-side filter that keeps tombstoned docs
        # out of BM25 results too
        self.deleted_ids = self.index.deleted_ids
        if self.config.stage1_enable_bm25:
            bm25_file = (d / "stage1_bm25").with_suffix(".json")
            if bm25_file.exists():
                self.bm25 = BM25Index.load(d / "stage1_bm25")
            else:
                # e.g. the index was saved with BM25 disabled: rebuild
                # from the loaded docs so BM25 internal ids stay aligned
                # with dense/doc-store ids (an empty BM25 would restart
                # ids at 0 on the next add_documents)
                self.bm25 = BM25Index()
                self.bm25.add(self.documents)
        return True

    def get_stats(self) -> dict[str, Any]:
        return {
            "weights_loaded": getattr(self.runtime, "weights_loaded", False),
            "num_documents": len(self.documents),
            "embedding_dim": self.embedding_dim if self.index else None,
            "index_capacity": self.index.capacity if self.index else 0,
            "bm25_enabled": self.bm25 is not None,
            "bm25_vocab": len(self.bm25.vocab) if self.bm25 else 0,
            "model": self.config.stage1_model,
        }

"""Single-dispatch tri-stage search — the whole funnel in ONE XLA program.

The staged path (pipeline.search) makes 3+ sequential device round
trips per query: stage-1 encode+top-k, stage-2 gather+MaxSim, stage-3
cross-encoder — each paying host<->device latency between stages (the
reference pays the same structure in torch, src/retrieval_pipeline.py:
323-424). On TPU every intermediate is already device-resident
(DenseIndex buffer, stage-2 token-embedding cache, stage-3 doc-token
cache), so the funnel compiles into one jit:

    bi-encode(q) -> dense top-k1 -> device RRF/weighted fusion with the
    host BM25 list -> gather ColBERT token cache -> MaxSim -> top-k2 ->
    gather doc token ids -> splice [CLS] q [SEP] d [SEP] rows on device
    -> cross-encoder forward -> stage-3 scores

Host work per query: tokenize the query three ways (three models, three
tokenizers), score BM25 (C++/numpy), and format the final dicts. One
host->device transfer (a few hundred token ids), one device->host
transfer (a few hundred scores/ids).

Divergences from the staged path (both documented in PARITY.md):
* stage-3 pair truncation: the reference truncates pairs longest-first
  (src/stage3_reranker.py:139-160); here the query is capped at
  ``stage3_query_reserve`` tokens and docs at
  ``stage3_max_length - stage3_query_reserve`` at indexing time, so
  rows splice with static shapes. Identical whenever
  len(q) + len(d) + 3 <= stage3_max_length.
* fused top-k1 keeps the best k1 of the dense/bm25 union (the host path
  keeps the whole union before slicing — same first k1 entries).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.index.doc_tokens import DocTokenCache
from tristage_rag_tpu.index.token_cache import dequantize_gather
from tristage_rag_tpu.models.heads import apply_score_activation
from tristage_rag_tpu.parallel.mesh import DCN_AXIS, dcn_groups
from tristage_rag_tpu.ops.device_fusion import (
    rrf_fuse_device,
    weighted_fuse_device,
)
from tristage_rag_tpu.ops.blockskip import blockskip_topk
from tristage_rag_tpu.ops.maxsim import maxsim_scores
from tristage_rag_tpu.ops.topk import NEG_INF, masked_approx_topk, masked_topk

logger = logging.getLogger(__name__)


def _fuse_stage1(cfg, d_s, d_i, bm_ids, bm_scores, k1, use_bm25):
    """Device-side BM25 fusion shared by the single-device and sharded
    cores. Inputs/outputs are per-query 1-D arrays."""
    if not use_bm25:
        return d_s, d_i
    if cfg.stage1_fusion_method == "rrf":
        return rrf_fuse_device(
            d_i, bm_ids, k=k1, rrf_k=float(cfg.stage1_rrf_k)
        )
    return weighted_fuse_device(
        d_i, d_s, bm_ids, bm_scores, k=k1,
        dense_weight=cfg.stage1_dense_weight,
        sparse_weight=cfg.stage1_bm25_weight,
    )


def _splice_pairs(q3_row, q3_len, d_rows, d_lens):
    """[CLS] q [SEP] | d [SEP] splicing on device: returns
    (pair_ids, pair_mask, pair_types), each [n_pairs, Rq + Ld3]."""
    rq = q3_row.shape[0]
    lp = rq + d_rows.shape[1]
    pos = jnp.arange(lp, dtype=jnp.int32)
    q_part = q3_row[jnp.clip(pos, 0, rq - 1)]       # [lp]
    doc_idx = jnp.clip(pos[None, :] - q3_len, 0, d_rows.shape[1] - 1)
    doc_part = jnp.take_along_axis(
        d_rows, jnp.broadcast_to(doc_idx, (d_rows.shape[0], lp)), axis=1
    )
    in_q = pos[None, :] < q3_len
    total = (q3_len + d_lens)[:, None]
    pair_mask = (pos[None, :] < total).astype(jnp.int32)
    pair_ids = jnp.where(in_q, q_part[None, :], doc_part) * pair_mask
    pair_types = ((~in_q) & (pos[None, :] < total)).astype(jnp.int32)
    return pair_ids, pair_mask, pair_types


def _pack_payload(f_i, ids2, f_s, top2_s, s1_of_2, s3_scores):
    """One array out: ids bitcast into the float payload (each
    device->host fetch pays a full round trip)."""
    ids_as_f32 = jax.lax.bitcast_convert_type(
        jnp.concatenate([f_i, ids2]), jnp.float32
    )
    return jnp.concatenate([
        ids_as_f32,
        f_s.astype(jnp.float32),
        top2_s.astype(jnp.float32),
        s1_of_2.astype(jnp.float32),
        s3_scores.astype(jnp.float32),
    ])


def _gather_candidate_tokens(s2_cache, safe_ids, valid, width=None):
    """Stage-2 token gather from a (possibly int8) cache state tuple.

    ``width`` (static, see ``_d2_budget``) slices the token axis to
    ``[:, :width]`` before the f32 materialization: every cached row's
    valid tokens fit inside it, so MaxSim scores are bit-identical while
    the per-query gathered block shrinks from [k1, L2, D] to
    [k1, width, D] (full-length perf profile: 49 MB -> 8 MB f32 at
    k1=500, L2=192, D=128, width=32 short-doc corpora).

    A TIERED cache (TieredTokenCache.state(): nested
    ``(hot_state, tail_state, doc->slot map)``) gathers the hot window
    plus a map-indirected tail gather concatenated on the token axis —
    and when the static ``width`` fits the hot window the tail gather
    is dropped at trace time entirely."""
    if s2_cache and isinstance(s2_cache[0], (tuple, list)):
        hot_state, tail_state, tmap = s2_cache
        hot_len = hot_state[0].shape[1]
        w_hot = None if width is None else min(width, hot_len)
        e1, m1 = _gather_candidate_tokens(
            hot_state, safe_ids, valid, width=w_hot
        )
        if width is not None and width <= hot_len:
            return e1, m1
        slots = jnp.take(tmap, safe_ids, axis=0)
        t_valid = valid & (slots >= 0)
        tail_cap = tail_state[0].shape[0]
        safe_slots = jnp.clip(slots, 0, max(tail_cap - 1, 0))
        w_tail = None if width is None else width - hot_len
        e2, m2 = _gather_candidate_tokens(
            tail_state, safe_slots, t_valid, width=w_tail
        )
        return (
            jnp.concatenate([e1, e2], axis=1),
            jnp.concatenate([m1, m2], axis=1),
        )
    if len(s2_cache) == 3:  # int8 cache: gather + fused dequant
        s2_q, s2_scale, s2_mask_buf = s2_cache
        c_emb = dequantize_gather(s2_q, s2_scale, safe_ids, width=width)
    else:
        s2_buf, s2_mask_buf = s2_cache
        c_emb = jnp.take(s2_buf, safe_ids, axis=0)
        if width is not None:
            c_emb = c_emb[:, :width]
        c_emb = c_emb.astype(jnp.float32)
    c_mask = jnp.take(s2_mask_buf, safe_ids, axis=0)
    if width is not None:
        c_mask = c_mask[:, :width]
    c_mask = c_mask.astype(jnp.int32) * valid[:, None].astype(jnp.int32)
    return c_emb, c_mask


def _clustered_topk(q_emb, cl_arrays, k1, cl, real_mask=None):
    """Stage-1 clustered (IVF-equivalent) probe inside the fused
    program: centroid matmul -> top-n_probe block gather -> exact
    masked scoring (ops/blockskip.py — the reference's FAISS nlist/
    nprobe counterpart, src/stage1_retriever.py:264-273). ``cl`` is the
    static tuple from ``_prepare``; returns ([B, k1] f32, [B, k1] i32
    original doc ids, -1 pad) — probing the n_probe best blocks instead
    of scanning the whole corpus buffer."""
    blocked, row_ids, cents, bias, scales = cl_arrays
    n_probe, tile_q, kernel, has_bias, has_scales, interpret = cl
    s, i = blockskip_topk(
        q_emb, blocked, row_ids, cents, k=k1, n_probe=n_probe,
        tile_q=tile_q,
        bias=bias if has_bias else None,
        scales=scales if has_scales else None,
        impl=kernel, interpret=interpret, real_mask=real_mask,
    )
    return s, i.astype(jnp.int32)


def _clustered_topk_sharded(q_emb, cl_arrays, k1, cl, axis, real_mask=None):
    """Distributed-IVF probe inside the shard-mapped funnel: each
    device probes ``n_probe`` (the per-shard budget from
    ``fused_cluster_state``) of its local blocks of the round-robin
    interleaved view, takes a local top-k over GLOBAL row ids, and the
    merge is the same all-gather + exact top-k the sharded scan uses —
    probed pools never leave their device. Pool split and merge are
    identical to the staged ``index/dense.py::_sharded_blockskip``, so
    staged and fused mesh searches stay ranking-identical."""
    blocked, row_ids, cents, bias, scales = cl_arrays
    n_probe, tile_q, kernel, has_bias, has_scales, interpret = cl
    s, i = blockskip_topk(
        q_emb, blocked, row_ids, cents, k=k1, n_probe=n_probe,
        tile_q=tile_q,
        bias=bias if has_bias else None,
        scales=scales if has_scales else None,
        impl=kernel, interpret=interpret, real_mask=real_mask,
    )
    s_all = jax.lax.all_gather(s, axis)  # [ndev, B, k1]
    i_all = jax.lax.all_gather(i, axis)
    b = q_emb.shape[0]
    s_flat = jnp.moveaxis(s_all, 0, 1).reshape(b, -1)
    i_flat = jnp.moveaxis(i_all, 0, 1).reshape(b, -1)
    top_s, pos = jax.lax.top_k(s_flat, k1)
    top_i = jnp.take_along_axis(i_flat, pos, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1).astype(jnp.int32)
    return top_s, top_i


def _encode_queries(
    s1_module, s2_module, s1_params, s2_params, ids1, m1, t1, ids2, m2
):
    """The fused funnel's query encoders — ONE definition shared by
    every (single-query | batched) x (single-device | sharded) wrapper,
    so a change to query encoding cannot silently diverge between
    paths. Returns ([B, E] bi-encoder embeddings, [B, L2q, D] ColBERT
    token embeddings)."""
    q_emb = s1_module.apply({"params": s1_params}, ids1, m1, t1)
    q2 = s2_module.apply({"params": s2_params}, ids2, m2)
    return q_emb, q2


class FusedSearcher:
    """Owns the fused jit + the stage-3 doc-token cache.

    Built lazily by the pipeline once all three stages exist. Requires
    the stage-2 device token cache and a non-Pallas dense-search impl;
    ``ready()`` gates per query and the pipeline falls back to the
    staged path otherwise. With a mesh, the program shard-maps over it
    (``_build_fn_sharded``: row-sharded corpus + caches, psum'd
    stage-2 scores, dp cross-encoder over pairs); without one it is
    the single-device jit (``_build_fn``).
    """

    def __init__(self, config: PipelineConfig, stage1, stage2, stage3):
        self.config = config
        self.stage1 = stage1
        self.stage2 = stage2
        self.stage3 = stage3
        self.mesh = stage1.mesh
        self.data_axis = getattr(stage1.index, "data_axis", "data")
        self.ndcn = dcn_groups(self.mesh)  # query-batch groups (§5.8)
        self.q_reserve = config.stage3_query_reserve
        self.doc_tokens = DocTokenCache(
            seq_len=max(config.stage3_max_length - self.q_reserve, 8),
            sep_id=stage3.tokenizer.sep_id,
            mesh=self.mesh,
            data_axis=self.data_axis,
        )
        self._ones_scale = None  # lazily sized to the index capacity
        if self.mesh is not None:
            self._fn = self._build_fn_sharded()
        else:
            self._fn = self._build_fn()

    # ---- indexing-time precompute -----------------------------------------

    def precompute(self, doc_ids, documents) -> int:
        return self.doc_tokens.add(doc_ids, documents, self.stage3.tokenizer)

    def _d3_budget(self) -> int:
        """Static pair doc-width: the smallest bucket that fits every
        cached doc row (never truncates, so rankings are unchanged).
        Short-doc corpora (LIMIT-style ~15-token passages) then pay the
        cross-encoder for lp = reserve + 32 tokens instead of the full
        stage3_max_length — the funnel's dominant compute term. At most
        one extra compile per bucket the corpus max-length crosses."""
        full = self.doc_tokens.seq_len
        ml = self.doc_tokens.max_len or full
        for b in (32, 64, 96, 128, 160, 192):
            if b >= ml and b <= full:
                return b
        return full

    def _d2_budget(self) -> int:
        """Static stage-2 gather width: the smallest bucket covering
        every cached row's valid token count (DeviceTokenCache.max_len),
        so the per-query candidate gather materializes [k1, bucket, D]
        instead of [k1, stage2_max_seq_length, D]. Tokens past a row's
        length are mask-zero, so MaxSim is unchanged — pure HBM-traffic
        saving, mirroring ``_d3_budget``. At most one extra compile per
        bucket the corpus max-length crosses."""
        cache = self.stage2._cache
        full = cache.seq_len
        ml = cache.max_len or full
        for b in (32, 64, 96, 128, 160, 192):
            if b >= ml and b <= full:
                return b
        return full

    # ---- eligibility -------------------------------------------------------

    def ready(self) -> bool:
        s1 = self.stage1
        if s1.index is None or s1.index.count == 0:
            return False
        cache = self.stage2._cache
        if cache is None or cache.size < s1.index.count:
            return False
        if self.mesh is not None and cache.mesh is not self.mesh:
            # a cache built before the mesh existed is not row-sharded;
            # the shard-mapped program's specs would silently reshard
            # the whole buffer per dispatch
            return False
        if not self.doc_tokens.covers_count(s1.index.count):
            return False
        impl = s1.index.search_state()[4]
        return impl in ("exact", "approx")

    # ---- the device program -------------------------------------------------

    def _build_fn(self):
        cfg = self.config
        s1_module = self.stage1.runtime.module
        s2_module = self.stage2.runtime.module
        s3_module = self.stage3.runtime.module

        def tail(
            s3_params,
            q_emb, q2, q2_mask,                 # [1, E], [L2q, D], [L2q]
            q3_row, q3_len,                     # [Rq] i32, scalar i32
            corpus, count, bias, scale,         # dense index state
            bm_ids, bm_scores,                  # [kb] i32 / f32 (padded -1/0)
            s2_cache,                           # ColBERT token cache state
                                                # (emb, mask) or int8
                                                # (emb, scale, mask)
            d3_buf, d3_len,                     # stage-3 doc token cache
            k1, k2, impl, use_bm25, d3b, d2b,
            pre_s1=None,
        ):
            """Everything after the query encoders — split out so the
            batched path can encode ALL queries in one forward per
            model (MXU-efficient) and lax.map only this tail.

            ``pre_s1``: precomputed ([k1], [k1] i32) stage-1 results —
            the clustered probe runs OUTSIDE the tail (batched across
            queries in fn_batch so probe tiles match the staged
            index.search exactly; per-query in fn)."""
            # ---- stage 1: masked top-k over the corpus buffer
            if pre_s1 is not None:
                d_s, d_i = pre_s1  # already per-query [k1] / [k1] i32
            else:
                if impl == "approx":
                    d_s, d_i = masked_approx_topk(
                        q_emb, corpus, count, k=k1, bias=bias, scale=scale,
                        recall_target=self.stage1.index.recall_target,
                    )
                else:
                    d_s, d_i = masked_topk(
                        q_emb, corpus, count, k=k1, bias=bias, scale=scale
                    )
                d_s, d_i = d_s[0], d_i[0].astype(jnp.int32)

            # ---- fusion with the host BM25 list, on device
            f_s, f_i = _fuse_stage1(
                cfg, d_s, d_i, bm_ids, bm_scores, k1, use_bm25
            )

            # ---- stage 2: gather cached token embeddings + MaxSim
            valid1 = f_i >= 0
            s2_cap = (
                s2_cache[0][0].shape[0]
                if isinstance(s2_cache[0], (tuple, list))  # tiered
                else s2_cache[0].shape[0]
            )
            safe1 = jnp.clip(f_i, 0, s2_cap - 1)
            c_emb, c_mask = _gather_candidate_tokens(
                s2_cache, safe1, valid1, d2b
            )
            s2_scores = maxsim_scores(
                q2, q2_mask, c_emb, c_mask,
                method=cfg.stage2_scoring_method,
            )
            s2_scores = jnp.where(valid1, s2_scores, -jnp.inf)
            top2_s, top2_pos = jax.lax.top_k(s2_scores, k2)
            ids2 = jnp.where(jnp.isfinite(top2_s), f_i[top2_pos], -1)
            s1_of_2 = f_s[top2_pos]

            # ---- stage 3: splice [CLS] q [SEP] | d [SEP] rows on device
            valid2 = ids2 >= 0
            safe2 = jnp.clip(ids2, 0, d3_buf.shape[0] - 1)
            # [:d3b]: static pair-width bucket >= every cached row's
            # length (see _d3_budget) — pure compute saving, no
            # truncation possible
            d_rows = jnp.take(d3_buf, safe2, axis=0)[:, :d3b]
            d_lens = jnp.take(d3_len, safe2) * valid2.astype(jnp.int32)
            pair_ids, pair_mask, pair_types = _splice_pairs(
                q3_row, q3_len, d_rows, d_lens
            )
            logits = s3_module.apply(
                {"params": s3_params}, pair_ids, pair_mask, pair_types
            )
            s3_scores = apply_score_activation(logits, cfg.stage3_activation)
            s3_scores = jnp.where(valid2, s3_scores, -jnp.inf)
            return _pack_payload(f_i, ids2, f_s, top2_s, s1_of_2, s3_scores)

        def fn(
            s1_params, s2_params, s3_params,
            s1_ids, s1_mask, s1_types,          # [1, L1]
            s2_ids, s2_mask,                    # [1, L2q]
            q3_row, q3_len,
            corpus, count, bias, scale,
            bm_ids, bm_scores,
            s2_cache, d3_buf, d3_len, cl_arrays,
            *, k1, k2, impl, use_bm25, d3b, d2b, cl,
        ):
            q_emb, q2_all = _encode_queries(
                s1_module, s2_module, s1_params, s2_params,
                s1_ids, s1_mask, s1_types, s2_ids, s2_mask,
            )
            pre = None
            if impl == "clustered":
                ps, pi = _clustered_topk(q_emb, cl_arrays, k1, cl)
                pre = (ps[0], pi[0])
            return tail(
                s3_params, q_emb, q2_all[0], s2_mask[0], q3_row, q3_len,
                corpus, count, bias, scale, bm_ids, bm_scores,
                s2_cache, d3_buf, d3_len,
                k1, k2, impl, use_bm25, d3b, d2b,
                pre_s1=pre,
            )

        def fn_batch(
            s1_params, s2_params, s3_params,
            b_s1_ids, b_s1_mask, b_s1_types,    # [B, L1]
            b_s2_ids, b_s2_mask,                # [B, L2q]
            b_q3_row, b_q3_len, b_real,         # [B, Rq], [B], [B]
            corpus, count, bias, scale,
            b_bm_ids, b_bm_scores,              # [B, kb]
            s2_cache, d3_buf, d3_len, cl_arrays,
            *, k1, k2, impl, use_bm25, d3b, d2b, cl,
        ):
            # ONE dispatch for the whole query batch. The query
            # encoders run ONCE for the whole batch (batch-1 encoder
            # forwards are latency-bound on the MXU and dominated the
            # per-query map); lax.map then runs only the per-query tail
            # sequentially, keeping peak memory at one query's working
            # set. The reference loops batch_search on the host instead
            # (src/retrieval_pipeline.py:426-448).
            q_embs, q2_all = _encode_queries(
                s1_module, s2_module, s1_params, s2_params,
                b_s1_ids, b_s1_mask, b_s1_types, b_s2_ids, b_s2_mask,
            )

            # Clustered stage-1 probes the WHOLE batch in one call
            # before the map — probe tiles (tile_q queries sharing one
            # block set) then match the staged index.search(batch)
            # exactly, and the kernel's query-tile padding amortizes.
            pre_all = (
                _clustered_topk(q_embs, cl_arrays, k1, cl, real_mask=b_real)
                if impl == "clustered" else None
            )

            def body(qa):
                if pre_all is not None:
                    qe, q2, q2m, q3r, q3l, bmi, bms, ps, pi = qa
                    pre = (ps, pi)
                else:
                    qe, q2, q2m, q3r, q3l, bmi, bms = qa
                    pre = None
                return tail(
                    s3_params, qe[None], q2, q2m, q3r, q3l,
                    corpus, count, bias, scale, bmi, bms,
                    s2_cache, d3_buf, d3_len,
                    k1, k2, impl, use_bm25, d3b, d2b,
                    pre_s1=pre,
                )

            xs = (
                q_embs, q2_all, b_s2_mask, b_q3_row, b_q3_len,
                b_bm_ids, b_bm_scores,
            )
            if pre_all is not None:
                xs = xs + pre_all
            return jax.lax.map(body, xs)

        self._fn_batch = jax.jit(
            fn_batch,
            static_argnames=("k1", "k2", "impl", "use_bm25", "d3b", "d2b", "cl"),
        )
        return jax.jit(
            fn, static_argnames=("k1", "k2", "impl", "use_bm25", "d3b", "d2b", "cl")
        )

    def _build_fn_sharded(self):
        """The multi-chip fused funnel: ONE shard-mapped XLA program.

        Document-axis layout over the mesh (SURVEY.md §2.6): the dense
        corpus, the stage-2 token cache, and the stage-3 token cache are
        all row-sharded, so a slice serves n_devices x the corpus of one
        chip at the same per-chip HBM. Per query:

        * stage 1 — each device scans its corpus shard (masked top-k)
          and the k-sized partials all-gather + merge over ICI (the
          same pattern as index/dense.py::_sharded_topk);
        * stage 2 — each device MaxSim-scores the candidates whose
          cached tokens it owns (non-owned candidates score exactly 0
          by the empty-mask contract of ops/maxsim.py), and a [k1]
          psum assembles full scores — token embeddings never cross
          ICI, only scores do;
        * stage 3 — pair token rows assemble by psum of owner-masked
          gathers ([k2, Ld3] i32, ~100 KB), then the cross-encoder runs
          data-parallel over the pair axis (each device scores
          k2/n_devices pairs) and logits all-gather.

        Everything else (BM25 fusion, splicing, payload packing) is
        identical to the single-device core via the shared helpers.
        """
        cfg = self.config
        mesh = self.mesh
        axis = self.data_axis
        ndev = mesh.shape[axis]
        s1_module = self.stage1.runtime.module
        s2_module = self.stage2.runtime.module
        s3_module = self.stage3.runtime.module
        s2_state_len = len(self.stage2._cache.state())
        searcher = self  # index/caches are built lazily, read at trace

        def make_local(k1, k2, impl, use_bm25, d3b, d2b, cl):
            recall_target = searcher.stage1.index.recall_target

            def local_tail(
                s3_params,
                q_emb, q2, q2_mask,             # [1, E], [L2q, D], [L2q]
                q3_row, q3_len,
                corpus, count, bias, scale,
                bm_ids, bm_scores,
                s2_cache, d3_buf, d3_len,
                pre_s1=None,                    # distributed-IVF probe
            ):
                # ---- stage 1: local shard scan + all-gather merge
                if pre_s1 is not None:
                    d_s, d_i = pre_s1  # merged [k1] / [k1] i32
                else:
                    shard_rows = corpus.shape[0]
                    base = jax.lax.axis_index(axis) * shard_rows
                    local_count = jnp.clip(count - base, 0, shard_rows)
                    k_loc = min(k1, shard_rows)
                    if impl == "approx":
                        s_loc, i_loc = masked_approx_topk(
                            q_emb, corpus, local_count, k=k_loc, bias=bias,
                            scale=scale, recall_target=recall_target,
                        )
                    else:
                        s_loc, i_loc = masked_topk(
                            q_emb, corpus, local_count, k=k_loc, bias=bias,
                            scale=scale,
                        )
                    i_loc = jnp.where(i_loc >= 0, i_loc + base, -1)
                    s_all = jax.lax.all_gather(s_loc[0], axis)  # [ndev, k']
                    i_all = jax.lax.all_gather(i_loc[0], axis)
                    d_s, pos = jax.lax.top_k(s_all.reshape(-1), k1)
                    d_i = i_all.reshape(-1)[pos].astype(jnp.int32)
                    d_i = jnp.where(
                        jnp.isfinite(d_s) & (d_s > -1e29), d_i, -1
                    )

                f_s, f_i = _fuse_stage1(
                    cfg, d_s, d_i, bm_ids, bm_scores, k1, use_bm25
                )

                # ---- stage 2: shard-local gather + MaxSim, psum scores
                shard2 = s2_cache[0].shape[0]
                base2 = jax.lax.axis_index(axis) * shard2
                own = (f_i >= base2) & (f_i < base2 + shard2)
                loc = jnp.clip(f_i - base2, 0, shard2 - 1)
                c_emb, c_mask = _gather_candidate_tokens(
                    s2_cache, loc, own, d2b
                )
                local_scores = maxsim_scores(
                    q2, q2_mask, c_emb, c_mask,
                    method=cfg.stage2_scoring_method,
                )
                s2_scores = jax.lax.psum(local_scores, axis)
                valid1 = f_i >= 0
                s2_scores = jnp.where(valid1, s2_scores, -jnp.inf)
                top2_s, top2_pos = jax.lax.top_k(s2_scores, k2)
                ids2 = jnp.where(jnp.isfinite(top2_s), f_i[top2_pos], -1)
                s1_of_2 = f_s[top2_pos]

                # ---- stage 3: psum-assemble pair rows, dp over pairs
                k2p = ((k2 + ndev - 1) // ndev) * ndev
                ids2p = jnp.concatenate([
                    ids2, jnp.full((k2p - k2,), -1, dtype=jnp.int32)
                ])
                valid2p = ids2p >= 0
                shard3 = d3_buf.shape[0]
                base3 = jax.lax.axis_index(axis) * shard3
                own3 = valid2p & (ids2p >= base3) & (ids2p < base3 + shard3)
                loc3 = jnp.clip(ids2p - base3, 0, shard3 - 1)
                # [:d3b]: static pair-width bucket (see _d3_budget);
                # slicing before the psum also shrinks ICI traffic
                rows_loc = (
                    jnp.take(d3_buf, loc3, axis=0)[:, :d3b]
                    * own3[:, None].astype(jnp.int32)
                )
                lens_loc = jnp.take(d3_len, loc3) * own3.astype(jnp.int32)
                d_rows = jax.lax.psum(rows_loc, axis)      # [k2p, Ld3]
                d_lens = jax.lax.psum(lens_loc, axis)
                pair_ids, pair_mask, pair_types = _splice_pairs(
                    q3_row, q3_len, d_rows, d_lens
                )
                per = k2p // ndev
                start = jax.lax.axis_index(axis) * per
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, per, 0)
                logits_loc = s3_module.apply(
                    {"params": s3_params},
                    sl(pair_ids), sl(pair_mask), sl(pair_types),
                )
                # collapse [per, num_labels] -> [per] BEFORE the gather:
                # flattening raw logits first would hand the activation a
                # label-less axis (softmax across pairs, not labels)
                scores_loc = apply_score_activation(
                    logits_loc, cfg.stage3_activation
                )
                s3_scores = jax.lax.all_gather(
                    scores_loc, axis
                ).reshape(-1)[:k2]
                s3_scores = jnp.where(ids2 >= 0, s3_scores, -jnp.inf)
                return _pack_payload(f_i, ids2, f_s, top2_s, s1_of_2, s3_scores)

            return local_tail

        def make_single(k1, k2, impl, use_bm25, d3b, d2b, cl):
            tail = make_local(k1, k2, impl, use_bm25, d3b, d2b, cl)

            def local_single(
                s1p, s2p, s3p,
                s1_ids, s1_mask, s1_types, s2_ids, s2_mask,
                q3_row, q3_len,
                corpus, count, bias, scale, bm_ids, bm_scores,
                s2_cache, d3_buf, d3_len, cl_arrays,
            ):
                q_emb, q2_all = _encode_queries(
                    s1_module, s2_module, s1p, s2p,
                    s1_ids, s1_mask, s1_types, s2_ids, s2_mask,
                )
                pre = None
                if impl == "clustered":
                    ps, pi = _clustered_topk_sharded(
                        q_emb, cl_arrays, k1, cl, axis
                    )
                    pre = (ps[0], pi[0])
                return tail(
                    s3p, q_emb, q2_all[0], s2_mask[0], q3_row, q3_len,
                    corpus, count, bias, scale, bm_ids, bm_scores,
                    s2_cache, d3_buf, d3_len,
                    pre_s1=pre,
                )

            return local_single

        P_ = P  # alias for the spec table below
        s2_specs = (
            (P_(axis, None, None), P_(axis, None), P_(axis, None))
            if s2_state_len == 3
            else (P_(axis, None, None), P_(axis, None))
        )
        # Distributed-IVF view (fused_cluster_state on a mesh): blocked
        # corpus / row ids / centroids / bias / scales, all sharded
        # over the BLOCK axis (round-robin interleaved at build).
        cl_specs = (
            P_(axis, None, None), P_(axis, None), P_(axis, None),
            P_(axis, None), P_(axis, None),
        )
        in_specs = (
            P_(), P_(), P_(),                    # params (replicated)
            P_(), P_(), P_(),                    # s1 query batch
            P_(), P_(),                          # s2 query batch
            P_(), P_(),                          # q3 row / len
            P_(axis, None), P_(), P_(axis), P_(axis),  # index state
            P_(), P_(),                          # bm25 lists
            s2_specs, P_(axis, None), P_(axis),  # device caches
            cl_specs,                            # clustered view
        )
        # Hybrid ("dcn", "data") mesh (SURVEY.md §5.8): the batched
        # program shards the QUERY axis over "dcn" — each slice runs
        # the full funnel on B/ndcn queries against its own replica of
        # the (ICI-row-sharded) corpus/caches, and NO collective in the
        # tail names "dcn", so nothing crosses slices. The single-query
        # program keeps queries replicated (its output must be too).
        dcn = DCN_AXIS if DCN_AXIS in mesh.axis_names else None
        if dcn is not None:
            in_specs_batch = (
                in_specs[:3]
                + (P_(dcn, None), P_(dcn, None), P_(dcn, None))  # s1 batch
                + (P_(dcn, None), P_(dcn, None))                 # s2 batch
                + (P_(dcn, None), P_(dcn), P_(dcn))          # q3 row/len/real
                + in_specs[10:14]
                + (P_(dcn, None), P_(dcn, None))                 # bm25 lists
                + in_specs[16:]
            )
            out_specs_batch = P_(dcn)
        else:
            # fn's single-query arg list has no real-query mask; the
            # batched program inserts it after q3 row/len
            in_specs_batch = in_specs[:10] + (P_(),) + in_specs[10:]
            out_specs_batch = P_()

        def shard_mapped(local, args):
            return jax.shard_map(
                local, mesh=mesh, in_specs=in_specs, out_specs=P_(),
                check_vma=False,
            )(*args)

        def fn(*args, k1, k2, impl, use_bm25, d3b, d2b, cl):
            return shard_mapped(
                make_single(k1, k2, impl, use_bm25, d3b, d2b, cl), args
            )

        def fn_batch(
            s1p, s2p, s3p,
            b_s1_ids, b_s1_mask, b_s1_types,
            b_s2_ids, b_s2_mask,
            b_q3_row, b_q3_len, b_real,
            corpus, count, bias, scale,
            b_bm_ids, b_bm_scores,
            s2_cache, d3_buf, d3_len, cl_arrays,
            *, k1, k2, impl, use_bm25, d3b, d2b, cl,
        ):
            tail = make_local(k1, k2, impl, use_bm25, d3b, d2b, cl)

            def local_batch(
                s1p, s2p, s3p,
                bi1, bm1, bt1, bi2, bm2, bq3r, bq3l, breal,
                corpus, count, bias, scale, bbmi, bbms,
                s2_cache, d3_buf, d3_len, cl_arrays,
            ):
                # batch-encode the queries ONCE per device (replicated
                # work, but MXU-efficient vs B latency-bound batch-1
                # forwards), then map only the per-query tail
                q_embs, q2_all = _encode_queries(
                    s1_module, s2_module, s1p, s2p, bi1, bm1, bt1, bi2, bm2,
                )

                # Distributed-IVF: probe the whole (slice-)local batch
                # in one call, exactly like the staged sharded search.
                pre_all = (
                    _clustered_topk_sharded(
                        q_embs, cl_arrays, k1, cl, axis, real_mask=breal
                    )
                    if impl == "clustered" else None
                )

                def body(qa):
                    if pre_all is not None:
                        qe, q2, q2m, q3r, q3l, bmi, bms, ps, pi = qa
                        pre = (ps, pi)
                    else:
                        qe, q2, q2m, q3r, q3l, bmi, bms = qa
                        pre = None
                    return tail(
                        s3p, qe[None], q2, q2m, q3r, q3l,
                        corpus, count, bias, scale, bmi, bms,
                        s2_cache, d3_buf, d3_len,
                        pre_s1=pre,
                    )

                xs = (q_embs, q2_all, bm2, bq3r, bq3l, bbmi, bbms)
                if pre_all is not None:
                    xs = xs + pre_all
                return jax.lax.map(body, xs)

            return jax.shard_map(
                local_batch, mesh=mesh, in_specs=in_specs_batch,
                out_specs=out_specs_batch, check_vma=False,
            )(
                s1p, s2p, s3p,
                b_s1_ids, b_s1_mask, b_s1_types, b_s2_ids, b_s2_mask,
                b_q3_row, b_q3_len, b_real,
                corpus, count, bias, scale, b_bm_ids, b_bm_scores,
                s2_cache, d3_buf, d3_len, cl_arrays,
            )

        self._fn_batch = jax.jit(
            fn_batch,
            static_argnames=("k1", "k2", "impl", "use_bm25", "d3b", "d2b", "cl"),
        )
        return jax.jit(
            fn, static_argnames=("k1", "k2", "impl", "use_bm25", "d3b", "d2b", "cl")
        )

    # ---- the host wrapper ----------------------------------------------------

    def _prepare(self, queries: list[str], with_bm25: bool = True):
        """Host-side prep shared by search/search_batch/probe: three
        tokenizations per query, BM25 candidate lists (tombstones
        filtered), index state, and the static k's. Returns
        (params_and_arrays_tuple_prefix..., statics dict)."""
        cfg = self.config
        s1 = self.stage1
        nb = len(queries)

        # Static int8 activations need calibrated scales BEFORE the
        # fused program runs (it applies the stage modules directly,
        # bypassing runtime.forward's lazy trigger). Indexing normally
        # calibrates stages 1-2 (their fills go through forward); this
        # covers the load_index path where caches restore without any
        # encode. Calibrate on real indexed docs + the live query.
        sample = s1.documents[:: max(1, len(s1.documents) // 16)][:16]

        def _s1_batch():
            qp = s1.runtime.prompts.get("query", "")
            dp_ = s1.runtime.prompts.get("document", "")
            return s1.tokenizer.encode_batch(
                [qp + queries[0]] + [dp_ + d for d in sample],
                cfg.stage1_max_text_length,
            )

        def _s2_batch():
            return self.stage2.tokenizer.encode_batch(
                [queries[0]] + list(sample),
                cfg.stage2_max_seq_length,
                buckets=(cfg.stage2_max_seq_length,),
            )

        def _s3_batch():
            return self.stage3.tokenizer.encode_pairs(
                [(queries[0], d) for d in sample], cfg.stage3_max_length
            )

        for name, rt, make_batch in (
            ("stage1", s1.runtime, _s1_batch),
            ("stage2", self.stage2.runtime, _s2_batch),
            ("stage3", self.stage3.runtime, _s3_batch),
        ):
            if not getattr(rt, "needs_act_calibration", False):
                continue
            if not sample:
                logger.warning(
                    "%s static int8 needs calibration but the corpus is "
                    "empty; scales stay 1.0 until real docs arrive", name,
                )
                continue
            n = rt.calibrate_act_static([make_batch()])
            logger.info(
                "%s static int8 calibrated on %d docs + query (%d sites)",
                name, len(sample), n,
            )

        prompt = s1.runtime.prompts.get("query", "")
        tb1 = s1.tokenizer.encode_batch(
            [prompt + q for q in queries], cfg.stage1_max_text_length
        )
        max_q2 = min(
            self.stage2.runtime.head_cfg.query_max_len,
            cfg.stage2_max_seq_length,
        )
        tb2 = self.stage2.tokenizer.encode_batch(
            list(queries), max_q2, buckets=(max_q2,)
        )
        t3 = self.stage3.tokenizer
        q3_rows = np.zeros((nb, self.q_reserve), dtype=np.int32)
        q3_lens = np.zeros(nb, dtype=np.int32)
        for r, q in enumerate(queries):
            q3 = [t3.cls_id] + t3.tokenize_to_ids(q)[: self.q_reserve - 2] \
                + [t3.sep_id]
            q3_rows[r, : len(q3)] = q3
            q3_lens[r] = len(q3)

        kb = cfg.stage1_bm25_top_k
        bm_ids = np.full((nb, kb), -1, dtype=np.int32)
        bm_scores = np.zeros((nb, kb), dtype=np.float32)
        use_bm25 = (
            with_bm25 and s1.bm25 is not None and s1.bm25.corpus_size > 0
        )
        if use_bm25:
            deleted = getattr(s1, "deleted_ids", set())
            for r, q in enumerate(queries):
                sparse = [
                    (d, sc) for d, sc in s1.bm25.search(q, kb)
                    if d not in deleted
                ]
                for rank, (d, sc) in enumerate(sparse[:kb]):
                    bm_ids[r, rank], bm_scores[r, rank] = d, sc

        corpus, count, bias, scale, impl = s1.index.search_state()
        if self.mesh is not None:
            # shard_map in_specs are fixed pytrees: bias/scale must be
            # arrays (sharded like the corpus rows) even when unused
            if bias is None:
                bias = s1.index._del_mask
            if scale is None:
                ones = self._ones_scale
                if ones is None or ones.shape[0] != corpus.shape[0]:
                    ones = jax.device_put(
                        jnp.ones((corpus.shape[0],), dtype=jnp.float32),
                        jax.sharding.NamedSharding(
                            self.mesh, P(self.data_axis)
                        ),
                    )
                    self._ones_scale = ones
                scale = ones
        k1 = max(min(cfg.stage1_top_k, s1.index.capacity), 1)

        # Clustered (IVF-equivalent) stage-1 inside the funnel: probe
        # state rides as one extra arg tuple — the single-device program
        # probes directly, the shard-mapped one runs the distributed-IVF
        # local-probe + all-gather merge. fused_cluster_state() is None
        # whenever the probe can't serve, which leaves impl on the scan
        # exactly as before, so funnel eligibility never regresses.
        cl = None
        state = s1.index.fused_cluster_state(k1)
        if state is not None:
            impl = "clustered"
            cl = (
                state["n_probe"], state["tile_q"], state["kernel"],
                state["bias"] is not None,
                state["scales"] is not None,
                state["kernel"] == "pallas"
                and jax.default_backend() == "cpu",
            )
            d2 = self._cl_dummies()[3]
            cl_arrays = (
                state["blocked"], state["row_ids"],
                state["centroids"],
                state["bias"] if state["bias"] is not None else d2,
                state["scales"] if state["scales"] is not None else d2,
            )
        else:
            cl_arrays = self._cl_dummies()
        prep = {
            "params": (
                s1.runtime.params,
                self.stage2.runtime.params,
                self.stage3.runtime.params,
            ),
            "tb1": (
                jnp.asarray(tb1.input_ids), jnp.asarray(tb1.attn_mask),
                jnp.asarray(tb1.token_type_ids),
            ),
            "tb2": (jnp.asarray(tb2.input_ids), jnp.asarray(tb2.attn_mask)),
            # q3/bm stay HOST numpy: search() row-slices them per query
            # (free on np; on a device array each [0] is a compiled
            # dynamic_slice dispatch — 4 extra round-trips per query
            # through a remote-attached chip). jit device-puts them at
            # dispatch either way.
            "q3_rows": q3_rows,
            "q3_lens": q3_lens,
            "index_state": (corpus, count, bias, scale),
            "bm": (bm_ids, bm_scores),
            "caches": (
                tuple(self.stage2._cache.state()),
                *self.doc_tokens.state(),
            ),
            "statics": dict(
                k1=k1,
                k2=max(min(cfg.stage2_top_k, k1), 1),
                impl=impl,
                use_bm25=use_bm25,
                d3b=self._d3_budget(),
                d2b=self._d2_budget(),
            ),
        }
        prep["caches"] = prep["caches"] + (cl_arrays,)
        prep["statics"]["cl"] = cl
        return prep

    def _cl_dummies(self):
        """Cached placeholder cluster-arg tuple for non-clustered
        dispatches (the arg slot exists on every call; a non-clustered
        trace never reads it) — element [3] doubles as the bias/scales
        stand-in when the real view has neither. On a mesh the dummies
        carry one block per shard so the cl in_specs shard them
        cleanly. Cached: jit keys on shape/dtype only, and a fresh
        host->device put per search would be pure dispatch overhead."""
        d = getattr(self, "_cl_dum", None)
        if d is None:
            if self.mesh is None:
                d2 = jnp.zeros((1, 1), jnp.float32)
                d = (
                    jnp.zeros((1, 1, 1), jnp.float32),
                    jnp.full((1, 1), -1, jnp.int32),
                    jnp.zeros((1, 1), jnp.float32),
                    d2, d2,
                )
            else:
                from jax.sharding import NamedSharding

                S = self.mesh.shape[self.data_axis]
                sh3 = NamedSharding(self.mesh, P(self.data_axis, None, None))
                sh2 = NamedSharding(self.mesh, P(self.data_axis, None))
                d2 = jax.device_put(jnp.zeros((S, 1), jnp.float32), sh2)
                d = (
                    jax.device_put(jnp.zeros((S, 1, 1), jnp.float32), sh3),
                    jax.device_put(jnp.full((S, 1), -1, jnp.int32), sh2),
                    jax.device_put(jnp.zeros((S, 1), jnp.float32), sh2),
                    d2, d2,
                )
            self._cl_dum = d
        return d

    def search(self, query: str, top_k: Optional[int] = None) -> dict[str, Any]:
        t0 = time.time()
        p = self._prepare([query])
        # ONE device->host transfer for everything the host needs —
        # fetched BEFORE the clock stops (dispatch is async; the relay
        # even acks before completion, so timing must include the fetch)
        payload = np.asarray(self._fn(
            *p["params"], *p["tb1"], *p["tb2"],
            p["q3_rows"][0], p["q3_lens"][0],
            *p["index_state"],
            p["bm"][0][0], p["bm"][1][0],
            *p["caches"],
            **p["statics"],
        ))
        total_time = time.time() - t0
        k1, k2 = p["statics"]["k1"], p["statics"]["k2"]
        return self._format(
            query, top_k, *self._unpack(payload, k1, k2), total_time
        )

    @staticmethod
    def _unpack(payload: np.ndarray, k1: int, k2: int):
        """Split a packed payload row back into (f_s, f_i, top2_s, ids2,
        s1_of_2, s3_scores)."""
        ids = payload[: k1 + k2].view(np.int32)
        f_i, ids2 = ids[:k1], ids[k1:]
        floats = payload[k1 + k2 :]
        return (
            floats[:k1], f_i,
            floats[k1 : k1 + k2], ids2,
            floats[k1 + k2 : k1 + 2 * k2],
            floats[k1 + 2 * k2 :],
        )

    def search_batch(
        self, queries: Sequence[str], top_k: Optional[int] = None
    ) -> list[dict[str, Any]]:
        """All queries in ONE device dispatch (lax.map over the fused
        funnel) + one fetch — the host never round-trips between
        queries."""
        return self.search_batch_dispatch(queries, top_k)()

    def search_batch_dispatch(
        self, queries: Sequence[str], top_k: Optional[int] = None
    ):
        """Two-phase batched search for pipelined serving. Phase 1
        (this call) does host prep + the ONE device dispatch and
        returns immediately — the relay acks dispatches before the
        device finishes. The returned closure is phase 2: the blocking
        device->host fetch + host formatting, safe to run on a separate
        fetch thread so the NEXT batch's prep/dispatch overlaps this
        batch's fetch round-trip (~30 ms over the tunnel). The closure
        only reads: the dispatched array, host doc/metadata lists
        (append-only/tombstoned), and per-call locals."""
        t0 = time.time()
        n_real = len(queries)
        # Pad the batch to a bucket so remainder chunks don't retrace
        # the whole three-model program (waste bounded at <2x compute,
        # compiles bounded at len(buckets)).
        for b in (1, 2, 4, 8, 16, 32, 64, 128):
            if b >= n_real:
                break
        # Hybrid mesh: the batch axis shard_maps over "dcn", so the
        # padded batch must divide into ndcn groups (buckets are powers
        # of two; rounds up for tiny batches, non-power-of-two slice
        # counts, and >largest-bucket overflow batches).
        if self.ndcn > 1:
            b = max(b, n_real)
            b = ((b + self.ndcn - 1) // self.ndcn) * self.ndcn
        queries = list(queries) + [""] * max(b - n_real, 0)
        # Pad queries get real encoder embeddings; the clustered probe
        # max-pools centroid scores over each tile, so without this
        # mask a "" pad could steer a tile's shared probe set away from
        # the staged (unpadded) batch's blocks. Scan impls ignore it.
        real_mask = np.zeros(len(queries), dtype=np.float32)
        real_mask[:n_real] = 1.0

        p = self._prepare(queries)
        out = self._fn_batch(
            *p["params"], *p["tb1"], *p["tb2"],
            p["q3_rows"], p["q3_lens"], real_mask,
            *p["index_state"], *p["bm"], *p["caches"],
            **p["statics"],
        )
        k1, k2 = p["statics"]["k1"], p["statics"]["k2"]

        def finalize() -> list[dict[str, Any]]:
            payloads = np.asarray(out)  # the one blocking fetch
            per_query = (time.time() - t0) / max(n_real, 1)
            return [
                self._format(
                    q, top_k, *self._unpack(payloads[r], k1, k2), per_query
                )
                for r, q in enumerate(queries[:n_real])
            ]

        return finalize

    def device_time_probe(
        self, query: str, iters: int = 32, trace_dir: str | None = None,
    ) -> dict[str, float]:
        """Estimate pure device time per query: dispatch the fused
        program ``iters`` times and block only on the LAST result.
        Dispatches queue in-order on the device stream, so
        (total - one round trip) / iters bounds the per-query device
        execution time — robust against relays that ack dispatches
        before completion (BENCH_NOTES.md method note).

        ``trace_dir``: additionally capture a ``jax.profiler`` trace of
        the dispatch loop there — parse it with
        ``scripts/trace_ops.py::device_total_us`` for the per-program
        device-time ground truth (the chained reading above includes
        relay throttling gaps; the trace total reproduces to ~1 us)."""
        import contextlib
        import time as _t

        p = self._prepare([query], with_bm25=False)
        args = (
            *p["params"], *p["tb1"], *p["tb2"],
            p["q3_rows"][0], p["q3_lens"][0],
            *p["index_state"],
            p["bm"][0][0], p["bm"][1][0],
            *p["caches"],
        )
        # _prepare keeps q3/bm as HOST numpy (free row slicing in
        # serving); here the same args re-dispatch every iteration, so
        # device_put them ONCE or each loop pays an H2D that serializes
        # into the chain and inflates the reading.
        args = jax.tree.map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            args,
        )
        kw = p["statics"]
        np.asarray(self._fn(*args, **kw))  # warm
        ctx = (
            jax.profiler.trace(trace_dir) if trace_dir
            else contextlib.nullcontext()
        )
        with ctx:
            t0 = _t.perf_counter()
            out = None
            for _ in range(iters):
                out = self._fn(*args, **kw)
            np.asarray(out)  # block on the last dispatch only
            total = _t.perf_counter() - t0
        return {"total_s": total, "per_query_ms": total / iters * 1000.0}

    def _format(
        self, query, top_k, f_s, f_i, top2_s, ids2, s1_of_2, s3_scores,
        total_time,
    ) -> dict[str, Any]:
        cfg = self.config
        docs = self.stage1.documents
        meta = self.stage1.doc_metadata
        valid2 = ids2 >= 0

        # min-max normalization over the scored set (stage-3 parity,
        # src/stage3_reranker.py:212-228) — monotonic, order unchanged
        s3 = s3_scores.astype(np.float64)
        if cfg.stage3_normalize_scores and valid2.any():
            vals = s3[valid2]
            lo, hi = float(vals.min()), float(vals.max())
            s3[valid2] = (vals - lo) / (hi - lo) if hi > lo else 0.0

        def base(doc_id, s1_score):
            return {
                "doc_id": int(doc_id),
                "document": docs[int(doc_id)],
                "score": float(s1_score),
                "stage1_score": float(s1_score),
                "metadata": meta[int(doc_id)],
            }

        order = np.argsort(-s3, kind="stable")
        results = []
        for pos in order[: cfg.stage3_top_k]:
            if not valid2[pos]:
                continue
            r = base(ids2[pos], s1_of_2[pos])
            r["stage2_score"] = float(top2_s[pos])
            r["stage3_score"] = float(s3[pos])
            r["stage"] = "stage3"
            results.append(r)
        if top_k is not None:
            results = results[:top_k]

        keep = cfg.save_intermediate_results
        stage1_results, stage2_results = [], []
        if keep:
            for doc_id, sc in zip(f_i, f_s):
                if doc_id >= 0 and np.isfinite(sc):
                    r = base(doc_id, sc)
                    r["stage"] = "stage1"
                    stage1_results.append(r)
            for pos in range(len(ids2)):
                if valid2[pos]:
                    r = base(ids2[pos], s1_of_2[pos])
                    r["stage2_score"] = float(top2_s[pos])
                    r["stage"] = "stage2"
                    stage2_results.append(r)

        timing = {
            "stage1_time": None,
            "stage2_time": None,
            "stage3_time": None,
            "total_time": total_time,
            "fused": True,
        }
        return {
            "query": query,
            "results": results,
            "stage1_results": stage1_results,
            "stage2_results": stage2_results,
            "timing": timing,
        }

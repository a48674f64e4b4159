"""HBM-resident dense vector index (the FAISS replacement).

TPU-native design (SURVEY.md §2.6, §7 "hard parts"):

* Fixed-capacity device buffer [capacity, dim] + a validity ``count`` —
  static shapes for XLA; invalid tail masked to -inf inside the top-k.
* Growth by capacity doubling + re-``device_put`` (amortised O(1); the
  reference instead re-trains FAISS IVF or appends, stage1_retriever.py
  :256-283,310-313).
* Exact search = one MXU matmul + native top-k (ops/topk.py); at v5e-8
  scale exact beats IVF recall at equal memory (SURVEY.md §2.6).
* Multi-device: the document axis is sharded over a 1-D mesh axis; each
  device scans its shard, takes a local top-k, and the results are
  all-gathered and merged inside ``shard_map`` — collectives ride ICI.
* Persistence: embeddings as ``.npz`` + JSON sidecar — never pickle
  (SURVEY.md §5.4).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tristage_rag_tpu.ops.topk import masked_approx_topk, masked_topk, NEG_INF

# Corpus size beyond which "auto" switches from exact to approximate
# top-k (recall 0.95; 77x faster at 1M docs — see ops/topk.py).
APPROX_THRESHOLD = 1 << 18

# Below this many blocks there is nothing to skip — the clustered path
# falls back to the exact scan.
MIN_CLUSTER_BLOCKS = 4

MIN_CAPACITY = 1024


def _round_capacity(n: int, multiple: int) -> int:
    cap = MIN_CAPACITY
    while cap < n:
        cap *= 2
    return ((cap + multiple - 1) // multiple) * multiple


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf: jax.Array, rows: jax.Array, offset: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, rows.astype(buf.dtype), (offset, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_vec(buf: jax.Array, vals: jax.Array, offset: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, vals.astype(buf.dtype), (offset,))


@jax.jit
def _quantize_rows(rows: jax.Array):
    """Symmetric per-row int8 quantization — the shared contract lives
    in index/token_cache.py::symmetric_int8 (one definition for the
    index and the token cache)."""
    from tristage_rag_tpu.index.token_cache import symmetric_int8

    return symmetric_int8(rows)


@functools.partial(
    jax.jit,
    static_argnames=("k", "axis", "mesh", "impl", "recall_target"),
    donate_argnums=(),
)
def _sharded_topk(
    queries, corpus, count, mask, scale, k: int, mesh: Mesh, axis: str,
    impl: str = "exact", recall_target: float = 0.95,
):
    """Document-sharded top-k: local scan + all-gather merge.

    ``impl="approx"`` runs the TPU PartialReduce (``approx_max_k``) on
    each shard before the exact merge — the same per-shard semantics
    the sharded fused funnel uses (engine/fused.py), so staged and
    fused mesh searches stay ranking-identical at any corpus size."""

    def local(q, c, cnt, m, sc):
        shard_rows = c.shape[0]
        base = jax.lax.axis_index(axis) * shard_rows
        local_count = jnp.clip(cnt[0] - base, 0, shard_rows)
        if impl == "approx":
            s, idx = masked_approx_topk(
                q, c, local_count, k=min(k, shard_rows), bias=m, scale=sc,
                recall_target=recall_target,
            )
        else:
            s, idx = masked_topk(
                q, c, local_count, k=min(k, shard_rows), bias=m, scale=sc
            )
        idx = jnp.where(idx >= 0, idx + base, -1)
        s_all = jax.lax.all_gather(s, axis)  # [ndev, B, k']
        i_all = jax.lax.all_gather(idx, axis)
        ndev = s_all.shape[0]
        b = q.shape[0]
        s_flat = jnp.moveaxis(s_all, 0, 1).reshape(b, -1)
        i_flat = jnp.moveaxis(i_all, 0, 1).reshape(b, -1)
        top_s, pos = jax.lax.top_k(s_flat, k)
        top_i = jnp.take_along_axis(i_flat, pos, axis=1)
        top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
        return top_s, top_i

    if scale is None:
        scale = jnp.ones((corpus.shape[0],), dtype=jnp.float32)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, corpus, count, mask, scale)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "n_probe", "tile_q", "mesh", "axis", "impl", "interpret",
        "has_bias", "has_scales",
    ),
)
def _sharded_blockskip(
    queries, blocked, row_ids, centroids, bias, scales,
    k: int, n_probe: int, tile_q: int, mesh: Mesh, axis: str,
    impl: str, interpret: bool, has_bias: bool, has_scales: bool,
):
    """Block-sharded clustered top-k: local probe + all-gather merge.

    The blocked view rides the mesh with its BLOCK axis sharded
    (round-robin interleaved at build, so the cluster-sorted block
    order — similar clusters adjacent — spreads a query's winning
    blocks evenly over devices). Each device probes ``n_probe`` of its
    local blocks with the single-device kernel (ops/blockskip.py, XLA
    or Pallas per ``impl``), takes a local top-k over global row ids,
    and the merge is the same all-gather + exact top-k the sharded
    scan uses — collectives ride ICI, the probed pools never leave
    their device. Distributed-IVF semantics: per-shard nprobe, global
    merge (the reference's single-GPU FAISS IVF has no analogue;
    nlist/nprobe map per stage1_retriever.py:264-273).
    """
    from tristage_rag_tpu.ops.blockskip import blockskip_topk

    def local(q, blk, rid, cen, bi, sc):
        s, i = blockskip_topk(
            q, blk, rid, cen, k=k, n_probe=n_probe, tile_q=tile_q,
            bias=bi if has_bias else None,
            scales=sc if has_scales else None,
            impl=impl, interpret=interpret,
        )
        s_all = jax.lax.all_gather(s, axis)  # [ndev, B, k]
        i_all = jax.lax.all_gather(i, axis)
        b = q.shape[0]
        s_flat = jnp.moveaxis(s_all, 0, 1).reshape(b, -1)
        i_flat = jnp.moveaxis(i_all, 0, 1).reshape(b, -1)
        top_s, pos = jax.lax.top_k(s_flat, k)
        top_i = jnp.take_along_axis(i_flat, pos, axis=1)
        top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
        return top_s, top_i

    # shard_map operands must be arrays: absent bias/scales ride as
    # zero-size dummies, gated out by the static has_* flags.
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(axis, None, None), P(axis, None), P(axis, None),
            P(axis, None), P(axis, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, blocked, row_ids, centroids, bias, scales)


class _ClusterView:
    """Packed clustered view of the corpus (ops/blockskip.py layout).

    Holds the cluster-ordered block copy + probe centroids. ``pos``
    maps an original row id to its flat packed slot so tombstones laid
    after the build can be mirrored into ``bias`` without a repack.
    On a mesh the block axis is sharded (round-robin interleaved so a
    query's winning blocks spread evenly over devices) and ``bias``
    keeps the same sharding.
    """

    def __init__(self, blocked, row_ids, centroids, bias, scales,
                 order: np.ndarray, built_count: int, block_size: int,
                 bias_sharding: Optional[NamedSharding] = None):
        self.blocked = blocked          # [nb, bs, d] device
        self.row_ids = jnp.asarray(row_ids)  # [nb, bs] i32, -1 pad
        self.centroids = centroids      # [nb, d] f32 device
        self.bias = bias                # [nb, bs] f32 device or None
        self.scales = scales            # [nb, bs] f32 device or None
        self.order = order              # [built_count] np permutation
        self.built_count = built_count
        self.block_size = block_size
        self.bias_sharding = bias_sharding
        # Derive id -> packed slot from row_ids (layout-agnostic: holds
        # for both the contiguous and the shard-interleaved block order).
        rid = np.asarray(row_ids).reshape(-1)
        valid = rid >= 0
        pos = np.empty(built_count, dtype=np.int64)
        pos[rid[valid]] = np.nonzero(valid)[0]
        self.pos = pos

    def tombstone(self, ids) -> None:
        nb, bs = self.row_ids.shape
        if self.bias is None:
            self.bias = jnp.zeros((nb, bs), dtype=jnp.float32)
        slots = self.pos[np.asarray(ids, dtype=np.int64)]
        flat = self.bias.reshape(-1)
        flat = flat.at[jnp.asarray(slots)].set(float(NEG_INF))
        bias = flat.reshape(nb, bs)
        if self.bias_sharding is not None:
            bias = jax.device_put(bias, self.bias_sharding)
        self.bias = bias


class DenseIndex:
    """Growable exact inner-product index over a device buffer."""

    def __init__(
        self,
        dim: int,
        dtype: str = "float32",
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
        capacity: int = MIN_CAPACITY,
        # "auto" | "exact" | "approx" | "pallas" | "clustered"
        search_impl: str = "auto",
        recall_target: float = 0.95,
        cluster_block_size: int = 1024,
        cluster_n_probe: int = 32,
        cluster_tile_q: int = 8,
        cluster_iters: int = 10,
        cluster_factor: int = 4,
        cluster_kernel: str = "auto",  # "auto" | "xla" | "pallas"
    ):
        self.dim = dim
        self.dtype = jnp.dtype(dtype)
        self.mesh = mesh
        self.data_axis = data_axis
        self.search_impl = search_impl
        self.recall_target = recall_target
        self.cluster_block_size = int(cluster_block_size)
        self.cluster_n_probe = int(cluster_n_probe)
        self.cluster_tile_q = int(cluster_tile_q)
        self.cluster_iters = int(cluster_iters)
        self.cluster_factor = int(cluster_factor)
        self.cluster_kernel = cluster_kernel
        # Clustered (IVF-equivalent) view: built lazily by
        # build_clusters()/first clustered search; staled by any add
        # (built_count != count) and rebuilt on the next search.
        self._cluster = None
        self._shards = 1 if mesh is None else mesh.shape[data_axis]
        self.capacity = _round_capacity(capacity, self._shards * 8)
        self.count = 0
        self._buf = self._alloc(self.capacity)
        # Tombstone deletion: deleted rows keep their slot (static
        # shapes) but carry a -inf additive mask so they can never
        # surface in a top-k. BASELINE.json's north star calls for
        # incremental add/delete; the reference's FAISS path has no
        # delete at all.
        self._deleted: set[int] = set()
        self._del_mask = self._alloc_mask(self.capacity)
        # int8 mode: symmetric per-row quantization; scales dequantize
        # inside the fused score matmul (ops/topk.py::_masked_scores).
        # Halves stage-1 HBM traffic at ~0.4% cosine error.
        self.quantized = self.dtype == jnp.int8
        self._scales = self._alloc_scales(self.capacity) if self.quantized else None

    # ---- device buffer management ---------------------------------------

    def _sharding(self) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(self.data_axis, None))

    def _alloc(self, capacity: int) -> jax.Array:
        buf = jnp.zeros((capacity, self.dim), dtype=self.dtype)
        sh = self._sharding()
        return jax.device_put(buf, sh) if sh is not None else buf

    def _mask_sharding(self) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(self.data_axis))

    def _alloc_mask(self, capacity: int) -> jax.Array:
        mask = jnp.zeros((capacity,), dtype=jnp.float32)
        sh = self._mask_sharding()
        return jax.device_put(mask, sh) if sh is not None else mask

    def _alloc_scales(self, capacity: int) -> jax.Array:
        s = jnp.zeros((capacity,), dtype=jnp.float32)
        sh = self._mask_sharding()
        return jax.device_put(s, sh) if sh is not None else s

    def _grow(self, needed: int) -> None:
        new_cap = _round_capacity(needed, self._shards * 8)
        if new_cap <= self.capacity:
            return
        old = self._buf[: self.count]  # stays on device
        old_scales = (
            self._scales[: self.count] if self.quantized else None
        )
        self.capacity = new_cap
        self._buf = self._alloc(new_cap)
        if self.quantized:
            self._scales = self._alloc_scales(new_cap)
        if self.count:
            self._write(old, 0)
            if self.quantized:
                self._write_scales(old_scales, 0)
        self._del_mask = self._alloc_mask(new_cap)
        if self._deleted:
            self._apply_tombstones(sorted(self._deleted))

    def _apply_tombstones(self, ids) -> None:
        ids_arr = jnp.asarray(np.asarray(ids, dtype=np.int32))
        mask = self._del_mask.at[ids_arr].set(float(NEG_INF))
        sh = self._mask_sharding()
        self._del_mask = jax.device_put(mask, sh) if sh is not None else mask

    def _write(self, rows, offset: int) -> None:
        buf = _write_rows(self._buf, jnp.asarray(rows), jnp.int32(offset))
        sh = self._sharding()
        self._buf = jax.device_put(buf, sh) if sh is not None else buf

    def _write_scales(self, scales, offset: int) -> None:
        s = _write_vec(self._scales, jnp.asarray(scales), jnp.int32(offset))
        sh = self._mask_sharding()
        self._scales = jax.device_put(s, sh) if sh is not None else s

    def _impl(self) -> str:
        """Resolve the search implementation for the current corpus.

        "auto": exact XLA up to APPROX_THRESHOLD docs, then approximate
        (recall_target) — same spirit as the reference switching from
        IndexFlatIP to IVF beyond 1000 docs (stage1_retriever.py:
        256-283), with an explicit recall contract. "pallas" selects
        the fused exact kernel (Mosaic TPU backends only; slow remote
        compiles on tunneled dev TPUs). TRISTAGE_SEARCH_IMPL env var
        overrides.
        """
        import os

        impl = os.environ.get("TRISTAGE_SEARCH_IMPL", self.search_impl)
        if impl in ("exact", "xla"):
            return "exact"
        if impl in ("approx", "pallas", "pallas-bank"):
            return impl
        if impl == "clustered":
            # IVF-equivalent block skipping needs enough blocks to skip
            # (per shard, on a mesh); otherwise behave like "auto".
            enough = self.count >= (
                MIN_CLUSTER_BLOCKS * self.cluster_block_size * self._shards
            )
            if enough:
                return "clustered"
        return "approx" if self.count >= APPROX_THRESHOLD else "exact"

    # ---- clustered (IVF-equivalent) view ---------------------------------

    def build_clusters(self, order: Optional[np.ndarray] = None) -> None:
        """(Re)build the clustered block view of the current corpus.

        TPU-native FAISS-IVF equivalent (reference trains IVF nlist=100
        and probes nprobe=10, src/stage1_retriever.py:264-273): device
        spherical k-means orders the corpus, rows pack into fixed
        ``cluster_block_size`` blocks, and searches scan only the
        ``cluster_n_probe`` blocks whose centroid matches the query
        tile (ops/blockskip.py). ``order`` short-circuits k-means with
        a precomputed permutation (persistence reload path).
        """
        from tristage_rag_tpu.ops.blockskip import (
            block_centroids, pack_blocks,
        )

        n = self.count
        if n < MIN_CLUSTER_BLOCKS * self.cluster_block_size * self._shards:
            self._cluster = None
            return
        rows = self._buf[:n]
        if order is None:
            from tristage_rag_tpu.ops.cluster import (
                cluster_pack_order, spherical_kmeans,
            )

            nb = -(-n // self.cluster_block_size)
            n_clusters = min(n, max(nb, self.cluster_factor * nb))
            if self.quantized:
                # int8 codes + per-row scales go straight in: rows
                # dequantize per chunk inside the device loop, so no
                # full-precision corpus copy materializes (the 500k
                # single-chip build transient — VERDICT r4 weak-3)
                cents, assign = spherical_kmeans(
                    rows, n_clusters, n_iter=self.cluster_iters, seed=0,
                    scales=self._scales[:n],
                )
            else:
                cents, assign = spherical_kmeans(
                    rows.astype(jnp.bfloat16), n_clusters,
                    n_iter=self.cluster_iters, seed=0,
                )
            order = cluster_pack_order(np.asarray(cents), assign)
        else:
            order = np.asarray(order, dtype=np.int64)
            if order.shape != (n,) or not np.array_equal(
                np.sort(order), np.arange(n)
            ):
                raise ValueError(
                    "order must be a permutation of the current corpus"
                )
        blocked, row_ids = pack_blocks(rows, order, self.cluster_block_size)
        scales_blk = None
        if self.quantized:
            packed_scales, _ = pack_blocks(
                self._scales[:n, None], order, self.cluster_block_size
            )
            scales_blk = packed_scales[..., 0]
        bias_sharding = None
        if self.mesh is not None and self._shards > 1:
            # Shard the view over its BLOCK axis, round-robin
            # interleaved: cluster-sorted packing puts similar clusters
            # in adjacent blocks, so contiguous splitting would hand a
            # query's whole winning neighbourhood to one device while
            # the per-shard probe budget is fixed. Interleaving spreads
            # it evenly — distributed-IVF layout, derived at build so
            # reloads under a different mesh shape re-derive it.
            S = self._shards
            nb = blocked.shape[0]
            nbl = -(-nb // S)
            pad = nbl * S - nb
            if pad:
                bs = self.cluster_block_size
                blocked = jnp.concatenate(
                    [blocked, jnp.zeros((pad, bs, self.dim), blocked.dtype)]
                )
                row_ids = np.concatenate(
                    [np.asarray(row_ids),
                     np.full((pad, bs), -1, np.int32)]
                )
                if scales_blk is not None:
                    scales_blk = jnp.concatenate(
                        [scales_blk, jnp.zeros((pad, bs), scales_blk.dtype)]
                    )
            # new block j = s * nbl + i holds old block i * S + s
            perm = np.arange(nbl * S).reshape(nbl, S).T.reshape(-1)
            perm_j = jnp.asarray(perm, dtype=jnp.int32)
            sh3 = NamedSharding(self.mesh, P(self.data_axis, None, None))
            sh2 = NamedSharding(self.mesh, P(self.data_axis, None))
            blocked = jax.device_put(jnp.take(blocked, perm_j, axis=0), sh3)
            row_ids = np.asarray(row_ids)[perm]
            if scales_blk is not None:
                scales_blk = jax.device_put(
                    jnp.take(scales_blk, perm_j, axis=0), sh2
                )
            bias_sharding = sh2
        centroids = block_centroids(
            blocked.astype(jnp.float32)
            if scales_blk is None
            else blocked.astype(jnp.float32) * scales_blk[..., None],
            row_ids,
        )
        if bias_sharding is not None:
            centroids = jax.device_put(centroids, bias_sharding)
        view = _ClusterView(
            blocked, row_ids, centroids, None, scales_blk,
            order, n, self.cluster_block_size,
            bias_sharding=bias_sharding,
        )
        if bias_sharding is not None:
            view.row_ids = jax.device_put(view.row_ids, bias_sharding)
        if self._deleted:
            view.tombstone(sorted(self._deleted))
        self._cluster = view

    def _resolved_cluster_kernel(self) -> str:
        """``auto`` -> Pallas gather-matmul on accelerators, XLA on CPU.

        Measured (BENCH_NOTES round-3 Pallas clustered sweep, 1M x 384
        on TPU): the kernel wins every batch/recall point — 0.25 ms vs
        the XLA probe path's 5.2 ms at batch 1, exact recall at 1.16 ms
        (2x the approx full scan). On CPU the kernel would run in
        Pallas interpret mode (orders of magnitude slower), so auto
        keeps the XLA gather path there.
        """
        if self.cluster_kernel == "auto":
            return "xla" if jax.default_backend() == "cpu" else "pallas"
        return self.cluster_kernel

    def _clustered_search_sharded(self, q: jnp.ndarray, k: int):
        """Distributed-IVF search over the block-sharded view; None =
        caller falls back to the sharded scan."""
        if self._cluster is None or self._cluster.built_count != self.count:
            self.build_clusters()
        cv = self._cluster
        if cv is None:
            return None
        nb = cv.row_ids.shape[0]
        S = self._shards
        nbl = nb // S  # build pads nb to a multiple of S
        # Per-shard probe budget: n_probe is the GLOBAL scan knob (same
        # meaning as single-device); each shard probes its share, raised
        # so k always fits the local probed pool.
        np_local = max(
            -(-self.cluster_n_probe // S), -(-k // cv.block_size) + 1
        )
        if np_local > nbl:
            return None  # k (or the probe floor) exceeds a shard's blocks
        impl = "xla"
        interpret = False
        if self._resolved_cluster_kernel() == "pallas":
            # blockskip pads small batches up to the kernel's sublane
            # tiling itself, so any batch routes through the kernel.
            impl = "pallas"
            interpret = jax.default_backend() == "cpu"
        bs = cv.block_size
        bias = cv.bias
        scales = cv.scales
        dummy = jnp.zeros((0, bs), jnp.float32)
        return _sharded_blockskip(
            q, cv.blocked, cv.row_ids, cv.centroids,
            bias if bias is not None else dummy,
            scales if scales is not None else dummy,
            k=k, n_probe=np_local, tile_q=self.cluster_tile_q,
            mesh=self.mesh, axis=self.data_axis,
            impl=impl, interpret=interpret,
            has_bias=bias is not None, has_scales=scales is not None,
        )

    def _clustered_search(self, q: jnp.ndarray, k: int):
        from tristage_rag_tpu.ops.blockskip import blockskip_topk

        if self._cluster is None or self._cluster.built_count != self.count:
            self.build_clusters()
        cv = self._cluster
        if cv is None:  # corpus shrank below the clustering floor
            return None
        nb = cv.row_ids.shape[0]
        if k > nb * cv.block_size:
            return None  # k exceeds even a full probe — exact fallback
        # k must fit the probed pool: grow the probe set rather than
        # silently returning fewer results.
        n_probe = min(
            nb, max(self.cluster_n_probe, -(-k // cv.block_size) + 1)
        )
        if self._resolved_cluster_kernel() == "pallas":
            # blockskip pads small batches up to the kernel's sublane
            # tiling itself, so any batch routes through the kernel.
            return blockskip_topk(
                q, cv.blocked, cv.row_ids, cv.centroids,
                k=k, n_probe=n_probe, tile_q=self.cluster_tile_q,
                bias=cv.bias, scales=cv.scales, impl="pallas",
                interpret=jax.default_backend() == "cpu",
            )
        return blockskip_topk(
            q, cv.blocked, cv.row_ids, cv.centroids,
            k=k, n_probe=n_probe, tile_q=self.cluster_tile_q,
            bias=cv.bias, scales=cv.scales,
        )

    # ---- public API ------------------------------------------------------

    def add(self, embeddings, scales=None) -> np.ndarray:
        """Append [n, dim] rows; returns their assigned int64 ids.

        Accepts numpy OR device (jax) arrays — encoder outputs can flow
        into the index without a device->host->device round-trip. In
        quantized mode, float input is quantized here; pre-quantized
        int8 rows may be passed with their per-row ``scales`` (default
        1.0 — never the zero-initialized buffer, which would silently
        score those rows as 0).
        """
        if not isinstance(embeddings, jax.Array):
            embeddings = np.asarray(embeddings)
        if embeddings.ndim != 2 or embeddings.shape[1] != self.dim:
            raise ValueError(
                f"expected [n, {self.dim}] embeddings, got {embeddings.shape}"
            )
        n = embeddings.shape[0]
        if n == 0:
            return np.empty(0, dtype=np.int64)
        self._grow(self.count + n)
        if self.quantized and np.dtype(getattr(embeddings, "dtype", None)) != np.int8:
            q, scales = _quantize_rows(jnp.asarray(embeddings))
            self._write(q, self.count)
            self._write_scales(scales, self.count)
        elif self.quantized:
            self._write(embeddings, self.count)
            if scales is None:
                scales = jnp.ones((n,), dtype=jnp.float32)
            else:
                scales = jnp.asarray(scales, dtype=jnp.float32)
                if scales.shape != (n,):
                    raise ValueError(
                        f"expected [{n}] per-row scales, got {scales.shape}"
                    )
            self._write_scales(scales, self.count)
        else:
            self._write(embeddings, self.count)
        ids = np.arange(self.count, self.count + n, dtype=np.int64)
        self.count += n
        return ids

    def delete(self, ids) -> int:
        """Tombstone rows so they never appear in results. Slots are
        not reclaimed (static shapes); ``compact()`` rebuilds. Returns
        the number of newly-deleted rows."""
        fresh = [
            int(i) for i in np.atleast_1d(np.asarray(ids, dtype=np.int64))
            if 0 <= int(i) < self.count and int(i) not in self._deleted
        ]
        if not fresh:
            return 0
        self._deleted.update(fresh)
        self._apply_tombstones(fresh)
        if self._cluster is not None:
            # mirror into the packed view for ids it has slots for;
            # later rows are not in the view and force a rebuild anyway
            in_view = [i for i in fresh if i < self._cluster.built_count]
            if in_view:
                self._cluster.tombstone(in_view)
        return len(fresh)

    @property
    def live_count(self) -> int:
        return self.count - len(self._deleted)

    @property
    def deleted_ids(self) -> set[int]:
        return set(self._deleted)

    def compact(self) -> np.ndarray:
        """Rebuild the buffer without tombstoned rows. Returns the old
        row index for each surviving new row (old_id = mapping[new_id])
        so callers can remap their doc stores."""
        keep = np.asarray(
            [i for i in range(self.count) if i not in self._deleted],
            dtype=np.int64,
        )
        rows = np.asarray(self._buf[: self.count])[keep]
        scales = (
            np.asarray(self._scales[: self.count])[keep]
            if self.quantized
            else None
        )
        self._deleted = set()
        self._cluster = None
        n = rows.shape[0]
        self.count = 0
        self._buf = self._alloc(self.capacity)
        self._del_mask = self._alloc_mask(self.capacity)
        if self.quantized:
            self._scales = self._alloc_scales(self.capacity)
        if n:
            self._write(rows, 0)
            if self.quantized:
                self._write_scales(scales, 0)
            self.count = n
        return keep

    def fused_cluster_state(self, k: int):
        """Device arrays for composing the clustered probe into the
        fused funnel (engine/fused.py) — the IVF-equivalent stage-1
        inside the single-dispatch program. Returns None whenever the
        clustered path cannot serve (impl not "clustered", corpus below
        the block floor, k exceeding the probed pool); callers then stay
        on the ``search_state()`` scan, so funnel eligibility never
        regresses. Mirrors ``search()``'s rebuild-on-stale semantics: a
        stale view (adds since the last build) re-runs k-means here, and
        the check is O(1) when fresh.

        On a mesh the arrays are the block-sharded distributed-IVF view
        (round-robin interleaved blocks) and ``n_probe`` is the
        PER-SHARD budget — the same split ``search()`` uses
        (``_clustered_search_sharded``), so staged and fused mesh
        searches probe identical pools."""
        if self._impl() != "clustered":
            return None
        if self._cluster is None or self._cluster.built_count != self.count:
            self.build_clusters()
        cv = self._cluster
        if cv is None:
            return None
        nb = cv.row_ids.shape[0]
        if k > nb * cv.block_size:
            return None
        if self.mesh is not None and self._shards > 1:
            S = self._shards
            nbl = nb // S  # build pads nb to a multiple of S
            n_probe = max(
                -(-self.cluster_n_probe // S), -(-k // cv.block_size) + 1
            )
            if n_probe > nbl:
                return None  # k/probe floor exceeds a shard's blocks
        else:
            n_probe = min(
                nb, max(self.cluster_n_probe, -(-k // cv.block_size) + 1)
            )
        return dict(
            blocked=cv.blocked,
            row_ids=cv.row_ids,
            centroids=cv.centroids,
            bias=cv.bias,          # None unless tombstones exist
            scales=cv.scales,      # None unless int8
            n_probe=n_probe,
            tile_q=self.cluster_tile_q,
            kernel=self._resolved_cluster_kernel(),
        )

    def search_state(self):
        """(corpus, count, bias, scale, impl) for building fused search
        jits — callers can compose encode+top-k into ONE dispatch
        (engine/stage1.py). bias is None when nothing is deleted;
        scale is None unless quantized."""
        bias = self._del_mask if self._deleted else None
        impl = self._impl()
        if impl == "clustered":
            # The fused-funnel composites score against the flat buffer;
            # clustered probing is a two-step-path optimization (like
            # pallas+int8 below). Keep composites on the masked scan.
            impl = "approx" if self.count >= APPROX_THRESHOLD else "exact"
        if impl == "pallas-bank":
            # The composites have no bank-kernel variant; mirror the
            # clustered downgrade so fused configs keep one dispatch.
            impl = "approx" if self.count >= APPROX_THRESHOLD else "exact"
        if impl == "pallas" and self.quantized:
            # The fused-funnel/fused-dispatch composites (the callers
            # of this method) have no int8-kernel variant yet; keep
            # them on the exact XLA composition so a pallas+int8
            # config still gets the single-dispatch funnel. The
            # two-step search() path below DOES run the int8 kernel.
            impl = "exact"
        return self._buf, jnp.int32(self.count), bias, self._scales, impl

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k. Returns (scores [B, k] f32, ids [B, k] i64; -1 pad)."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        k_eff = max(min(k, self.capacity), 1)
        q = jnp.asarray(queries)
        bias = self._del_mask if self._deleted else None
        impl = self._impl()
        if self.mesh is not None and self._shards > 1:
            out = (
                self._clustered_search_sharded(q, k_eff)
                if impl == "clustered"
                else None
            )
            if out is None:
                if impl == "clustered":  # fallback mirrors "auto"
                    impl = (
                        "approx" if self.count >= APPROX_THRESHOLD
                        else "exact"
                    )
                cnt = jnp.asarray([self.count], dtype=jnp.int32)
                out = _sharded_topk(
                    q, self._buf, cnt, self._del_mask, self._scales, k_eff,
                    self.mesh, self.data_axis,
                    impl="approx" if impl == "approx" else "exact",
                    recall_target=self.recall_target,
                )
            s, i = out
        elif impl == "clustered":
            out = self._clustered_search(q, k_eff)
            if out is None:  # below clustering floor — exact fallback
                out = masked_topk(
                    q, self._buf, jnp.int32(self.count), k=k_eff,
                    bias=bias, scale=self._scales,
                )
            s, i = out
        elif impl in ("pallas", "pallas-bank"):
            from tristage_rag_tpu.ops.pallas_topk import fused_matmul_topk

            # The fused kernel masks by count only; over-fetch by the
            # tombstone count and filter host-side (deletions are rare
            # relative to capacity).
            extra = min(len(self._deleted), self.capacity - k_eff)
            # "pallas-bank" = the transposed bank kernel at bank_top=2:
            # ~0.99 selection recall at 2.4-2.7x the exact-merge
            # kernel's QPS (BENCH_NOTES round 5) — the high-recall
            # high-throughput point on the kernel frontier.
            # blk2048 amortizes grid iterations at scale (BENCH_NOTES
            # round 5: 42.5k vs 31.8k QPS at 1M docs); small corpora
            # keep blk1024's auto bank sizing (fewer total banks at
            # fixed width would concentrate winners and cost recall)
            blk = (
                2048
                if self.capacity >= (1 << 18)
                and self.capacity % 2048 == 0
                else 1024
            )
            mode_kw = (
                dict(
                    mode="bankT", bank_top=2, block_size=blk,
                    # refuse (-> exact fallback below) when the bank
                    # candidate table cannot cover k — a small corpus
                    # would otherwise silently halve stage-1 recall
                    min_candidates=k_eff + extra,
                    **({"per_block_k": 16} if blk == 2048 else {}),
                )
                if impl == "pallas-bank" else {}
            )
            try:
                s, i = fused_matmul_topk(
                    q, self._buf, jnp.int32(self.count), k=k_eff + extra,
                    scales=(
                        self._scales[: self.capacity]
                        if self.quantized
                        else None
                    ),
                    # Mosaic is TPU-only; interpret keeps the forced-
                    # pallas path testable on the CPU suite.
                    interpret=jax.default_backend() == "cpu",
                    **mode_kw,
                )
            except ValueError:
                # corpus too small for this k's per-block margin — the
                # kernel refuses rather than silently dropping results
                s, i = masked_topk(
                    q, self._buf, jnp.int32(self.count), k=k_eff, bias=bias,
                    scale=self._scales,
                )
                extra = 0
            if self._deleted:
                s, i = np.asarray(s), np.asarray(i)
                out_s = np.full((s.shape[0], k_eff), -np.inf, np.float32)
                out_i = np.full((i.shape[0], k_eff), -1, np.int64)
                for r in range(s.shape[0]):
                    keep = [
                        (sv, iv) for sv, iv in zip(s[r], i[r])
                        if iv >= 0 and int(iv) not in self._deleted
                    ][:k_eff]
                    for c2, (sv, iv) in enumerate(keep):
                        out_s[r, c2], out_i[r, c2] = sv, iv
                s, i = out_s, out_i
        elif impl == "approx":
            s, i = masked_approx_topk(
                q, self._buf, jnp.int32(self.count), k=k_eff, bias=bias,
                scale=self._scales, recall_target=self.recall_target,
            )
        else:
            s, i = masked_topk(
                q, self._buf, jnp.int32(self.count), k=k_eff, bias=bias,
                scale=self._scales,
            )
        s, i = np.asarray(s), np.asarray(i, dtype=np.int64)
        if k_eff < k:  # pad out to requested k
            pad_s = np.full((s.shape[0], k - k_eff), -np.inf, dtype=s.dtype)
            pad_i = np.full((i.shape[0], k - k_eff), -1, dtype=i.dtype)
            s = np.concatenate([s, pad_s], axis=1)
            i = np.concatenate([i, pad_i], axis=1)
        return s, i

    def clear(self) -> None:
        self.count = 0
        self._cluster = None
        if self._deleted:
            self._deleted = set()
            self._del_mask = self._alloc_mask(self.capacity)

    # ---- persistence -----------------------------------------------------

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        arrays = {}
        if self.quantized:
            arrays["embeddings"] = np.asarray(self._buf[: self.count])
            arrays["scales"] = np.asarray(self._scales[: self.count])
        else:
            arrays["embeddings"] = np.asarray(
                self._buf[: self.count], dtype=np.float32
            )
        meta = {
            "dim": self.dim,
            "count": self.count,
            "dtype": str(np.dtype(self.dtype.name)),
            "deleted": sorted(self._deleted),
            "format": "tristage-dense-v1",
        }
        # Persist the clustered ordering (not the packed copy — it is
        # re-derived by one device gather on load, and k-means is the
        # only expensive part).
        if (
            self._cluster is not None
            and self._cluster.built_count == self.count
        ):
            arrays["cluster_order"] = self._cluster.order
            meta["cluster_block_size"] = self._cluster.block_size
        np.savez_compressed(path.with_suffix(".npz"), **arrays)
        path.with_suffix(".json").write_text(json.dumps(meta))

    @classmethod
    def load(
        cls,
        path: str | Path,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
        search_impl: str = "auto",
        recall_target: float = 0.95,
        **cluster_kwargs,
    ) -> "DenseIndex":
        path = Path(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        with np.load(path.with_suffix(".npz")) as z:
            emb = z["embeddings"]
            scales = z["scales"] if "scales" in z.files else None
            cluster_order = (
                z["cluster_order"] if "cluster_order" in z.files else None
            )
        idx = cls(
            dim=meta["dim"],
            dtype=meta["dtype"],
            mesh=mesh,
            data_axis=data_axis,
            capacity=max(meta["count"], MIN_CAPACITY),
            search_impl=search_impl,
            recall_target=recall_target,
            **cluster_kwargs,
        )
        if idx.quantized and scales is not None:
            # restore raw int8 values + scales (no double quantization)
            n = emb.shape[0]
            if n:
                idx._grow(n)
                idx._write(emb, 0)
                idx._write_scales(scales, 0)
                idx.count = n
        else:
            idx.add(emb)
        if (
            cluster_order is not None
            and mesh is None
            and meta.get("cluster_block_size") == idx.cluster_block_size
            and idx.count >= MIN_CLUSTER_BLOCKS * idx.cluster_block_size
        ):
            idx.build_clusters(order=cluster_order)
        if meta.get("deleted"):
            idx.delete(meta["deleted"])
        return idx

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


class DenseIndex:
    """Growable exact inner-product index over a device buffer."""

    def __init__(
        self,
        dim: int,
        dtype: str = "float32",
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
        capacity: int = MIN_CAPACITY,
        search_impl: str = "auto",  # "auto" | "exact" | "approx" | "pallas"
        recall_target: float = 0.95,
    ):
        self.dim = dim
        self.dtype = jnp.dtype(dtype)
        self.mesh = mesh
        self.data_axis = data_axis
        self.search_impl = search_impl
        self.recall_target = recall_target
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
        if impl in ("approx", "pallas"):
            return impl
        return "approx" if self.count >= APPROX_THRESHOLD else "exact"

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

    def search_state(self):
        """(corpus, count, bias, scale, impl) for building fused search
        jits — callers can compose encode+top-k into ONE dispatch
        (engine/stage1.py). bias is None when nothing is deleted;
        scale is None unless quantized."""
        bias = self._del_mask if self._deleted else None
        impl = self._impl()
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
            cnt = jnp.asarray([self.count], dtype=jnp.int32)
            s, i = _sharded_topk(
                q, self._buf, cnt, self._del_mask, self._scales, k_eff,
                self.mesh, self.data_axis,
                impl="approx" if impl == "approx" else "exact",
                recall_target=self.recall_target,
            )
        elif impl == "pallas":
            from tristage_rag_tpu.ops.pallas_topk import fused_matmul_topk

            # The fused kernel masks by count only; over-fetch by the
            # tombstone count and filter host-side (deletions are rare
            # relative to capacity).
            extra = min(len(self._deleted), self.capacity - k_eff)
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
        if self._deleted:
            self._deleted = set()
            self._del_mask = self._alloc_mask(self.capacity)

    # ---- persistence -----------------------------------------------------

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        if self.quantized:
            np.savez_compressed(
                path.with_suffix(".npz"),
                embeddings=np.asarray(self._buf[: self.count]),
                scales=np.asarray(self._scales[: self.count]),
            )
        else:
            valid = np.asarray(self._buf[: self.count], dtype=np.float32)
            np.savez_compressed(path.with_suffix(".npz"), embeddings=valid)
        meta = {
            "dim": self.dim,
            "count": self.count,
            "dtype": str(np.dtype(self.dtype.name)),
            "deleted": sorted(self._deleted),
            "format": "tristage-dense-v1",
        }
        path.with_suffix(".json").write_text(json.dumps(meta))

    @classmethod
    def load(
        cls,
        path: str | Path,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
        search_impl: str = "auto",
        recall_target: float = 0.95,
    ) -> "DenseIndex":
        path = Path(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        with np.load(path.with_suffix(".npz")) as z:
            emb = z["embeddings"]
            scales = z["scales"] if "scales" in z.files else None
        idx = cls(
            dim=meta["dim"],
            dtype=meta["dtype"],
            mesh=mesh,
            data_axis=data_axis,
            capacity=max(meta["count"], MIN_CAPACITY),
            search_impl=search_impl,
            recall_target=recall_target,
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
        if meta.get("deleted"):
            idx.delete(meta["deleted"])
        return idx

"""Device-resident ColBERT token-embedding cache.

The stage-2 rescorer's biggest cost is re-encoding every candidate per
query (reference behavior, src/stage2_rescorer.py:259). A host-side
cache fixes the re-encode but still ships ~50 MB of token embeddings
host->device per query (500 cands × 192 tokens × 128 dims). This cache
keeps the embeddings IN HBM, aligned with DenseIndex row ids, and
gathers candidates on device — per-query host traffic drops to the
candidate id list.

Memory: seq_len × dim × 2 bytes per doc (49 KB at 192×128 bf16);
``max_docs`` caps the buffer (default 100k docs ≈ 4.9 GB). Beyond the
cap the stage falls back to its host cache / re-encode path.

``quantize="int8"`` stores symmetric per-token int8 with an f32 scale
row ([cap, L], +0.75 KB/doc at L=192) — halving HBM per doc (24.9 KB
at 192×128), so the same budget caches ~2× the corpus. ColBERT token
embeddings are unit-norm, so per-token max-abs scaling keeps the
quantization error ~0.4% of the score scale (same error class as the
int8 DenseIndex mode, index/dense.py); MaxSim rankings on unit-norm
embeddings are tested to stay within top-k overlap tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MIN_CAPACITY = 256


def _atomic_savez(path, **arrays) -> None:
    """np.savez via temp-file + rename: a crash mid-write leaves the
    previous snapshot intact instead of a truncated npz (the load
    guards would refuse it, but then the restart pays the full
    re-encode the snapshot existed to avoid)."""
    import os

    path = str(path)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter(buf, mask_buf, rows, row_mask, ids):
    buf = buf.at[ids].set(rows.astype(buf.dtype))
    mask_buf = mask_buf.at[ids].set(row_mask.astype(mask_buf.dtype))
    return buf, mask_buf


@functools.partial(jax.jit, static_argnames=())
def _gather(buf, mask_buf, ids, valid):
    emb = jnp.take(buf, ids, axis=0).astype(jnp.float32)
    mask = jnp.take(mask_buf, ids, axis=0).astype(jnp.int32)
    mask = mask * valid[:, None].astype(jnp.int32)
    return emb, mask


def symmetric_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Rank-general symmetric int8 over the last axis:
    ``(codes, scales)`` with ``codes = round(x / scale)`` and
    ``scale = max|x| / 127`` per leading index. The ONE definition of
    the int8 numeric contract — index/dense.py's row quantizer and the
    token cache both call it, so their '~0.4% score error' claims
    cannot drift apart."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def grown_capacity(
    cur_cap: int, needed: int, max_docs: int, shards: int,
    min_capacity: int = MIN_CAPACITY,
) -> int | None:
    """Capacity-doubling policy shared by the device caches: returns
    the new capacity (a multiple of ``shards``, ≤ max_docs rounded up
    to the shard multiple), or None when ``needed`` exceeds
    ``max_docs``. Rounding happens against the SAME bound the refusal
    check uses, so capacity never silently exceeds the configured
    budget by more than the shard-divisibility remainder."""
    if needed > max_docs:
        return None
    if needed <= cur_cap:
        return cur_cap
    cap = max(min_capacity, cur_cap or min_capacity)
    while cap < needed:
        cap *= 2
    allocatable = ((max_docs + shards - 1) // shards) * shards
    cap = min(cap, allocatable)
    return ((cap + shards - 1) // shards) * shards


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_q(buf, scale_buf, mask_buf, rows, row_mask, ids):
    q, scale = symmetric_int8(rows)
    buf = buf.at[ids].set(q)
    scale_buf = scale_buf.at[ids].set(scale)
    mask_buf = mask_buf.at[ids].set(row_mask.astype(mask_buf.dtype))
    return buf, scale_buf, mask_buf


@functools.partial(jax.jit, static_argnames=())
def _gather_q(buf, scale_buf, mask_buf, ids, valid):
    emb = dequantize_gather(buf, scale_buf, ids)
    mask = jnp.take(mask_buf, ids, axis=0).astype(jnp.int32)
    mask = mask * valid[:, None].astype(jnp.int32)
    return emb, mask


def dequantize_gather(buf, scale_buf, ids, width: int | None = None) -> jax.Array:
    """Gather + dequantize rows ``ids`` — shared with the fused searcher
    (engine/fused.py) so the staged and fused paths score identical
    embeddings. XLA fuses the int8→f32 convert into the gather read.

    ``width`` statically slices the token axis to ``[:, :width]`` BEFORE
    the f32 materialization (the fused funnel's ``_d2_budget`` bucket):
    tokens past every cached row's valid length are mask-zero anyway, so
    scores are unchanged while the gathered f32 block shrinks from
    [n, L, D] to [n, width, D]."""
    q = jnp.take(buf, ids, axis=0)                            # [n, L, D]
    scale = jnp.take(scale_buf, ids, axis=0)                  # [n, L]
    if width is not None:
        q = q[:, :width]
        scale = scale[:, :width]
    return q.astype(jnp.float32) * scale[..., None]


class DeviceTokenCache:
    def __init__(
        self,
        seq_len: int,
        dim: int,
        dtype: str = "bfloat16",
        max_docs: int = 100_000,
        quantize: bool = False,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
    ):
        self.seq_len = seq_len
        self.dim = dim
        self.quantized = bool(quantize)
        self.dtype = jnp.dtype("int8" if quantize else dtype)
        # Row-sharded over the mesh's data axis: each device holds
        # capacity/n_shards rows, so a slice caches n_shards x the docs
        # of one chip at the same per-chip HBM (engine/fused.py's
        # sharded funnel gathers/scores shard-locally and psums).
        self.mesh = mesh
        self.data_axis = data_axis
        self._shards = 1 if mesh is None else mesh.shape[data_axis]
        self.max_docs = max_docs
        self.capacity = 0
        self._buf: Optional[jax.Array] = None
        self._scale: Optional[jax.Array] = None
        self._mask: Optional[jax.Array] = None
        self._present: set[int] = set()
        # Max valid token count over every stored row — lets the fused
        # funnel gather only [:, :bucket(max_len)] instead of the full
        # seq_len (engine/fused.py::_d2_budget). 0 until the first add;
        # falls back to seq_len whenever a fill's mask isn't host-known.
        self.max_len = 0

    def __contains__(self, doc_id: int) -> bool:
        return doc_id in self._present

    @property
    def size(self) -> int:
        return len(self._present)

    def _zeros(self, shape, dtype):
        """Zero buffer, row-sharded over the mesh when one is set."""
        z = jnp.zeros(shape, dtype=dtype)
        if self.mesh is None:
            return z
        spec = P(self.data_axis, *([None] * (len(shape) - 1)))
        return jax.device_put(z, NamedSharding(self.mesh, spec))

    def _ensure_capacity(self, max_id: int) -> bool:
        needed = max_id + 1
        cap = grown_capacity(
            self.capacity, needed, self.max_docs, self._shards
        )
        if cap is None:
            return False
        if cap == self.capacity:
            return True
        new_buf = self._zeros((cap, self.seq_len, self.dim), self.dtype)
        new_mask = self._zeros((cap, self.seq_len), jnp.int8)
        new_scale = (
            self._zeros((cap, self.seq_len), jnp.float32)
            if self.quantized else None
        )
        if self._buf is not None and self.capacity:
            new_buf = new_buf.at[: self.capacity].set(self._buf)
            new_mask = new_mask.at[: self.capacity].set(self._mask)
            if self.quantized:
                new_scale = new_scale.at[: self.capacity].set(self._scale)
        self._buf, self._mask, self._scale = new_buf, new_mask, new_scale
        self.capacity = cap
        return True

    def reserve(self, max_id: int) -> bool:
        """Pre-size the buffers for ids up to ``max_id`` BEFORE a
        batched fill: every capacity doubling mid-fill re-keys the
        scatter jit (new buffer shape -> fresh XLA compile) and pays an
        eager growth copy — measured ~12 s of a 15 s 2k-doc fill on a
        tunneled dev TPU. Callers that know the full id set (stage-2
        precompute, load_index refills) reserve once instead."""
        return self._ensure_capacity(int(max_id))

    def add(self, doc_ids, embeddings, masks) -> int:
        """Insert [n, L, D] token embeddings at rows ``doc_ids``.

        Returns how many were stored (0 if the cap is exceeded)."""
        ids = np.asarray(doc_ids, dtype=np.int32)
        if ids.size == 0:
            return 0
        if not self._ensure_capacity(int(ids.max())):
            return 0
        # Track the longest valid row WITHOUT a device fetch: both fill
        # paths (stage2.precompute batches, _candidate_embeddings) hand
        # masks as host numpy straight from the tokenizer. A device-array
        # mask would cost a round-trip to inspect, so it conservatively
        # pins max_len to the full seq_len instead.
        if isinstance(masks, jax.Array):
            self.max_len = self.seq_len
        else:
            m = np.asarray(masks)
            m = m.reshape(m.shape[0], -1)
            if m.size:
                # last-valid-position + 1, NOT mask.sum(): a mask with
                # interior zeros (e.g. a punctuation skiplist) must not
                # under-report how far its valid tokens reach — the
                # _d2_budget slice would drop real tokens.
                nz = m != 0
                last = np.where(
                    nz.any(axis=1),
                    m.shape[1] - np.argmax(nz[:, ::-1], axis=1),
                    0,
                )
                self.max_len = max(self.max_len, int(last.max()))
        emb = jnp.asarray(embeddings)
        msk = jnp.asarray(masks)
        if emb.shape[1] != self.seq_len:
            raise ValueError(
                f"expected seq_len {self.seq_len}, got {emb.shape[1]}"
            )
        if self.quantized:
            self._buf, self._scale, self._mask = _scatter_q(
                self._buf, self._scale, self._mask, emb, msk,
                jnp.asarray(ids),
            )
        else:
            self._buf, self._mask = _scatter(
                self._buf, self._mask, emb, msk, jnp.asarray(ids)
            )
        self._present.update(int(i) for i in ids)
        return int(ids.size)

    def gather(self, doc_ids) -> tuple[jax.Array, jax.Array]:
        """Device-side gather: ([n, L, D] f32, [n, L] i32 mask).

        Ids < 0 (padding) return all-zero masks."""
        ids = np.asarray(doc_ids, dtype=np.int32)
        valid = jnp.asarray(ids >= 0)
        safe = jnp.asarray(np.clip(ids, 0, max(self.capacity - 1, 0)))
        if self.quantized:
            return _gather_q(self._buf, self._scale, self._mask, safe, valid)
        return _gather(self._buf, self._mask, safe, valid)

    def state(self) -> tuple[jax.Array, ...]:
        """Device arrays for composing into fused programs
        (engine/fused.py): ``(emb [cap, L, D], mask [cap, L])``, or in
        int8 mode ``(emb, scale [cap, L], mask)``."""
        if self.quantized:
            return self._buf, self._scale, self._mask
        return self._buf, self._mask

    def covers(self, doc_ids) -> bool:
        return all(int(i) in self._present for i in doc_ids)

    # ---- persistence (npz + JSON meta; never pickle) -----------------------

    def save(self, path) -> None:
        """Persist the cache so a reloaded index skips the corpus
        re-encode (the dominant restart cost: ~1 chip-minute per 50k
        docs at measured fill rates). bf16 buffers ride as uint16 bit
        patterns (npz has no bfloat16)."""
        buf = np.asarray(jax.device_get(self._buf))
        arrays = dict(
            mask=np.asarray(jax.device_get(self._mask)),
            present=np.asarray(sorted(self._present), dtype=np.int64),
        )
        if buf.dtype == np.dtype("bfloat16") or str(buf.dtype) == "bfloat16":
            arrays["buf_u16"] = buf.view(np.uint16)
        else:
            arrays["buf"] = buf
        if self.quantized:
            arrays["scale"] = np.asarray(jax.device_get(self._scale))
        meta = dict(
            kind="token_cache", seq_len=self.seq_len, dim=self.dim,
            dtype=str(self.dtype), quantized=self.quantized,
            capacity=self.capacity, max_len=self.max_len,
        )
        _atomic_savez(path, meta=np.frombuffer(
            __import__("json").dumps(meta).encode(), dtype=np.uint8
        ), **arrays)

    def load(self, path) -> bool:
        """Restore a saved cache. Returns False (caller refills from
        the doc store) on any mismatch: different seq/dim/dtype/int8
        mode, or a capacity that doesn't divide over the current mesh."""
        import json

        try:
            z = np.load(path)
            meta = json.loads(bytes(z["meta"]).decode())
        except Exception:
            return False
        if (
            meta.get("kind") != "token_cache"
            or meta["seq_len"] != self.seq_len
            or meta["dim"] != self.dim
            or meta["dtype"] != str(self.dtype)
            or meta["quantized"] != self.quantized
        ):
            return False
        cap = int(meta["capacity"])
        if cap % (self._shards * 8) and self._shards > 1:
            return False  # saved under a different mesh split
        if "buf_u16" in z:
            import ml_dtypes

            buf = z["buf_u16"].view(ml_dtypes.bfloat16)
        else:
            buf = z["buf"]
        self.capacity = cap
        self._buf = self._place(jnp.asarray(buf))
        self._mask = self._place(jnp.asarray(z["mask"]))
        self._scale = (
            self._place(jnp.asarray(z["scale"])) if self.quantized else None
        )
        self._present = set(int(i) for i in z["present"])
        # Snapshots predating max_len tracking restore at full width
        # (correct, just no gather-bucket saving until the next refill).
        self.max_len = int(meta.get("max_len", self.seq_len))
        return True

    def _place(self, z):
        if self.mesh is None:
            return jax.device_put(z)
        spec = P(self.data_axis, *([None] * (z.ndim - 1)))
        return jax.device_put(z, NamedSharding(self.mesh, spec))

    def clear(self) -> None:
        self._present = set()
        self.max_len = 0
        # buffers kept allocated; masks zeroed lazily on reuse
        if self._mask is not None:
            self._mask = jnp.zeros_like(self._mask)

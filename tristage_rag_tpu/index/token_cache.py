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
import logging
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


class TieredTokenCache:
    """Two-tier stage-2 token cache: a hot window every doc pays for,
    plus a tail pool only docs that actually exceed it occupy.

    HBM cost = cap * hot_len + (#long docs) * (seq_len - hot_len)
    per (token x dim) cell, vs cap * seq_len flat — the difference is
    what OOMed the 192-token window at 500k docs on one 16 GB chip
    while the 128-token window fit (VERDICT r4 weak-8): with a
    128-token hot window, only the docs that really run past 128
    tokens pay for slots 128..191.

    Layout: ``hot`` and ``tail`` are ordinary DeviceTokenCaches (same
    dtype/int8 mode); ``tail`` rows are SLOTS, not doc ids, with a
    device-resident ``doc id -> tail slot`` map (-1 = doc fits the hot
    window). Gathers stay single-dispatch: hot gather + map-indirected
    tail gather + concat along the token axis, all static shapes —
    when the gather-width bucket (`engine/fused.py::_d2_budget`) fits
    inside the hot window the tail gather is skipped at trace time.

    Single-device by design: the sharded funnel already scales cache
    capacity linearly with the mesh (rows sharded over "data"), so the
    tiered form targets the one-chip envelope; the pipeline refuses
    the combination loudly.
    """

    def __init__(
        self,
        seq_len: int,
        dim: int,
        hot_len: int,
        dtype: str = "bfloat16",
        max_docs: int = 100_000,
        quantize: bool = False,
    ):
        if not 0 < hot_len < seq_len:
            raise ValueError(
                f"hot_len must be in (0, seq_len={seq_len}), got {hot_len}"
            )
        self.seq_len = seq_len
        self.hot_len = hot_len
        self.dim = dim
        self.quantized = bool(quantize)
        self.dtype = jnp.dtype("int8" if quantize else dtype)
        self.max_docs = max_docs
        self.mesh = None
        self.hot = DeviceTokenCache(
            seq_len=hot_len, dim=dim, dtype=dtype, max_docs=max_docs,
            quantize=quantize,
        )
        self.tail = DeviceTokenCache(
            seq_len=seq_len - hot_len, dim=dim, dtype=dtype,
            max_docs=max_docs, quantize=quantize,
        )
        # doc id -> tail slot; host copy for allocation, device array
        # for the fused program (scatter-updated, never refetched)
        self._map_host = np.full((0,), -1, dtype=np.int32)
        self._map_dev: Optional[jax.Array] = None
        self._next_slot = 0

    # ---- DeviceTokenCache-compatible surface ---------------------------

    def __contains__(self, doc_id: int) -> bool:
        return doc_id in self.hot._present

    @property
    def size(self) -> int:
        return self.hot.size

    @property
    def capacity(self) -> int:
        return self.hot.capacity

    @property
    def max_len(self) -> int:
        h = self.hot.max_len
        t = self.tail.max_len if self.tail.size else 0
        return (self.hot_len + t) if t else h

    @property
    def tail_docs(self) -> int:
        """How many cached docs actually occupy a tail slot."""
        return self._next_slot

    def covers(self, doc_ids) -> bool:
        return self.hot.covers(doc_ids)

    def reserve(self, max_id: int, tail_slots: int | None = None) -> bool:
        """Pre-size the hot tier for ids up to ``max_id`` (same contract
        as DeviceTokenCache.reserve) and ensure a tail buffer exists.

        ``tail_slots``: also pre-size the tail for that many LONG docs
        — callers that know the long-doc share (benches, bulk refills)
        pass it so the tail never capacity-doubles mid-fill (each
        doubling re-keys the donated scatter jit). Left None, the tail
        is only floored at its minimum capacity; it then grows by
        doubling as long docs arrive (a handful of small re-compiles
        per decade of corpus growth — the price of not allocating
        cap x tail_window up front, which is the whole point)."""
        ok = self.hot.reserve(max_id)
        self.tail.reserve(
            max(int(tail_slots) - 1, 0) if tail_slots else 0
        )
        self._sync_map_capacity()
        return ok

    def _ensure_tail(self) -> None:
        """Allocate the (minimum-capacity) tail buffers + map if no
        long doc has arrived yet: a short-doc corpus must still gather
        and compose into the fused program (the tail contributes only
        zero masks)."""
        if self.tail._buf is None:
            self.tail.reserve(0)
        if self._map_dev is None:
            self._sync_map_capacity()
        if self._map_dev is None:  # no hot capacity yet either
            self._map_host = np.full((1,), -1, dtype=np.int32)
            self._map_dev = jnp.asarray(self._map_host)

    def _sync_map_capacity(self) -> None:
        cap = self.hot.capacity
        if cap > self._map_host.shape[0]:
            grown = np.full((cap,), -1, dtype=np.int32)
            grown[: self._map_host.shape[0]] = self._map_host
            self._map_host = grown
            self._map_dev = jnp.asarray(grown)

    def _row_lengths(self, masks, n: int) -> np.ndarray:
        """Last-valid-position per row (same interior-zero-safe rule as
        DeviceTokenCache.add). A device-array mask costs a fetch to
        inspect, so it conservatively tails EVERY row."""
        if isinstance(masks, jax.Array):
            # every row gets a tail slot — the capacity saving is gone
            # for this batch; warn once so a silent all-device-mask
            # fill path can't quietly defeat the tiering
            if not getattr(self, "_warned_device_mask", False):
                self._warned_device_mask = True
                logging.getLogger(__name__).warning(
                    "TieredTokenCache.add received a device-array mask; "
                    "row lengths are unknowable without a fetch, so "
                    "EVERY row in such batches occupies a tail slot "
                    "(tiering saves nothing for them)"
                )
            return np.full((n,), self.seq_len, dtype=np.int64)
        m = np.asarray(masks).reshape(n, -1)
        nz = m != 0
        return np.where(
            nz.any(axis=1), m.shape[1] - np.argmax(nz[:, ::-1], axis=1), 0
        )

    def add(self, doc_ids, embeddings, masks) -> int:
        ids = np.asarray(doc_ids, dtype=np.int32)
        if ids.size == 0:
            return 0
        emb = jnp.asarray(embeddings)
        if emb.shape[1] != self.seq_len:
            raise ValueError(
                f"expected seq_len {self.seq_len}, got {emb.shape[1]}"
            )
        msk_np = (
            masks if not isinstance(masks, jax.Array) else None
        )
        lengths = self._row_lengths(masks, ids.size)
        msk = jnp.asarray(masks)
        stored = self.hot.add(
            ids, emb[:, : self.hot_len],
            (np.asarray(msk_np)[:, : self.hot_len] if msk_np is not None
             else msk[:, : self.hot_len]),
        )
        if not stored:
            return 0
        self._sync_map_capacity()
        long_rows = np.nonzero(lengths > self.hot_len)[0]
        # A re-added doc that USED to be long but now fits the hot
        # window must drop its stale tail: un-map the slot (the old
        # row becomes unreachable; the slot id is not recycled). A
        # flat cache overwrites the whole row, so without this the
        # tiered gather would keep scoring the deleted tail tokens.
        short_rows = np.nonzero(lengths <= self.hot_len)[0]
        if short_rows.size:
            stale = ids[short_rows][self._map_host[ids[short_rows]] >= 0]
            if stale.size:
                self._map_host[stale] = -1
                self._map_dev = self._map_dev.at[jnp.asarray(stale)].set(
                    jnp.int32(-1)
                )
        if long_rows.size:
            long_ids = ids[long_rows]
            slots = self._map_host[long_ids].copy()
            fresh = slots < 0
            n_new = int(fresh.sum())
            if n_new:
                new_slots = np.arange(
                    self._next_slot, self._next_slot + n_new, dtype=np.int32
                )
                slots[fresh] = new_slots
                self._next_slot += n_new
                self._map_host[long_ids] = slots
                self._map_dev = self._map_dev.at[
                    jnp.asarray(long_ids)
                ].set(jnp.asarray(slots))
            t_emb = emb[jnp.asarray(long_rows), self.hot_len:]
            t_msk = (
                np.asarray(msk_np)[long_rows, self.hot_len:]
                if msk_np is not None
                else msk[jnp.asarray(long_rows), self.hot_len:]
            )
            self.tail.add(slots, t_emb, t_msk)
        return stored

    def gather(self, doc_ids) -> tuple[jax.Array, jax.Array]:
        """([n, seq_len, D] f32, [n, seq_len] i32) — hot + tail concat,
        zero/masked tail for docs without a slot."""
        ids = np.asarray(doc_ids, dtype=np.int32)
        self._ensure_tail()
        e1, m1 = self.hot.gather(ids)
        safe_ids = np.clip(ids, 0, max(self.hot.capacity - 1, 0))
        slots = self._map_host[safe_ids]
        slots[ids < 0] = -1
        e2, m2 = self.tail.gather(slots)
        # A slotless doc's clipped gather returns slot 0's values with
        # an all-zero mask; zero them so raw gathers match a flat cache
        # bit-for-bit (consumers mask anyway — this is defense in depth)
        e2 = e2 * m2[..., None].astype(e2.dtype)
        return (
            jnp.concatenate([e1, e2], axis=1),
            jnp.concatenate([m1, m2], axis=1),
        )

    def state(self) -> tuple:
        """(hot_state, tail_state, doc->slot map) for the fused
        program — ``engine/fused.py::_gather_candidate_tokens``
        detects the nested form and skips the tail gather entirely
        when the static gather width fits the hot window."""
        self._ensure_tail()
        return (self.hot.state(), self.tail.state(), self._map_dev)

    # ---- persistence ---------------------------------------------------

    def save(self, path) -> None:
        import json as _json

        def flat(prefix, c):
            buf = np.asarray(jax.device_get(c._buf))
            out = {
                f"{prefix}mask": np.asarray(jax.device_get(c._mask)),
                f"{prefix}present": np.asarray(
                    sorted(c._present), dtype=np.int64
                ),
            }
            if str(buf.dtype) == "bfloat16":
                out[f"{prefix}buf_u16"] = buf.view(np.uint16)
            else:
                out[f"{prefix}buf"] = buf
            if c.quantized:
                out[f"{prefix}scale"] = np.asarray(jax.device_get(c._scale))
            return out

        meta = dict(
            kind="tiered_token_cache", seq_len=self.seq_len,
            hot_len=self.hot_len, dim=self.dim, dtype=str(self.dtype),
            quantized=self.quantized, capacity=self.hot.capacity,
            tail_capacity=self.tail.capacity, next_slot=self._next_slot,
            hot_max_len=self.hot.max_len, tail_max_len=self.tail.max_len,
        )
        _atomic_savez(
            path,
            meta=np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8),
            map=self._map_host,
            **flat("hot_", self.hot), **flat("tail_", self.tail),
        )

    def load(self, path) -> bool:
        import json as _json

        try:
            z = np.load(path)
            meta = _json.loads(bytes(z["meta"]).decode())
        except Exception:
            return False
        if (
            meta.get("kind") != "tiered_token_cache"
            or meta["seq_len"] != self.seq_len
            or meta["hot_len"] != self.hot_len
            or meta["dim"] != self.dim
            or meta["dtype"] != str(self.dtype)
            or meta["quantized"] != self.quantized
        ):
            return False

        def restore(prefix, c, cap, max_len):
            if f"{prefix}buf_u16" in z:
                import ml_dtypes

                buf = z[f"{prefix}buf_u16"].view(ml_dtypes.bfloat16)
            else:
                buf = z[f"{prefix}buf"]
            c.capacity = cap
            c._buf = jax.device_put(jnp.asarray(buf))
            c._mask = jax.device_put(jnp.asarray(z[f"{prefix}mask"]))
            c._scale = (
                jax.device_put(jnp.asarray(z[f"{prefix}scale"]))
                if c.quantized else None
            )
            c._present = set(int(i) for i in z[f"{prefix}present"])
            c.max_len = max_len

        restore("hot_", self.hot, int(meta["capacity"]),
                int(meta["hot_max_len"]))
        restore("tail_", self.tail, int(meta["tail_capacity"]),
                int(meta["tail_max_len"]))
        self._map_host = np.asarray(z["map"], dtype=np.int32)
        self._map_dev = jnp.asarray(self._map_host)
        self._next_slot = int(meta["next_slot"])
        return True

    def clear(self) -> None:
        self.hot.clear()
        self.tail.clear()
        self._map_host = np.full(
            (self._map_host.shape[0],), -1, dtype=np.int32
        )
        if self._map_dev is not None:
            self._map_dev = jnp.asarray(self._map_host)
        self._next_slot = 0

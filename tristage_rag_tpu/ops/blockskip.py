"""Clustered block-skip top-k — the FAISS-IVF equivalent, TPU-shaped.

The reference switches stage-1 from ``IndexFlatIP`` to ``IndexIVFFlat``
(nlist=100, nprobe=10) beyond 1k docs (src/stage1_retriever.py:256-283):
only the partitions nearest the query are scanned. The TPU-native
translation keeps everything static-shaped:

* the corpus is reordered by k-means cluster (ops/cluster.py) and packed
  into fixed-size blocks ``[n_blocks, block_size, d]`` — a block is the
  DMA/matmul granule, clusters are the semantic granule; packing in
  cluster order makes blocks cluster-coherent without dynamic per-
  cluster shapes;
* at query time, a cheap ``[B, n_blocks]`` centroid matmul picks the
  top ``n_probe`` blocks per query *tile* (queries grouped in tiles of
  ``tile_q`` share one probe set — max-pooled centroid scores), then a
  sequential ``lax.map`` over tiles gathers just those blocks and runs
  the exact masked matmul + top-k on them.

HBM/FLOPs scale with ``n_probe * block_size`` per tile instead of the
whole corpus — the win is largest exactly where the full-scan matmul is
weakest: low-batch serving (B=1 reads ~probe-fraction of the corpus
instead of all of it). At n_probe/n_blocks = 10% this is the same scan
budget as the reference's nprobe=10/nlist=100, with the recall knob
explicit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tristage_rag_tpu.ops.topk import NEG_INF


@functools.partial(jax.jit, donate_argnums=0)
def _pack_write(dst, src, idx, start_block):
    """Gather rows ``idx`` of ``src`` (−1 ⇒ zero row) and write them as
    blocks into ``dst`` at block offset ``start_block``. ``dst`` is
    donated so the loop updates one staging buffer in place instead of
    materializing a second corpus copy (the 500k-doc clustered build
    OOMed exactly here — VERDICT r4 weak-3)."""
    bs, d = dst.shape[1], dst.shape[2]
    g = jnp.take(src, jnp.clip(idx, 0), axis=0)
    g = jnp.where((idx >= 0)[:, None], g, jnp.zeros((), dst.dtype))
    return jax.lax.dynamic_update_slice(
        dst, g.reshape(-1, bs, d), (start_block, 0, 0)
    )


def pack_blocks(
    emb: jax.Array, order: np.ndarray, block_size: int,
    chunk_rows: int = 1 << 16,
):
    """Pack cluster-ordered corpus rows into fixed blocks.

    Args:
      emb: [n, d] corpus rows (device or host; any dtype incl. int8).
      order: [n] permutation — row order[i] of ``emb`` becomes packed
        slot i (cluster-sorted, ops/cluster.py assignments).
      block_size: rows per block.
      chunk_rows: gather granularity — the packed buffer is written
        chunk-by-chunk into one donated staging array, so peak device
        memory is corpus + packed + ONE chunk transient (not corpus +
        2x packed as a whole-corpus gather+concat costs). At most two
        program shapes compile (full chunk + tail).

    Returns:
      (blocked [n_blocks, block_size, d] same dtype, row_ids
      [n_blocks, block_size] int32 original row ids with -1 padding).
    """
    emb = jnp.asarray(emb)
    n, d = emb.shape
    if order.shape != (n,):
        raise ValueError(f"order must be [{n}], got {order.shape}")
    nb = max(1, -(-n // block_size))
    total = nb * block_size
    row_ids = np.full((total,), -1, dtype=np.int32)
    row_ids[:n] = order.astype(np.int32)

    # chunk in whole blocks so every write lands block-aligned
    chunk_rows = max(block_size, (chunk_rows // block_size) * block_size)
    order_full = np.full((total,), -1, dtype=np.int32)
    order_full[:n] = order.astype(np.int32)
    dst = jnp.zeros((nb, block_size, d), dtype=emb.dtype)
    for s in range(0, total, chunk_rows):
        idx = jnp.asarray(order_full[s:s + chunk_rows])
        dst = _pack_write(dst, emb, idx, s // block_size)
    return dst, row_ids.reshape(nb, block_size)


def block_centroids(blocked: jax.Array, row_ids) -> jax.Array:
    """Per-block L2-normalized mean of valid rows — the probe targets.

    Blocks are cluster-coherent (packed in cluster order), so the block
    mean tracks the k-means centroid; using the *block* mean (not the
    cluster centroid) keeps probe scores faithful when a block straddles
    two adjacent clusters."""
    valid = (jnp.asarray(row_ids) >= 0).astype(jnp.float32)
    x = blocked.astype(jnp.float32)
    sums = jnp.einsum("nbd,nb->nd", x, valid)
    counts = jnp.maximum(valid.sum(axis=1), 1.0)
    mean = sums / counts[:, None]
    norm = jnp.linalg.norm(mean, axis=1, keepdims=True)
    return mean / jnp.maximum(norm, 1e-12)


@functools.partial(
    jax.jit, static_argnames=("k", "n_probe", "tile_q", "impl", "interpret")
)
def blockskip_topk(
    queries: jax.Array,
    blocked: jax.Array,
    row_ids: jax.Array,
    centroids: jax.Array,
    k: int,
    n_probe: int,
    tile_q: int = 8,
    bias=None,
    scales=None,
    impl: str = "xla",
    interpret: bool = False,
    real_mask=None,
):
    """Probed top-k over a blocked corpus.

    Args:
      queries: [B, d] query embeddings.
      real_mask: optional [B] (bool/int/float) — 1 for real queries.
        Callers that pad their batch with placeholder queries BEFORE
        this call (the fused funnel buckets batches with "" queries)
        pass it so the placeholders' real encoder embeddings cannot
        steer a tile's shared probe set; rows marked 0 probe nothing
        (all-NEG_INF centroid scores, same treatment as this
        function's own internal batch padding) and their outputs are
        garbage for the caller to drop.
      blocked: [n_blocks, block_size, d] packed corpus (f32/bf16/int8).
      row_ids: [n_blocks, block_size] int32 original ids, -1 = padding.
      centroids: [n_blocks, d] f32 probe targets (block_centroids).
      k: results per query (must fit the probed pool,
        k <= n_probe * block_size).
      n_probe: blocks scanned per query tile (recall knob — the
        reference's nprobe, stage1_retriever.py:268).
      tile_q: queries per probe tile. Tiles share one probe set
        (max-pooled centroid scores), trading a little recall for
        batched gathers; tile_q=1 probes per query.
      bias: optional [n_blocks, block_size] f32 additive bias in packed
        layout (tombstones use -inf).
      scales: optional [n_blocks, block_size] f32 per-row dequant
        scales for int8 blocked corpora.
      impl: "xla" (gather + einsum under lax.map) or "pallas"
        (scalar-prefetch gather-matmul, ops/pallas_blockskip.py — one
        HBM read of the probed pool instead of gather+write+read;
        needs tile_q % 8 == 0, or % 32 for int8).
      interpret: run the Pallas kernel interpreted (CPU tests).

    Returns:
      (scores [B, k] f32, ids [B, k] int32 original row ids, -1 pad).
    """
    b, d = queries.shape
    nb, bs, _ = blocked.shape
    n_probe = min(n_probe, nb)
    if k > n_probe * bs:
        raise ValueError(
            f"k={k} exceeds probed pool n_probe*block_size="
            f"{n_probe * bs}; raise n_probe or block_size"
        )
    tile_q = max(1, min(tile_q, b))
    if impl == "pallas":
        # The Pallas gather-matmul needs the tile to satisfy sublane
        # tiling (8 rows f32/bf16, 32 int8); pad small batches up to it
        # instead of refusing them — batch-1 interactive serving is
        # exactly where block skipping matters most.
        min_tile = 32 if blocked.dtype == jnp.int8 else 8
        tile_q = -(-tile_q // min_tile) * min_tile
    q32 = queries.astype(jnp.float32)
    b_pad = ((b + tile_q - 1) // tile_q) * tile_q
    if b_pad != b:
        q32 = jnp.concatenate(
            [q32, jnp.zeros((b_pad - b, d), jnp.float32)], axis=0
        )
    t = b_pad // tile_q

    cscores = jnp.einsum(
        "qd,nd->qn", q32, centroids, preferred_element_type=jnp.float32
    )
    if b_pad != b:
        # Pad queries must not steer the shared tile probe: their zero
        # centroid scores would out-rank real negative block scores in
        # the max-pool below.
        cscores = cscores.at[b:].set(NEG_INF)
    if real_mask is not None:
        rm = real_mask.astype(jnp.float32)
        if b_pad != b:
            rm = jnp.concatenate(
                [rm, jnp.zeros((b_pad - b,), jnp.float32)]
            )
        cscores = jnp.where(rm[:, None] > 0, cscores, NEG_INF)
    tile_scores = cscores.reshape(t, tile_q, nb).max(axis=1)
    # All-padding blocks (sharded views pad nb to the shard count) have
    # zero centroids — score 0 would out-probe real blocks with
    # negative scores, wasting the probe budget. Mask them out.
    block_valid = (jnp.asarray(row_ids) >= 0).any(axis=1)  # [nb]
    tile_scores = jnp.where(block_valid[None], tile_scores, NEG_INF)
    _, sel = jax.lax.top_k(tile_scores, n_probe)  # [t, n_probe]

    if impl == "pallas":
        from tristage_rag_tpu.ops.pallas_blockskip import (
            gathered_block_scores,
        )

        q_in = queries.astype(jnp.float32)
        if b_pad != b:
            q_in = jnp.concatenate(
                [q_in, jnp.zeros((b_pad - b, d), jnp.float32)], axis=0
            )
        if blocked.dtype != jnp.int8:
            q_in = q_in.astype(
                jnp.bfloat16 if blocked.dtype != jnp.float32
                else jnp.float32
            )
        s = gathered_block_scores(
            q_in, blocked, sel, tile_q=tile_q, scales=scales,
            interpret=interpret,
        )  # [b_pad, P*bs]
        ids_flat = jnp.take(row_ids, sel, axis=0).reshape(t, n_probe * bs)
        s = s.reshape(t, tile_q, n_probe * bs)
        s = jnp.where(ids_flat[:, None, :] >= 0, s, NEG_INF)
        if bias is not None:
            s = s + jnp.take(bias, sel, axis=0).reshape(
                t, 1, n_probe * bs
            )
        ts, pos = jax.lax.top_k(s, k)  # [t, tile_q, k]
        ti = jnp.take_along_axis(
            jnp.broadcast_to(
                ids_flat[:, None, :], (t, tile_q, n_probe * bs)
            ),
            pos,
            axis=2,
        )
        ti = jnp.where(ts > NEG_INF / 2, ti, -1)
        return ts.reshape(b_pad, k)[:b], ti.reshape(b_pad, k)[:b]

    compute_t = jnp.bfloat16 if blocked.dtype != jnp.float32 else jnp.float32
    qt_all = q32.reshape(t, tile_q, d)

    def one_tile(args):
        qt, sel_t = args  # [tile_q, d], [n_probe]
        blk = jnp.take(blocked, sel_t, axis=0)  # [P, bs, d]
        ids = jnp.take(row_ids, sel_t, axis=0)  # [P, bs]
        s = jnp.einsum(
            "qd,pbd->qpb",
            qt.astype(compute_t),
            blk.astype(compute_t),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if scales is not None:
            s = s * jnp.take(scales, sel_t, axis=0)[None]
        if bias is not None:
            s = s + jnp.take(bias, sel_t, axis=0)[None]
        s = jnp.where(ids[None] >= 0, s, NEG_INF)
        flat = s.reshape(tile_q, n_probe * bs)
        ts, pos = jax.lax.top_k(flat, k)
        ti = ids.reshape(-1)[pos]
        ti = jnp.where(ts > NEG_INF / 2, ti, -1)
        return ts, ti

    # Sequential over tiles: bounds live memory to one probed pool
    # (n_probe * block_size * d) regardless of batch size.
    scores, ids = jax.lax.map(one_tile, (qt_all, sel))
    scores = scores.reshape(b_pad, k)[:b]
    ids = ids.reshape(b_pad, k)[:b]
    return scores, ids

"""Pallas gather-matmul for the clustered (IVF-equivalent) stage-1.

The XLA block-skip path (ops/blockskip.py) gathers the selected blocks
with ``jnp.take`` before the dot: the probed pool is materialized to
HBM and read back — 3x the HBM traffic of the pool (gather read +
write + dot read). This kernel removes the copy with the scalar-
prefetch pattern: the selected block ids ride in SMEM ahead of the
grid, the docs BlockSpec's index_map picks block ``sel[t, p]`` for
grid step (t, p), and Mosaic DMAs exactly those blocks through VMEM —
one HBM read of the probed pool, like the full-scan kernel but over
``n_probe`` blocks instead of all of them.

Selection stays in XLA on the kernel's compact [tile_q, P*bs] score
output (a few MB per tile — never the [B, N] matrix): unlike the
full-scan kernel's per-block top-T (exact by a Poisson bound under
RANDOM doc order), clustering deliberately concentrates a query's
winners in its home block, so any small per-block candidate table
would drop results. Scores out + exact XLA top-k is both safe and
cheap at probed-pool sizes.

int8 corpora run the dot int8 x int8 on the MXU (2x peak, half read)
with in-register dequant, same contract as pallas_topk.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_scores_kernel(
    sel_ref,  # SMEM [T, P] int32 (scalar prefetch)
    q_ref,  # VMEM [tile_q, D]
    docs_ref,  # VMEM [1, BS, D] — block sel[t, p]
    *refs,  # quantized: (qs [tile_q,1], ds [1,1,BS], out); else (out,)
    quantized: bool = False,
):
    if quantized:
        qs_ref, ds_ref, out_ref = refs
    else:
        (out_ref,) = refs
    s = jax.lax.dot_general(
        q_ref[:],
        docs_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if quantized else jnp.float32,
    )  # [tile_q, BS]
    if quantized:
        s = s.astype(jnp.float32) * qs_ref[:] * ds_ref[0]
    out_ref[0, 0] = s.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("tile_q", "interpret")
)
def gathered_block_scores(
    queries: jax.Array,
    blocked: jax.Array,
    sel: jax.Array,
    tile_q: int,
    scales: jax.Array | None = None,
    interpret: bool = False,
):
    """Scores of each query tile against its selected blocks.

    Args:
      queries: [B, d]; B must be t_tiles * tile_q (caller pads).
      blocked: [n_blocks, block_size, d] packed corpus (f32/bf16/int8).
      sel: [t_tiles, n_probe] int32 — block ids per query tile.
      tile_q: queries per tile (>= 8 for f32/bf16 sublane tiling;
        >= 32 for int8 — caller pads the batch).
      scales: [n_blocks, block_size] f32 dequant scales (int8 mode).

    Returns:
      scores [B, n_probe * block_size] f32, laid out probe-major so
      flat position p * block_size + j is row j of block sel[t, p].
    """
    b, d = queries.shape
    nb, bs, _ = blocked.shape
    t_tiles, n_probe = sel.shape
    if b != t_tiles * tile_q:
        raise ValueError(
            f"queries rows {b} != t_tiles {t_tiles} * tile_q {tile_q}"
        )
    quantized = scales is not None
    if quantized and blocked.dtype != jnp.int8:
        raise ValueError(f"scales given but blocked is {blocked.dtype}")
    if blocked.dtype == jnp.int8 and not quantized:
        raise ValueError("int8 blocked corpus needs scales=")
    min_tile = 32 if quantized else 8
    if tile_q % min_tile:
        raise ValueError(
            f"tile_q {tile_q} must be a multiple of {min_tile} "
            f"({'int8' if quantized else 'float'} sublane tiling)"
        )

    in_specs = [
        pl.BlockSpec(
            (tile_q, d), lambda t, p, sel: (t, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, bs, d),
            lambda t, p, sel: (sel[t, p], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if quantized:
        from tristage_rag_tpu.index.token_cache import symmetric_int8

        q8, qs = symmetric_int8(queries)
        inputs = [
            q8,
            blocked,
            qs.astype(jnp.float32).reshape(b, 1),
            # [nb, 1, bs]: a (1, 1, bs) block keeps the LAST TWO dims
            # Mosaic-tileable (second-to-last 1 == the array's own 1;
            # a 2-D (1, bs) block of [nb, bs] violates the sublane
            # rule and refuses to lower on real TPU — caught by the
            # round-5 TPU drive, masked by CPU interpret mode)
            scales.astype(jnp.float32).reshape(nb, 1, bs),
        ]
        in_specs += [
            pl.BlockSpec(
                (tile_q, 1), lambda t, p, sel: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bs),
                lambda t, p, sel: (sel[t, p], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        inputs = [queries.astype(blocked.dtype), blocked]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles, n_probe),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, tile_q, bs),
            lambda t, p, sel: (t, p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    pool_bytes = n_probe * bs * d * blocked.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_gather_scores_kernel, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t_tiles, n_probe, tile_q, bs), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_probe * bs * d,
            bytes_accessed=t_tiles * pool_bytes
            + b * d * queries.dtype.itemsize
            + b * n_probe * bs * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sel.astype(jnp.int32), *inputs)
    # [t, P, tile_q, bs] -> [t, tile_q, P, bs] -> [B, P*bs]
    return jnp.moveaxis(out, 1, 2).reshape(b, n_probe * bs)

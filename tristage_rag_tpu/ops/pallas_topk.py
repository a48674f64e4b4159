"""Fused Pallas matmul + blockwise top-k — the stage-1 retrieval kernel.

Motivation (measured on v5e, N=100k docs x 768, bf16):

* XLA ``einsum`` alone is HBM-bound (~0.16 ms — speed of light).
* XLA ``einsum + lax.top_k(500)`` costs 0.78 ms at B=8 and 10.5 ms at
  B=128: TopK dominates, and the [B, N] f32 score matrix round-trips
  through HBM (512 MB at B=128, N=1M — it stops fitting long before
  the corpus does).

This kernel fuses scoring and selection: the document matrix streams
through VMEM in blocks; each block's scores live only in VMEM, reduced
immediately to a per-block top-T (iterative max+mask — Mosaic has no
sort primitive); the [B, nblocks*T] candidate table is then exactly
top-k'ed by XLA. HBM traffic = one read of the docs + tiny candidates.

Measured on v5e at N=2^20, D=768, B=128, K=500: 8.4 ms/batch
(15,240 qps) — exact, vs XLA ``approx_max_k`` 2.5 ms (recall 0.95) and
XLA exact ``top_k`` 199 ms. The selection loop is VPU-bound (T passes
over every block's scores); use this kernel when exactness matters or
when the [B, N] score matrix exceeds HBM (B=512, N=8M is 16 GB — the
XLA paths simply cannot run there, while this kernel's working set
stays at VMEM scale).

Exactness: global top-k is exact iff no query has > T of its global
top-k in a single block. With random doc order, #top-k in a block is
Binomial(k, BLK/N); auto-T is chosen so the whole-query Poisson tail
probability nblocks * P[X > T | lambda=k/nblocks] is < 1e-9 (e.g.
N=1M, K=500, BLK=1024 -> T=16, tail ~1e-17), and the call refuses
(so DenseIndex falls back to XLA exact) when no T <= 128 meets the
bound. The reference accepts far worse: its FAISS IVF path
(stage1_retriever.py:264-273) probes 10 of 100 clusters with no
recall guarantee at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = jnp.float32(-1e30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _poisson_tail(lam: float, t: int) -> float:
    """P[X > t] for X ~ Poisson(lam), exact partial-sum (lam is small)."""
    import math

    term = math.exp(-lam)
    cdf = term
    for i in range(1, t + 1):
        term *= lam / i
        cdf += term
    return max(0.0, 1.0 - cdf)


def _bank_topk_kernel(
    count_ref,  # SMEM [1] int32
    q_ref,  # VMEM [B, D]
    docs_ref,  # VMEM [BLK, D]
    *refs,  # quantized: (qs, ds, vals, idx, s_ref); else (vals, idx, s_ref)
    block_size: int,
    per_block_k: int,
    bank_top: int = 1,
    quantized: bool = False,
):
    """Bank-reduce selection: the block is viewed as T banks of BLK/T
    contiguous docs and each bank yields its top-``bank_top`` via
    ``bank_top`` max+mask passes. This is the shape of XLA's
    ``approx_max_k`` PartialReduce, but fused with the matmul — the
    [B, N] score matrix never exists.

    One [B, D] x [D, BLK] dot scores the whole block (full MXU
    utilization; the round-4 version issued T separate [B, D] x [D, W]
    dots and measured 2.5x off the HBM roofline), staged through a VMEM
    scratch so per-bank score tiles come from static REF slices —
    Mosaic cannot shape-cast the lane dimension ([B, BLK] ->
    [B, T, W] fails infer-vector-layout), but ref loads at static
    lane offsets lower fine.

    Recall: a bank holding more than ``bank_top`` global winners loses
    the excess — with W=128 banks and bank_top=2 at k=500 over 1M docs
    the expected loss is ~0.3 winners (E[banks with >=3 of the top-k]),
    i.e. ~0.999 selection recall, vs ~0.97 at bank_top=1.

    ``quantized``: q and docs are int8 codes; the dot runs int8 x int8
    on the MXU (2x peak, half the HBM read) and dequantizes in
    registers with the per-row scales."""
    if quantized:
        qs_ref, ds_ref, vals_ref, idx_ref, s_ref = refs
    else:
        vals_ref, idx_ref, s_ref = refs
    i = pl.program_id(0)
    base = i * block_size
    b = q_ref.shape[0]
    t = per_block_k
    width = block_size // t
    neg = jnp.float32(-1e30)
    s = jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if quantized else jnp.float32,
    )  # [B, BLK]
    if quantized:
        s = s.astype(jnp.float32) * qs_ref[:] * ds_ref[:]
    colb = jax.lax.broadcasted_iota(jnp.int32, (b, block_size), 1)
    s = jnp.where(colb + base < count_ref[0], s, neg)
    s_ref[:] = s.astype(jnp.float32)

    n_out = t * bank_top
    ocol = jax.lax.broadcasted_iota(jnp.int32, (b, n_out), 1)
    vals = jnp.full((b, n_out), neg, dtype=jnp.float32)
    idx = jnp.full((b, n_out), -1, dtype=jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
    for bank in range(t):  # static unroll: t is a Python int
        sb = s_ref[:, bank * width:(bank + 1) * width]
        for r in range(bank_top):
            m = jnp.max(sb, axis=1)  # [B]
            a = jnp.min(
                jnp.where(sb == m[:, None], col, jnp.int32(width)), axis=1
            )  # [B] offset within bank
            gid = jnp.where(m > -5e29, base + bank * width + a, -1)
            at = ocol == (bank * bank_top + r)
            vals = jnp.where(at, m[:, None], vals)
            idx = jnp.where(at, gid[:, None], idx)
            if r + 1 < bank_top:
                sb = jnp.where(col == a[:, None], neg, sb)
    vals_ref[0] = vals
    idx_ref[0] = idx


def _bankT_topk_kernel(
    count_ref,  # SMEM [1] int32
    q_ref,  # VMEM [B, D]
    docs_ref,  # VMEM [BLK, D]
    *refs,  # quantized: (qs [1,B], ds [BLK,1], vals, idx); else (vals, idx)
    block_size: int,
    per_block_k: int,
    bank_top: int = 1,
    quantized: bool = False,
):
    """Transposed bank reduce: the dot emits [BLK, B] (docs on
    SUBLANES, queries on lanes), so the bank view [T, W, B] is a
    leading/sublane reshape — which Mosaic lowers — and the whole
    per-bank top-``bank_top`` collapses to ``bank_top`` masked
    ``max(axis=1)`` reductions with NO per-bank unrolled loop and no
    lane slicing. Outputs land as [T*bank_top, B] (bank-major); the
    host-side merge transposes once (tiny)."""
    if quantized:
        qs_ref, ds_ref, vals_ref, idx_ref = refs
    else:
        vals_ref, idx_ref = refs
    i = pl.program_id(0)
    base = i * block_size
    b = q_ref.shape[0]
    t = per_block_k
    width = block_size // t
    neg = jnp.float32(-1e30)
    s = jax.lax.dot_general(
        docs_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if quantized else jnp.float32,
    )  # [BLK, B]
    if quantized:
        s = s.astype(jnp.float32) * ds_ref[:] * qs_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (block_size, b), 0)
    s = jnp.where(row + base < count_ref[0], s, neg)
    sb = s.reshape(t, width, b)
    wrow = jax.lax.broadcasted_iota(jnp.int32, (t, width, b), 1)
    vals_parts = []
    idx_parts = []
    for r in range(bank_top):  # tiny static unroll (bank_top rounds)
        m = jnp.max(sb, axis=1)  # [T, B]
        a = jnp.min(
            jnp.where(sb == m[:, None, :], wrow, jnp.int32(width)), axis=1
        )  # [T, B] offset within bank
        bank_base = base + jax.lax.broadcasted_iota(
            jnp.int32, (t, b), 0
        ) * width
        gid = jnp.where(m > -5e29, bank_base + a, -1)
        vals_parts.append(m)
        idx_parts.append(gid)
        if r + 1 < bank_top:
            sb = jnp.where(wrow == a[:, None, :], neg, sb)
    vals_ref[0] = jnp.concatenate(vals_parts, axis=0)  # [T*bank_top, B]
    idx_ref[0] = jnp.concatenate(idx_parts, axis=0)


def _block_topk_kernel(
    count_ref,  # SMEM [1] int32: valid row count
    q_ref,  # VMEM [B, D] bf16/f32 (or int8 codes when quantized)
    docs_ref,  # VMEM [BLK, D] — current doc block
    *refs,  # quantized: (qs [B,1], ds [1,BLK], vals, idx); else (vals, idx)
    block_size: int,
    per_block_k: int,
    quantized: bool = False,
):
    if quantized:
        qs_ref, ds_ref, vals_ref, idx_ref = refs
    else:
        vals_ref, idx_ref = refs
    i = pl.program_id(0)
    base = i * block_size
    # [B, BLK] scores: f32 accumulation on the MXU, or int8 x int8 ->
    # int32 with in-register dequant when the corpus rides quantized.
    s = jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if quantized else jnp.float32,
    )
    if quantized:
        s = s.astype(jnp.float32) * qs_ref[:] * ds_ref[:]
    b, blk = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, blk), 1)
    valid = (col + base) < count_ref[0]
    neg = jnp.float32(-1e30)
    s = jnp.where(valid, s, neg)

    # Iterative max+mask selection: T rounds of (rowmax, argmax, mask).
    # fori_loop (not a python unroll) keeps the Mosaic program small;
    # results accumulate in registers (Mosaic cannot store at a dynamic
    # lane index) and are written once at the end.
    tcol = jax.lax.broadcasted_iota(jnp.int32, (b, per_block_k), 1)
    vals0 = jnp.full((b, per_block_k), neg, dtype=jnp.float32)
    idx0 = jnp.full((b, per_block_k), -1, dtype=jnp.int32)

    def body(t, carry):
        s, vals, idx = carry
        m = jnp.max(s, axis=1)  # [B]
        # argmax via min-index-of-max (ties -> lowest index, matching
        # lax.top_k's stable behavior).
        is_max = s == m[:, None]
        a = jnp.min(jnp.where(is_max, col, jnp.int32(blk)), axis=1)  # [B]
        gid = jnp.where(m > -5e29, a + base, -1)
        at_t = tcol == t
        vals = jnp.where(at_t, m[:, None], vals)
        idx = jnp.where(at_t, gid[:, None], idx)
        s = jnp.where(col == a[:, None], neg, s)
        return s, vals, idx

    _, vals, idx = jax.lax.fori_loop(
        0, per_block_k, body, (s, vals0, idx0)
    )
    vals_ref[0] = vals
    idx_ref[0] = idx


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_size", "per_block_k", "mode", "interpret", "bank_top",
        "min_candidates",
    ),
)
def fused_matmul_topk(
    queries: jax.Array,
    corpus: jax.Array,
    count: jax.Array,
    k: int,
    block_size: int = 1024,
    per_block_k: int = 0,
    mode: str = "select",  # "select" (exact-grade) | "bank" (approx)
    interpret: bool = False,
    scales: jax.Array | None = None,
    bank_top: int = 1,
    min_candidates: int = 0,
):
    """Fused inner-product top-k over a masked corpus buffer.

    Args/returns match ops.topk.masked_topk. Requires corpus rows to be
    a multiple of ``block_size`` (DenseIndex capacities are powers of
    two >= 1024, so this holds by construction).

    ``mode="select"`` runs T rounds of max+mask per block — exact up to
    the per-block-k bound (astronomically safe margins, see module
    doc). ``mode="bank"`` takes each of T contiguous banks' top-
    ``bank_top`` — approx_max_k-grade recall at a fraction of the
    selection cost, while still never materializing scores in HBM;
    ``bank_top=2`` recovers 2-winner bank collisions (~0.999 expected
    selection recall at k=500 over 1M docs vs ~0.97 at top-1) for one
    extra max+mask pass per bank.

    ``scales``: per-row dequant scales [n] for an int8 corpus
    (DenseIndex quantized mode). Queries are per-row int8-quantized
    here (token_cache.py::symmetric_int8 contract) and the block dot
    runs int8 x int8 on the MXU — half the HBM read AND 2x the MXU
    peak vs bf16, where the XLA int8 search path only saves the read
    (it dequantizes before a float dot). Scores carry both quant
    errors (~0.4% each on unit-norm rows).
    """
    n, d = corpus.shape
    b = queries.shape[0]
    quantized = scales is not None
    if quantized and corpus.dtype != jnp.int8:
        raise ValueError(f"scales given but corpus is {corpus.dtype}")
    if corpus.dtype == jnp.int8 and not quantized:
        # Without scales the non-quantized branch would silently cast
        # float queries to int8 codes (0.73 -> 0) — refuse loudly.
        raise ValueError("int8 corpus needs scales= (per-row dequant)")
    if n % block_size != 0:
        raise ValueError(f"corpus rows {n} not a multiple of {block_size}")
    nblocks = n // block_size
    if per_block_k <= 0:
        # Auto T. Exactness holds when either (a) a block can keep ALL
        # k of the global top-k (deterministic), or (b) the Poisson
        # tail of per-block top-k occupancy past T is negligible: with
        # random doc order #winners per block ~ Poisson(k/nblocks), so
        # pick the smallest multiple-of-8 T whose PER-QUERY failure
        # probability nblocks * P[X > T] is < 1e-9. If even T=128
        # can't meet that, results would silently go missing — refuse
        # so callers (DenseIndex) fall back to the XLA exact path.
        # Bank mode is APPROXIMATE by contract (approx_max_k-grade):
        # expected recall ~1 - k/(2*nblocks*T) from per-bank collision
        # loss, so the T=8 floor already gives >=0.96 at k=500 over
        # 1024 blocks — the exactness guard does not apply to it.
        lam = k / max(nblocks, 1)
        per_block_k = 0
        for cand in range(8, 129, 8):
            if cand >= min(k, block_size) or (
                nblocks * _poisson_tail(lam, cand) < 1e-9
            ):
                per_block_k = cand
                break
        if not per_block_k:
            if mode in ("bank", "bankT"):
                per_block_k = 128
            else:
                raise ValueError(
                    f"fused top-k cannot guarantee exactness: k={k} over "
                    f"{nblocks} blocks means ~{lam:.0f} top-k hits per "
                    f"block vs a <=128-slot table; use masked_topk"
                )
    per_block_k = min(per_block_k, block_size)
    if mode in ("bank", "bankT") and block_size % per_block_k != 0:
        fits = [
            pk for pk in (8, 16, 32, 64, 128)
            if block_size % pk == 0 and pk <= per_block_k
        ]
        if not fits:
            # block_size not divisible by 8: no bank width divides the
            # block, so rows can't be banked evenly. Refuse clearly
            # rather than raising max() on an empty sequence.
            raise ValueError(
                f"bank mode needs block_size divisible by 8, got "
                f"{block_size}; pass a multiple of 8 or use mode='exact'"
            )
        per_block_k = max(fits)
    if bank_top < 1:
        raise ValueError(f"bank_top must be >= 1, got {bank_top}")
    if mode not in ("bank", "bankT"):
        bank_top = 1  # select mode has no banks
    out_k = per_block_k * bank_top
    if mode in ("bank", "bankT") and bank_top > block_size // per_block_k:
        raise ValueError(
            f"bank_top {bank_top} exceeds bank width "
            f"{block_size // per_block_k}"
        )
    if min_candidates and nblocks * out_k < min_candidates:
        # Bank modes are approximate BY CONTRACT and normally run with
        # a sub-k candidate table only when a caller deliberately asks
        # (tests document that degradation). Production callers
        # (DenseIndex "pallas-bank") pass min_candidates=k so a small
        # corpus raises here and falls back to the exact scan instead
        # of silently returning -1-padded half-recall results
        # (round-5 review: recall 0.448 at capacity 1024 / k=500).
        raise ValueError(
            f"bank candidate table {nblocks}x{out_k} cannot reach "
            f"min_candidates={min_candidates}; use a smaller k or the "
            f"exact path"
        )

    # Pad B up to the sublane tile (int8 tiles are 32 sublanes deep).
    b_pad = _round_up(max(b, 8), 32 if quantized else 8)
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))

    count_arr = jnp.asarray(count, dtype=jnp.int32).reshape(1)

    in_specs = [
        pl.BlockSpec((b_pad, d), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (block_size, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM
        ),
    ]
    inputs = [queries.astype(corpus.dtype), corpus]
    if quantized:
        from tristage_rag_tpu.index.token_cache import symmetric_int8

        q8, qs = symmetric_int8(queries)
        if mode == "bankT":
            # transposed kernel: scores land [BLK, B], so the query
            # scales broadcast on LANES ([1, B]) and the doc scales on
            # sublanes ([BLK, 1] per-block slices of [n, 1])
            inputs = [
                q8,
                corpus,
                qs.astype(jnp.float32).reshape(1, b_pad),
                scales.astype(jnp.float32).reshape(n, 1),
            ]
            in_specs += [
                pl.BlockSpec(
                    (1, b_pad), lambda i, c: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block_size, 1), lambda i, c: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
        else:
            inputs = [
                q8,
                corpus,
                qs.astype(jnp.float32).reshape(b_pad, 1),
                scales.astype(jnp.float32).reshape(1, n),
            ]
            in_specs += [
                pl.BlockSpec(
                    (b_pad, 1), lambda i, c: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block_size), lambda i, c: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ]

    # bankT emits bank-major [out_k, B] blocks; the others [B, out_k]
    out_block = (
        (1, out_k, b_pad) if mode == "bankT" else (1, b_pad, out_k)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                out_block, lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                out_block, lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=(
            # bank mode stages the block's scores in VMEM so per-bank
            # tiles come from static ref slices (lane shape-casts of a
            # register value do not lower)
            [pltpu.VMEM((b_pad, block_size), jnp.float32)]
            if mode == "bank"
            else []
        ),
    )
    if mode in ("bank", "bankT"):
        kernel = functools.partial(
            _bank_topk_kernel if mode == "bank" else _bankT_topk_kernel,
            block_size=block_size,
            per_block_k=per_block_k,
            bank_top=bank_top,
            quantized=quantized,
        )
    else:
        kernel = functools.partial(
            _block_topk_kernel,
            block_size=block_size,
            per_block_k=per_block_k,
            quantized=quantized,
        )
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nblocks,) + out_block[1:], jnp.float32),
            jax.ShapeDtypeStruct((nblocks,) + out_block[1:], jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize
            + b_pad * d * 4
            + 2 * b_pad * nblocks * out_k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(count_arr, *inputs)

    # Exact merge of the (tiny) per-block candidates.
    if mode == "bankT":  # [nb, out_k, B] -> [B, nb*out_k]
        vals = jnp.transpose(vals, (2, 0, 1)).reshape(
            b_pad, nblocks * out_k
        )
        idx = jnp.transpose(idx, (2, 0, 1)).reshape(
            b_pad, nblocks * out_k
        )
    else:
        vals = jnp.moveaxis(vals, 0, 1).reshape(b_pad, nblocks * out_k)
        idx = jnp.moveaxis(idx, 0, 1).reshape(b_pad, nblocks * out_k)
    k_eff = min(k, vals.shape[1])
    top_vals, pos = jax.lax.top_k(vals, k_eff)
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    top_idx = jnp.where(top_vals > NEG_INF / 2, top_idx, -1)
    if k_eff < k:
        top_vals = jnp.pad(
            top_vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF
        )
        top_idx = jnp.pad(top_idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return top_vals[:b], top_idx[:b]

"""On-TPU measurement of the clustered (IVF-equivalent) stage-1 path.

Sweeps n_probe at several batch sizes against the exact and approx
full-scan baselines, reporting QPS + recall@k. The expected shape of
the result (ops/blockskip.py): the win grows as batch shrinks — a B=1
query reads ~probe-fraction of the corpus instead of all of it, which
is the low-latency serving case the full-scan matmul is worst at.

Timing uses the chained-dependency loop (utils/benchtime.py) — the
axon relay acks dispatches before completion, so naive timing lies.

Usage:
  python scripts/bench_clustered.py [--n 1048576] [--batches 1 8 128]
      [--probes 16 32 64 128] [--block 1024] [--k 500]
Prints one JSON line per measured row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--iters-kmeans", type=int, default=10)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 128])
    ap.add_argument("--probes", type=int, nargs="+",
                    default=[16, 32, 64, 128])
    ap.add_argument("--tile-q", type=int, default=8)
    ap.add_argument(
        "--kernel", default="xla", choices=["xla", "pallas"],
        help="probed-pool scoring path: xla gather+dot, or the "
        "scalar-prefetch Pallas gather-matmul",
    )
    ap.add_argument("--recall-queries", type=int, default=64)
    ap.add_argument(
        "--corpus", default="clustered", choices=["clustered", "random"],
        help="clustered = mixture around n/1024 directions (the shape "
        "of real embedding corpora, where IVF-style pruning earns its "
        "recall); random = isotropic adversarial floor, where recall "
        "cannot exceed the scan fraction by construction",
    )
    ap.add_argument("--spread", type=float, default=0.4)
    ap.add_argument(
        "--no-time", action="store_true",
        help="recall-only (skip chained-loop timing; CPU validation)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the sitecustomize pins axon; the "
        "JAX_PLATFORMS env var alone does NOT override it)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tristage_rag_tpu.ops.blockskip import (
        block_centroids, blockskip_topk, pack_blocks,
    )
    from tristage_rag_tpu.ops.cluster import (
        cluster_pack_order, spherical_kmeans,
    )
    from tristage_rag_tpu.ops.topk import masked_approx_topk, masked_topk
    from tristage_rag_tpu.utils.benchtime import chained_loop_time

    n, d, k = args.n, args.d, args.k
    docs = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    if args.corpus == "clustered":
        n_centers = max(64, n // 1024)
        centers = jax.random.normal(
            jax.random.PRNGKey(7), (n_centers, d), dtype=jnp.float32
        )
        centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
        which = jax.random.randint(
            jax.random.PRNGKey(8), (n,), 0, n_centers
        )
        # noise normalized per row so --spread IS the noise:signal
        # ratio (unnormalized gaussian noise has norm ~sqrt(d) and
        # would drown the cluster structure at any realistic spread)
        docs = docs / jnp.linalg.norm(docs, axis=1, keepdims=True)
        docs = jnp.take(centers, which, axis=0) + args.spread * docs
    norm = jnp.sqrt(jnp.sum(jnp.square(docs), axis=1, keepdims=True))
    docs = (docs / jnp.maximum(norm, 1e-9)).astype(jnp.bfloat16)
    # queries near corpus rows (pure-random queries make every block
    # equally bad and under-report IVF-style recall exactly as they
    # would for FAISS; perturbation sigma=0.3 keeps it adversarial)
    base = docs[: max(args.batches) + args.recall_queries].astype(jnp.float32)
    noise = jax.random.normal(
        jax.random.PRNGKey(1), base.shape, dtype=jnp.float32
    )
    noise = noise / jnp.linalg.norm(noise, axis=1, keepdims=True)
    qall = base + 0.3 * noise
    qall = qall / jnp.linalg.norm(qall, axis=1, keepdims=True)
    qall = qall.astype(jnp.bfloat16)
    count = jnp.int32(n)

    t0 = time.perf_counter()
    cents_km, assign = spherical_kmeans(
        docs, args.factor * (n // args.block), n_iter=args.iters_kmeans,
        seed=0,
    )
    order = cluster_pack_order(np.asarray(cents_km), assign)
    blocked, row_ids = pack_blocks(docs, order, args.block)
    cents = block_centroids(blocked, row_ids)
    jax.block_until_ready(cents)
    build_s = time.perf_counter() - t0
    print(json.dumps({
        "path": "build", "n": n, "block": args.block,
        "corpus": args.corpus,
        "n_blocks": int(row_ids.shape[0]),
        "n_clusters": args.factor * (n // args.block),
        "build_s_wall": round(build_s, 2),
    }), flush=True)

    rq = qall[: args.recall_queries]
    exact_ids = np.asarray(
        masked_topk(rq, docs, count, k=k)[1]
    )

    def recall_of(ids):
        ids = np.asarray(ids)[:, :k]
        return float(np.mean([
            len(set(ids[r].tolist()) & set(exact_ids[r].tolist())) / k
            for r in range(ids.shape[0])
        ]))

    row_ids_j = jnp.asarray(row_ids)
    for b in args.batches:
        q = qall[:b]

        def exact_step(qq, dd):
            return masked_topk(qq, dd, count, k=k)

        def approx_step(qq, dd):
            return masked_approx_topk(qq, dd, count, k=k,
                                      recall_target=0.95)

        if not args.no_time:
            for name, fn in (("exact", exact_step), ("approx", approx_step)):
                ms = chained_loop_time(fn, q, docs, args.iters) * 1000
                print(json.dumps({
                    "path": f"fullscan_{name}", "batch": b,
                    "ms_per_batch": round(ms, 3),
                    "qps": round(b / ms * 1000, 1),
                }), flush=True)

        for p in args.probes:
            def clustered_step(qq, dd, p=p):
                return blockskip_topk(
                    qq, dd, row_ids_j, cents, k=k, n_probe=p,
                    tile_q=args.tile_q, impl=args.kernel,
                    interpret=args.kernel == "pallas" and args.cpu,
                )

            rec = recall_of(clustered_step(rq, blocked)[1])
            row = {
                "path": "clustered", "kernel": args.kernel,
                "batch": b, "n_probe": p,
                "scan_frac": round(p * args.block / n, 4),
                "recall_at_k": round(rec, 4),
            }
            if not args.no_time:
                ms = chained_loop_time(clustered_step, q, blocked,
                                       args.iters) * 1000
                row.update(ms_per_batch=round(ms, 3),
                           qps=round(b / ms * 1000, 1))
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

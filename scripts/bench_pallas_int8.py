"""On-TPU measurement of the Pallas bank-mode kernel and the int8 index.

VERDICT r1 missing-4: both were compile-gated on the tunnel last round
and their speedups were extrapolations. This measures them for real,
with the same chained-dependency timing as bench.py (the axon relay
acks dispatches before completion, so block_until_ready lies; chaining
each iteration's output into the next input forces serial execution).

Usage:
  python scripts/bench_pallas_int8.py [--n 1048576] [--batch 128] [--k 500]
  python scripts/bench_pallas_int8.py --path int8       # int8 only
  python scripts/bench_pallas_int8.py --path bank       # bank mode only
Prints one JSON line per measured path.
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


def timed_loop(step_fn, q, docs, iters: int):
    from tristage_rag_tpu.utils.benchtime import chained_loop_time

    return chained_loop_time(step_fn, q, docs, iters)


def recall_vs_exact(step_fn, q, docs, k, exact_ids):
    _, ids = jax.jit(step_fn)(q, docs)
    ids = np.asarray(ids)[:, :k]
    hits = [
        len(set(ids[r]) & set(exact_ids[r])) / k for r in range(ids.shape[0])
    ]
    return float(np.mean(hits))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--path", default="all", choices=["all", "bank", "int8"])
    args = ap.parse_args()

    from tristage_rag_tpu.index.dense import _quantize_rows
    from tristage_rag_tpu.ops.pallas_topk import fused_matmul_topk

    n, d, k, b = args.n, args.d, args.k, args.batch
    docs = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.bfloat16)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(docs.astype(jnp.float32)), axis=1, keepdims=True)
    )
    docs = (docs.astype(jnp.float32) / jnp.maximum(norm, 1e-9)).astype(
        jnp.bfloat16
    )
    q = jax.random.normal(jax.random.PRNGKey(1), (b, d), dtype=jnp.bfloat16)
    count = jnp.int32(n)

    # exact reference ids for recall (computed once via approx with
    # recall 1.0-equivalent exact top_k on a slice of queries)
    def exact_step(q, dd):
        s = jnp.einsum("bd,nd->bn", q, dd, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, k)

    exact_ids = np.asarray(jax.jit(exact_step)(q[:16], docs)[1])

    results = {}

    if args.path in ("all", "bank"):
        # bankT (round 5): transposed scores make the bank reduce a
        # sublane reshape — 3-6x the lane-sliced bank form; top2 is
        # the ~0.99-selection point (BENCH_NOTES round 5)
        for name, btop in (("pallas_bankT", 1), ("pallas_bankT2", 2)):
            def bank_step(qq, dd, _bt=btop):
                return fused_matmul_topk(
                    qq, dd, count, k=k, mode="bankT", bank_top=_bt
                )

            rec = recall_vs_exact(bank_step, q[:16], docs, k, exact_ids)
            ms = timed_loop(bank_step, q, docs, args.iters) * 1000
            results[name] = {
                "ms_per_batch": ms, "qps": b / ms * 1000,
                "recall_at_k": rec,
            }
            print(json.dumps({"path": name, **results[name]}), flush=True)

    if args.path in ("all", "int8"):
        q8corpus, scales = _quantize_rows(docs.astype(jnp.float32))

        def int8_step(qq, dd):
            s = jnp.einsum(
                "bd,nd->bn", qq.astype(jnp.bfloat16), dd.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * scales[None, :]
            return jax.lax.approx_max_k(s, k, recall_target=0.95)

        rec = recall_vs_exact(int8_step, q[:16], q8corpus, k, exact_ids)
        ms = timed_loop(int8_step, q, q8corpus, args.iters) * 1000
        results["int8_approx"] = {
            "ms_per_batch": ms, "qps": b / ms * 1000, "recall_at_k": rec,
        }
        print(json.dumps({"path": "int8_approx", **results["int8_approx"]}),
              flush=True)

        def bf16_step(qq, dd):
            s = jnp.einsum(
                "bd,nd->bn", qq, dd, preferred_element_type=jnp.float32
            )
            return jax.lax.approx_max_k(s, k, recall_target=0.95)

        ms = timed_loop(bf16_step, q, docs, args.iters) * 1000
        results["bf16_approx"] = {"ms_per_batch": ms, "qps": b / ms * 1000}
        print(json.dumps({"path": "bf16_approx", **results["bf16_approx"]}),
              flush=True)


if __name__ == "__main__":
    main()

"""Headline benchmark: stage-1 dense retrieval QPS on one TPU chip.

Prints ONE JSON line:
  {"metric": "stage1_qps", "value": N, "unit": "qps", "vs_baseline": R,
   "recall_at_k": r, "exact_qps": E,
   "int8_approx_qps": Q8, "int8_recall_at_k": r8,
   "funnel_ms_per_query": F, "funnel_vs_target": 20/F,
   "indexing_docs_s": D}

The funnel fields are the END-TO-END tri-stage device time at the
BASELINE.md protocol shape (full-size archs, 2k docs, 500/100/20,
shipped default config), measured by scripts/bench_funnel_gate.py in
a timeout-bounded subprocess (skipped, never fatal, on failure;
BENCH_NO_FUNNEL=1 disables).

The headline `value` is pinned to the DEFAULT storage path (bf16 corpus
+ XLA approx_max_k) so vs_baseline stays apples-to-apples across
rounds; the opt-in int8 storage mode is reported as its own fields with
its own measured recall, and `exact_qps` is the exact XLA top_k path so
a reader of the JSON alone can see what accuracy the headline trades.

Setup mirrors BASELINE.md's north-star config: corpus of 1M (2^20)
768-dim bf16 embeddings resident in HBM, query batch 128, exact-merge
fused top-500. vs_baseline is measured QPS / 10,000 (the >10k QPS
target; the reference publishes no numbers of its own — BASELINE.md).

Timing method: the axon relay acks dispatches before device completion,
so block_until_ready under-measures. We therefore time
jit(fori_loop(op)) at two iteration counts and difference out the RTT +
dispatch overhead (each iteration's output feeds the next input, so the
device cannot overlap iterations).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

import os as _os

N = int(_os.environ.get("BENCH_N", 1 << 20))  # 1,048,576 docs
D = 768
K = int(_os.environ.get("BENCH_K", 500))
B = 128
BASELINE_QPS = 10_000.0


def _timed_loop(step_fn, q, docs, iters: int):
    from tristage_rag_tpu.utils.benchtime import chained_loop_time

    return chained_loop_time(step_fn, q, docs, iters)


def _run_funnel_leg() -> dict:
    """End-to-end funnel leg in a timeout-bounded SUBPROCESS (see
    scripts/bench_funnel_gate.py). Runs BEFORE this process touches the
    device: TPU runtimes are exclusive per-process, so the child must
    own the chip while it measures. Never fatal — on any failure the
    stage-1 headline ships without the funnel fields."""
    if _os.environ.get("BENCH_NO_FUNNEL"):
        return {}
    import subprocess

    try:
        res = subprocess.run(
            [sys.executable, "-u",
             _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "scripts", "bench_funnel_gate.py")],
            capture_output=True, text=True, timeout=1800,
        )
        for line in res.stdout.splitlines()[::-1]:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        print(f"# funnel leg produced no JSON (rc={res.returncode}): "
              f"{res.stderr[-300:]}", file=sys.stderr)
    except Exception as e:
        print(f"# funnel leg skipped: {e}", file=sys.stderr)
    return {}


def main() -> None:
    funnel = _run_funnel_leg()  # before any device allocation here
    docs = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    # L2-normalize on device (cosine / inner-product equivalence).
    norm = jnp.sqrt(jnp.sum(jnp.square(docs.astype(jnp.float32)), axis=1, keepdims=True))
    docs = (docs.astype(jnp.float32) / jnp.maximum(norm, 1e-9)).astype(jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype=jnp.bfloat16)
    count = jnp.int32(N)

    candidates = {}

    def xla_approx_step(q, d):
        s = jnp.einsum("bd,nd->bn", q, d, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, K, recall_target=0.95)

    def xla_exact_step(q, d):
        s = jnp.einsum("bd,nd->bn", q, d, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)

    paths = [("xla_approx", xla_approx_step, docs)]

    # int8 storage mode (opt-in `index_int8` config): per-row symmetric
    # quantization, dequant fused into the matmul's HBM read — halves
    # the corpus-read bytes that bound this op. Measured on v5e
    # (2026-08-16): 1.55 ms/batch, 82,809 QPS, recall@500 = 0.981 vs
    # exact (bf16 approx: 2.22 ms). Reported as its OWN metric fields,
    # never as the headline (ADVICE r2: keep vs_baseline pinned to the
    # shipped default path).
    int8_ready = False
    try:
        from tristage_rag_tpu.index.dense import _quantize_rows

        q8docs, scales = _quantize_rows(docs.astype(jnp.float32))

        def int8_approx_step(q, d):
            s = jnp.einsum(
                "bd,nd->bn", q.astype(jnp.bfloat16), d.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * scales[None, :]
            return jax.lax.approx_max_k(s, K, recall_target=0.95)

        paths.append(("int8_approx", int8_approx_step, q8docs))
        int8_ready = True
    except Exception as e:
        print(f"# int8 path unavailable: {e}", file=sys.stderr)
    # Exact XLA top_k is ~77x slower at this scale, so it gets few
    # iterations — it is here to put the recall cost of the headline in
    # context, not to win. The fused Pallas kernel pays a ~5 min Mosaic
    # remote-compile on tunneled dev TPUs, so it stays opt-in.
    import os

    paths.append(("xla_exact", xla_exact_step, docs))
    if os.environ.get("BENCH_PALLAS"):
        from tristage_rag_tpu.ops.pallas_topk import fused_matmul_topk

        def pallas_step(q, d):
            return fused_matmul_topk(q, d, count, k=K)

        def pallas_bank_step(q, d):
            return fused_matmul_topk(q, d, count, k=K, mode="bank")

        paths.insert(0, ("pallas_fused_exact", pallas_step, docs))
        paths.insert(0, ("pallas_fused_bank", pallas_bank_step, docs))
        if int8_ready:
            # int8 x int8 on the MXU + half the HBM read — the XLA
            # int8 path only gets the read saving (it dequantizes into
            # a float dot, staying compute-bound: 82.8k vs 76.9k QPS).
            def pallas_int8_step(q, d):
                return fused_matmul_topk(
                    q.astype(jnp.float32), d, count, k=K, scales=scales
                )

            def pallas_int8_bank_step(q, d):
                return fused_matmul_topk(
                    q.astype(jnp.float32), d, count, k=K, mode="bank",
                    scales=scales,
                )

            paths.insert(0, ("pallas_int8_exact", pallas_int8_step, q8docs))
            paths.insert(
                0, ("pallas_int8_bank", pallas_int8_bank_step, q8docs)
            )

    iters_for = {"xla_exact": 6}
    for name, fn, corpus in paths:
        try:
            per_iter = _timed_loop(fn, q, corpus, iters=iters_for.get(name, 30))
            candidates[name] = B / per_iter
            print(f"# {name}: {per_iter * 1e3:.3f} ms/batch "
                  f"({candidates[name]:.0f} qps)", file=sys.stderr)
        except Exception as e:  # keep the bench alive if one path breaks
            print(f"# {name} failed: {e}", file=sys.stderr)

    if "xla_approx" not in candidates:
        raise SystemExit("default-path benchmark failed")

    # Measured recall@K of each approx path vs exact, on this corpus +
    # query batch (one fetch each; set membership per query, averaged).
    recalls = {}
    try:
        exact_ids = jax.device_get(jax.jit(xla_exact_step)(q, docs)[1])
        recall_paths = [("xla_approx", xla_approx_step, docs)]
        if int8_ready:
            recall_paths.append(("int8_approx", int8_approx_step, q8docs))
        if os.environ.get("BENCH_PALLAS") and int8_ready:
            recall_paths += [
                ("pallas_int8_exact", pallas_int8_step, q8docs),
                ("pallas_int8_bank", pallas_int8_bank_step, q8docs),
            ]
        for name, step, corpus in recall_paths:
            ids = jax.device_get(jax.jit(step)(q, corpus)[1])
            hit = sum(
                len(set(ids[b].tolist()) & set(exact_ids[b].tolist()))
                for b in range(B)
            )
            recalls[name] = hit / float(B * K)
            print(f"# {name} recall@{K}: {recalls[name]:.4f}", file=sys.stderr)
    except Exception as e:
        print(f"# recall measurement failed: {e}", file=sys.stderr)

    out = {
        "metric": "stage1_qps",
        "value": round(candidates["xla_approx"], 1),
        "unit": "qps",
        "vs_baseline": round(candidates["xla_approx"] / BASELINE_QPS, 3),
    }
    if "xla_approx" in recalls:
        out["recall_at_k"] = round(recalls["xla_approx"], 4)
    if "xla_exact" in candidates:
        out["exact_qps"] = round(candidates["xla_exact"], 1)
    if "int8_approx" in candidates:
        out["int8_approx_qps"] = round(candidates["int8_approx"], 1)
        if "int8_approx" in recalls:
            out["int8_recall_at_k"] = round(recalls["int8_approx"], 4)
    for pal in ("pallas_int8_exact", "pallas_int8_bank"):
        if pal in candidates:
            out[f"{pal}_qps"] = round(candidates[pal], 1)
            if pal in recalls:
                out[f"{pal}_recall_at_k"] = round(recalls[pal], 4)
    if "funnel_ms_per_query" in funnel:
        out["funnel_ms_per_query"] = funnel["funnel_ms_per_query"]
        # latency target ratio, higher = better (BASELINE.md <20 ms)
        out["funnel_vs_target"] = round(
            20.0 / max(funnel["funnel_ms_per_query"], 1e-9), 2
        )
        if "indexed_docs_s" in funnel:
            out["indexing_docs_s"] = funnel["indexed_docs_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()

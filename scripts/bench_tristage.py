"""Full tri-stage latency benchmark on the real TPU.

Measures p50/p95 single-query latency of the FUSED single-dispatch path
(engine/fused.py) vs the staged path, full-size architectures (random
weights — latency is weight-independent), 2k docs, funnel 500/100/20:
the BASELINE.md <20 ms p50 target configuration, matching the round-1
BENCH_NOTES setup so numbers are comparable.

Timing is honest under the axon relay: every search() fetches its
result arrays to host (np.asarray), which cannot complete before the
device finishes, so wall-clock per query includes the full round trip.
RTT is reported separately via an empty-dispatch probe.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def make_docs(n: int, seed: int = 0, short: bool = False) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = [
        "retrieval", "tensor", "memory", "kernel", "fusion", "query",
        "document", "ranking", "lexical", "semantic", "index", "shard",
        "latency", "bandwidth", "systolic", "matrix", "token", "encode",
        "search", "score", "batch", "cache", "device", "compile",
    ]
    docs = []
    for i in range(n):
        lo, hi = (6, 14) if short else (20, 60)
        words = rng.choice(vocab, size=rng.integers(lo, hi))
        docs.append(f"doc {i}: " + " ".join(words))
    return docs


def measure(pipeline, queries, warmup=3, reps=30):
    reps = max(reps, 1)
    for q in queries[:warmup]:
        pipeline.search(q)
    lat, fused_flags = [], []
    for i in range(reps):
        q = queries[i % len(queries)]
        t0 = time.perf_counter()
        out = pipeline.search(q)
        lat.append(time.perf_counter() - t0)
        fused_flags.append(bool(out["timing"].get("fused")))
    lat = np.asarray(lat) * 1000.0
    return {
        "p50_ms": float(np.percentile(lat, 50)),
        "p95_ms": float(np.percentile(lat, 95)),
        "mean_ms": float(lat.mean()),
        # every rep must have taken the fused path, not just the last
        "fused": all(fused_flags),
    }


def rtt_probe() -> float:
    """Median host<->device round-trip for a trivial fetch."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(())
    f = jax.jit(lambda v: v + 1)
    float(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--tiny", action="store_true", help="tiny archs (CPU dev)")
    ap.add_argument("--staged-also", action="store_true")
    ap.add_argument("--short-docs", action="store_true",
                    help="LIMIT-style ~10-token passages: exercises the "
                         "stage-3 pair-width bucket (engine/fused.py)")
    ap.add_argument("--maxsim", default="xla", choices=("xla", "pallas"),
                    help="staged-path MaxSim impl (stage2_maxsim_impl; "
                         "pallas streams candidate blocks through VMEM)")
    ap.add_argument("--batch", type=int, default=0,
                    help="also measure batch_search throughput at this "
                         "batch size (full funnel, one dispatch)")
    args = ap.parse_args()

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    if args.tiny:
        models = dict(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert",
        )
    else:
        models = dict(
            stage1_model="embeddinggemma-300m",
            stage2_model="gte-moderncolbert",
            stage3_model="minilm-l6-cross",
        )
    base = dict(
        stage1_top_k=500, stage2_top_k=100, stage3_top_k=20,
        stage1_bm25_top_k=300,
        stage2_cache_doc_embeddings=True,
        mesh_data_parallel=1,
        stage2_maxsim_impl=args.maxsim,
        **models,
    )
    docs = make_docs(args.docs, short=args.short_docs)
    queries = [
        "semantic retrieval ranking kernel",
        "memory bandwidth systolic matrix",
        "lexical query fusion cache",
        "token encode batch device",
        "index shard latency search",
    ]

    print(f"# rtt_probe: {rtt_probe():.1f} ms", flush=True)

    p = RetrievalPipeline(PipelineConfig(enable_fused_search=True, **base))
    t0 = time.time()
    p.add_documents(docs)
    print(f"# indexed {args.docs} docs in {time.time()-t0:.1f}s "
          f"({args.docs/(time.time()-t0):.0f} docs/s)", flush=True)
    fused = measure(p, queries, reps=args.reps)
    print(f"# fused: {json.dumps(fused)}", flush=True)
    if p._fused is not None and p._fused.ready():
        probe = p._fused.device_time_probe(queries[0], iters=32)
        print(f"# device_time_probe: {json.dumps(probe)}", flush=True)
        fused["device_ms"] = probe["per_query_ms"]

    if args.batch:
        # Full-funnel serving throughput: N queries through ONE
        # batched fused dispatch (lax.map over the fused program).
        # Wall-clock includes the host fetch of every result, so the
        # acking relay cannot make it under-report.
        bqs = [
            f"{queries[i % len(queries)]} variant {i}"
            for i in range(args.batch)
        ]
        p.batch_search(bqs)  # warm the batch-shape compile
        reps = max(3, min(10, args.reps))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = p.batch_search(bqs)
            times.append(time.perf_counter() - t0)
            assert len(outs) == args.batch and all(
                o["results"] for o in outs
            ), "batched search returned empty results"
        best = min(times)
        print(json.dumps({
            "metric": "tristage_batched_qps", "batch": args.batch,
            "seconds_per_batch": round(best, 4),
            "value": round(args.batch / best, 1), "unit": "qps",
            "fused": all(o["timing"].get("fused") for o in outs),
        }), flush=True)

    if args.staged_also:
        p2 = RetrievalPipeline(PipelineConfig(enable_fused_search=False, **base))
        p2.add_documents(docs)
        staged = measure(p2, queries, reps=args.reps)
        print(f"# staged: {json.dumps(staged)}")

    final = {
        "metric": "tristage_p50_latency", "value": fused["p50_ms"],
        "unit": "ms", "vs_baseline": 20.0 / fused["p50_ms"],
    }
    if "device_ms" in fused:
        final["device_ms"] = fused["device_ms"]
    print(json.dumps(final))


if __name__ == "__main__":
    main()

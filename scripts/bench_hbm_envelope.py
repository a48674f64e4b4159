"""Three-cache HBM envelope at scale, on one chip (VERDICT r2 next-8).

One run with ALL serving caches resident — dense index (bf16 or int8),
stage-2 int8 token cache, stage-3 doc token-id cache — recording HBM
bytes per cache, fill time per phase, and fused device time per query.
The per-cache numbers existed in isolation (BENCH_NOTES); this measures
the combined envelope one chip actually serves (BASELINE.md §3 "equal
index memory").

Usage:
  PYTHONPATH=/root/repo python -u scripts/bench_hbm_envelope.py \
      --docs 100000                         # full-size archs, real TPU
  ... --tiny --docs 2000                    # CPU smoke
Prints one JSON line per cache and a final envelope line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_docs(n: int, seed: int = 0) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = [
        "retrieval", "tensor", "memory", "kernel", "fusion", "query",
        "document", "ranking", "lexical", "semantic", "index", "shard",
        "latency", "bandwidth", "systolic", "matrix", "token", "encode",
        "search", "score", "batch", "cache", "device", "compile",
    ]
    return [
        f"doc {i}: " + " ".join(rng.choice(vocab, size=rng.integers(20, 60)))
        for i in range(n)
    ]


def _nbytes(*arrays) -> int:
    return sum(int(a.nbytes) for a in arrays if a is not None)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--chunk", type=int, default=10_000,
                    help="docs per add_documents call")
    ap.add_argument("--dense-int8", action="store_true",
                    help="also quantize the dense index storage")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    if args.tiny:
        models = dict(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
        )
    else:
        models = dict(
            stage1_model="embeddinggemma-300m",
            stage2_model="gte-moderncolbert",
            stage3_model="minilm-l6-cross",
        )
    cfg = PipelineConfig(
        stage1_top_k=500, stage2_top_k=100, stage3_top_k=20,
        stage2_cache_doc_embeddings=True, stage2_cache_int8=True,
        stage2_cache_max_docs=args.docs + 1024,
        enable_fused_search=True, mesh_data_parallel=1,
        index_dtype="int8" if args.dense_int8 else "bfloat16",
        **models,
    )
    p = RetrievalPipeline(cfg)
    p.initialize_stages()

    # Reserve final capacities first: growth inside the fill would
    # re-key the scatter jits (remote compiles mid-measurement) and pay
    # eager copy costs — the same rule as scripts/bench_indexing.py.
    final_ids = args.docs + 64
    if p.stage2._cache is not None:
        p.stage2._cache.reserve(final_ids)
    if p._fused is not None:
        p._fused.doc_tokens.reserve(final_ids)
    # warmup: compile every fill op at final buffer shapes
    t0 = time.time()
    p.add_documents(make_docs(64, seed=7))
    print(f"# warmup 64 docs (compiles): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    n_done = 0  # measured-fill docs only (warmup is outside the clock)
    for lo in range(0, args.docs, args.chunk):
        chunk = make_docs(min(args.chunk, args.docs - lo), seed=100 + lo)
        p.add_documents(chunk)
        n_done += len(chunk)
        print(f"# filled {n_done} docs ({n_done / (time.time() - t0):.0f} "
              f"docs/s, dispatch-side)", flush=True)
    # Completion barrier BEFORE the clock stops: add_documents only
    # dispatches; the acking relay returns before the device finishes,
    # so without a data-dependent fetch fill_s measures host
    # tokenization throughput, not indexing throughput.
    import jax.numpy as jnp

    barrier = jnp.sum(p.stage1.index._buf[:1].astype(jnp.float32))
    if p.stage2._cache is not None:
        barrier = barrier + jnp.sum(
            p.stage2._cache.state()[0][:1].astype(jnp.float32)
        )
    if p._fused is not None:
        barrier = barrier + jnp.sum(
            p._fused.doc_tokens.state()[0][:1].astype(jnp.float32)
        )
    float(barrier)
    fill_s = time.time() - t0

    idx = p.stage1.index
    dense_bytes = _nbytes(idx._buf) + _nbytes(
        getattr(idx, "_scales", None), getattr(idx, "_del_mask", None)
    )
    s2 = p.stage2._cache
    s2_bytes = _nbytes(s2._buf, s2._scale, s2._mask) if s2 else 0
    dt = p._fused.doc_tokens if p._fused else None
    s3_bytes = _nbytes(dt._buf, dt._len) if dt else 0

    for name, nbytes, extra in (
        ("dense_index", dense_bytes,
         {"dtype": cfg.index_dtype, "capacity": idx.capacity}),
        ("stage2_token_cache", s2_bytes,
         {"int8": True, "capacity": s2.capacity if s2 else 0}),
        ("stage3_token_cache", s3_bytes,
         {"capacity": dt.capacity if dt else 0}),
    ):
        print(json.dumps({
            "cache": name, "gb": round(nbytes / 2**30, 3),
            "bytes_per_doc": round(nbytes / max(args.docs, 1), 1), **extra,
        }), flush=True)

    probe = {}
    if p._fused is not None and p._fused.ready():
        probe = p._fused.device_time_probe(
            "semantic retrieval ranking kernel", iters=16
        )
        print(f"# device_time_probe: {json.dumps(probe)}", flush=True)
    out = p.search("semantic retrieval ranking kernel", top_k=5)
    assert out["results"], "post-fill search returned nothing"

    total = dense_bytes + s2_bytes + s3_bytes
    print(json.dumps({
        "metric": "hbm_envelope",
        "docs": args.docs,
        "total_gb": round(total / 2**30, 3),
        "gb_dense": round(dense_bytes / 2**30, 3),
        "gb_stage2_int8": round(s2_bytes / 2**30, 3),
        "gb_stage3": round(s3_bytes / 2**30, 3),
        "fill_s": round(fill_s, 1),
        "fill_docs_per_s": round(args.docs / fill_s, 1),
        "fused_device_ms_per_query": round(
            probe.get("per_query_ms", 0.0), 2
        ),
        "fused": bool(out["timing"].get("fused")),
    }), flush=True)


if __name__ == "__main__":
    main()

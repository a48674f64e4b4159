"""Indexing throughput on the real TPU: per-phase breakdown + tuning.

VERDICT r1 weak-6: single-chip indexing throughput (81 docs/s) was thin
and unexplained. This script splits `pipeline.add_documents` into its
three device phases and measures each honestly under the acking relay
(every phase ends with a host fetch of a scalar that DEPENDS on the
phase's output buffers, so the fetch cannot complete before the device
work does):

  1. stage-1 bi-encode + dense-index add (+ host BM25 fit)
  2. stage-2 ColBERT token-embedding precompute -> device cache
  3. stage-3 doc token-id cache fill (host tokenize -> device scatter)

Usage:
  python scripts/bench_indexing.py --docs 2048                # default cfg
  python scripts/bench_indexing.py --docs 2048 --tuned        # bigger batches
  python scripts/bench_indexing.py --tiny                     # CPU smoke
Prints one JSON line per phase and a total docs/s line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

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
        f"doc {i}: " + " ".join(rng.choice(vocab, size=rng.integers(80, 200)))
        for i in range(n)
    ]


def dependent_fetch(*arrays) -> float:
    """Fetch a scalar that depends on every given device array — the
    relay acks dispatches early, so only a data-dependent fetch gives
    an honest 'phase done' timestamp."""
    import jax.numpy as jnp

    s = jnp.float32(0)
    for a in arrays:
        if a is not None:
            s = s + jnp.sum(a.astype(jnp.float32))
    return float(s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2048)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--tuned", action="store_true",
                    help="bigger encode batches + shorter s1 padding")
    ap.add_argument("--act-int8", default=None,
                    choices=("pallas", "static-pallas"),
                    help="run the stage-1/2 encoders with int8 "
                         "activations (stage{1,2}_act_int8) — the "
                         "indexing-throughput int8 x int8 MXU lever; "
                         "the *pallas modes use the fused "
                         "quant/dot/dequant kernel (ops/pallas_qdense)")
    ap.add_argument("--fused-mlp", action="store_true",
                    help="run the stage-1/2 encoders with the bf16 "
                         "whole-block fused MLP (stage{1,2}_fused_mlp)")
    ap.add_argument("--flash", action="store_true",
                    help="run the stage-1/2 encoders with flash "
                         "attention on padding-only layers "
                         "(stage{1,2}_flash_attention)")
    ap.add_argument("--weights-int8", action="store_true",
                    help="weight-only int8 stage-1/2 encoders "
                         "(stage{1,2}_weights_int8); with --fused-mlp "
                         "the MLP q8 dicts feed the Pallas kernel "
                         "directly (VMEM tile dequant)")
    args = ap.parse_args()

    if args.tiny:
        # tiny = CPU dev smoke; the axon sitecustomize forces the TPU
        # platform at import, so flip it back post-import.
        import jax

        jax.config.update("jax_platforms", "cpu")

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
    cfg = dict(
        stage1_top_k=500, stage2_top_k=100, stage3_top_k=20,
        stage2_cache_doc_embeddings=True, enable_fused_search=True,
        mesh_data_parallel=1, **models,
    )
    if args.tuned:
        cfg.update(
            stage1_batch_size=256, stage2_batch_size=64,
            stage1_max_text_length=256,
        )
    if args.act_int8:
        cfg.update(stage1_act_int8=args.act_int8,
                   stage2_act_int8=args.act_int8)
    # default is "auto" (kernel on for TPU): pin both ways so the
    # control leg really is the module path
    cfg.update(stage1_fused_mlp=args.fused_mlp,
               stage2_fused_mlp=args.fused_mlp)
    if args.flash:
        cfg.update(stage1_flash_attention=True, stage2_flash_attention=True)
    if args.weights_int8:
        cfg.update(stage1_weights_int8=True, stage2_weights_int8=True)
    docs = make_docs(args.docs)

    p = RetrievalPipeline(PipelineConfig(**cfg))
    p.initialize_stages()

    # ---- warm the compile caches so the measured run is steady-state
    # (first full-size compile ~minutes via tunnel). The warmup doc
    # count must reach the SAME batch buckets the measured run uses,
    # or bucket compiles land inside the measured phases (this bench's
    # first version warmed 8 docs and mis-attributed a 64-batch compile
    # to the stage-2 phase). --docs should be a multiple of both batch
    # sizes so the tail batch hits no new bucket.
    warm_n = max(
        p.config.stage1_batch_size, p.config.stage2_batch_size, 8
    )
    # Reserve final capacities BEFORE the bucket warmup: capacity
    # growth re-keys the scatter/write jits (one remote XLA compile per
    # doubling) — measured as ~12 s of a 15 s 2k-doc stage-2 fill.
    # Reserving first makes the warmup compile every write op at the
    # measured run's buffer shapes.
    final_ids = warm_n + args.docs + 72
    if p.stage2._cache is not None:
        p.stage2._cache.reserve(final_ids)
    if p._fused is not None:
        p._fused.doc_tokens.reserve(final_ids)
    p.add_documents(make_docs(8, seed=8))  # creates the lazy index
    p.stage1.index._grow(final_ids)
    if args.docs % p.config.stage1_batch_size or (
        args.docs % p.config.stage2_batch_size
    ):
        print(f"# note: --docs {args.docs} not a multiple of batch sizes; "
              f"tail batches may compile new buckets mid-phase", flush=True)
    t0 = time.time()
    p.add_documents(make_docs(warm_n, seed=9))
    dependent_fetch(
        p.stage1.index._buf,
        *(p.stage2._cache.state() if p.stage2._cache else (None,)),
    )
    print(f"# warmup ({warm_n} docs, compiles): {time.time() - t0:.1f}s",
          flush=True)

    start_id = len(p.stage1.documents)
    n = args.docs

    t0 = time.time()
    added = p.stage1.add_documents(docs)
    dependent_fetch(p.stage1.index._buf)
    t_s1 = time.time() - t0
    print(json.dumps({"phase": "stage1_encode_index_bm25",
                      "seconds": round(t_s1, 2),
                      "docs_per_s": round(n / t_s1, 1)}), flush=True)

    t0 = time.time()
    p.stage2.precompute(range(start_id, start_id + added), docs)
    if p.stage2._cache is not None:
        dependent_fetch(*p.stage2._cache.state())
    t_s2 = time.time() - t0
    print(json.dumps({"phase": "stage2_colbert_cache",
                      "seconds": round(t_s2, 2),
                      "docs_per_s": round(n / t_s2, 1)}), flush=True)

    t_s3 = 0.0
    if p._fused is not None:
        t0 = time.time()
        p._fused.precompute(range(start_id, start_id + added), docs)
        t_s3 = time.time() - t0
        print(json.dumps({"phase": "stage3_token_cache",
                          "seconds": round(t_s3, 2),
                          "docs_per_s": round(n / t_s3, 1)}), flush=True)

    total = t_s1 + t_s2 + t_s3
    print(json.dumps({
        "metric": "indexing_throughput",
        "value": round(n / total, 1), "unit": "docs/s",
        "config": ("tuned" if args.tuned else "default")
        + (f"+act_int8_{args.act_int8}" if args.act_int8 else "")
        + ("+fused_mlp" if args.fused_mlp else "")
        + ("+flash" if args.flash else "")
        + ("+weights_int8" if args.weights_int8 else ""),
        "total_seconds": round(total, 2),
    }), flush=True)

    # sanity: the index must actually answer
    out = p.search("semantic retrieval ranking kernel", top_k=3)
    assert out["results"], "post-indexing search returned nothing"
    print(f"# post-index search OK ({len(out['results'])} results, "
          f"fused={out['timing'].get('fused')})", flush=True)


if __name__ == "__main__":
    main()

"""Restart cost: load_index with vs without persisted device caches.

Without ``persist_device_caches`` a reload re-encodes the whole corpus
to refill the stage-2 token-embedding cache and the stage-3 token-id
cache; with it the saved buffers restore directly. This measures both
legs on the same saved index (build once, reload twice) and prints one
JSON line per leg.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/bench_restart.py --docs 2048
Run (CPU dev): ... --tiny --docs 300
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2048)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--int8-cache", action="store_true",
                    help="stage2_cache_int8 (halves the npz too)")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    if args.tiny:
        models = dict(stage1_model="tiny-gemma",
                      stage2_model="tiny-modernbert",
                      stage3_model="tiny-bert")
        caps = dict(stage1_max_text_length=64, stage2_max_seq_length=32,
                    stage3_max_length=64)
    else:
        models = dict(stage1_model="embeddinggemma-300m",
                      stage2_model="gte-moderncolbert",
                      stage3_model="minilm-l6-cross")
        caps = {}
    docs = [f"doc {i}: retrieval kernel fusion latency topic {i % 7} "
            f"memory bandwidth index shard " * 3 for i in range(args.docs)]
    idx = tempfile.mkdtemp(prefix="restart_bench_")

    def cfg(persist):
        return PipelineConfig(
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
            stage2_cache_int8=args.int8_cache, mesh_data_parallel=1,
            persist_device_caches=persist, index_dir=idx,
            **models, **caps,
        )

    build = RetrievalPipeline(cfg(persist=True))
    t0 = time.perf_counter()
    build.add_documents(docs)
    fill_s = time.perf_counter() - t0
    build.save_index()
    ref = [r["doc_id"]
           for r in build.search("retrieval kernel topic 3", top_k=5)["results"]]
    print(f"# initial fill: {fill_s:.1f}s ({args.docs / fill_s:.0f} docs/s)",
          flush=True)

    for leg, persist in (("restore", True), ("reencode", False)):
        p = RetrievalPipeline(cfg(persist))
        p.initialize_stages()
        t0 = time.perf_counter()
        assert p.load_index()
        load_s = time.perf_counter() - t0
        got = [r["doc_id"]
               for r in p.search("retrieval kernel topic 3", top_k=5)["results"]]
        assert got == ref, (leg, got, ref)
        print(json.dumps({
            "leg": leg, "docs": args.docs,
            "load_seconds": round(load_s, 2),
            "docs_per_s": round(args.docs / load_s, 1),
            "int8_cache": args.int8_cache,
        }), flush=True)


if __name__ == "__main__":
    main()

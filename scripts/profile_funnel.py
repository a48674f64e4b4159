"""Op-level profile of the fused funnel: bf16 vs int8-activation
stage-3.

BENCH_NOTES round 3 measured the per-dot int8 x int8 MXU win (1.2-2.9x
in isolation) INVERTING at the funnel level (-10-25%). This script
captures jax.profiler traces of the same fused program under each
variant so the slowdown can be attributed op-by-op (quant
materialization? broken matmul epilogue fusion? layout changes?).

Run (TPU):
  PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/profile_funnel.py \
      --docs 2000 --out /tmp/funnel_traces
Inspect with tensorboard (or xprof) pointed at the per-variant
subdirectories; `device_host_split` prints a coarse summary inline.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--width", type=int, default=100)
    ap.add_argument("--out", default="/tmp/funnel_traces")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--variants", nargs="+",
                    default=["bf16", "static-pallas"],
                    choices=["bf16", "pallas",
                             "static-pallas", "flash", "fused-mlp",
                             "flash-fused-mlp", "weights-int8",
                             "weights-int8-module", "dense-attn",
                             "weights-int8-fattn"])
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    if args.tiny:
        models = dict(stage1_model="tiny-gemma",
                      stage2_model="tiny-modernbert",
                      stage3_model="tiny-bert")
    else:
        models = dict(stage1_model="embeddinggemma-300m",
                      stage2_model="gte-moderncolbert",
                      stage3_model="minilm-l6-cross")
    docs = [f"doc {i}: retrieval kernel fusion latency topic {i % 7} "
            f"memory bandwidth index shard " * 4 for i in range(args.docs)]
    query = "retrieval kernel latency topic 3"

    mode_map = {"bf16": False,
                "pallas": "pallas", "static-pallas": "static-pallas"}
    kernel_map = {  # bf16 kernel variants (no quantization)
        "flash": {"stage3_flash_attention": True,
                  "stage3_fused_mlp": False},
        "fused-mlp": {"stage3_fused_mlp": True},
        "flash-fused-mlp": {"stage3_flash_attention": True,
                            "stage3_fused_mlp": True},
        # weight-only int8 on the batch-1 query encoders (stage-1/2):
        # the bandwidth lever candidate. "-module" pins the fused-MLP
        # kernel off to isolate how the XLA path lowers the dequant.
        "weights-int8": {"stage1_weights_int8": True,
                         "stage2_weights_int8": True},
        "weights-int8-module": {"stage1_weights_int8": True,
                                "stage2_weights_int8": True,
                                "stage1_fused_mlp": False,
                                "stage2_fused_mlp": False,
                                "stage3_fused_mlp": False},
        # control: small-bucket fused attention OFF (dense einsum
        # softmax path), everything else at defaults
        "dense-attn": {"stage1_fused_attention": False,
                       "stage2_fused_attention": False,
                       "stage3_fused_attention": False},
        # full serving stack: weight-int8 + all attention kernels
        "weights-int8-fattn": {"stage1_weights_int8": True,
                               "stage2_weights_int8": True},
    }
    for variant in args.variants:
        # stage*_fused_mlp defaults to "auto" (kernel ON on TPU): the
        # non-kernel variants pin it off so they profile the module path
        overrides = (kernel_map[variant] if variant in kernel_map
                     else {"stage3_act_int8": mode_map[variant],
                           "stage3_fused_mlp": False})
        cfg = PipelineConfig(
            stage1_top_k=500, stage2_top_k=args.width, stage3_top_k=20,
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
            mesh_data_parallel=1, **overrides,
            **models,
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(docs)
        # warm: compile + (static) calibration outside the trace
        for _ in range(3):
            p.search(query, top_k=5)
        assert p._fused is not None and p._fused.ready()
        probe = p._fused.device_time_probe(query, iters=args.iters)
        out_dir = os.path.join(args.out, variant)
        with jax.profiler.trace(out_dir):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                p.search(query, top_k=5)
            wall = time.perf_counter() - t0
        print(f"{variant}: device {probe['per_query_ms']:.2f} ms/query, "
              f"traced wall {wall / args.iters * 1e3:.2f} ms/query "
              f"-> {out_dir}", flush=True)


if __name__ == "__main__":
    main()

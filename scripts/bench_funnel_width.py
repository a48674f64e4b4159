"""Funnel-width quality/latency curve (VERDICT r2 next-3).

Measures (synthetic-LIMIT NDCG@10, fused device ms/query, batched eval
QPS) at ``stage2_top_k`` ∈ {25, 50, 100} — the number of pairs the
stage-3 cross-encoder scores, i.e. the knob users tune in the
reference's own config (/root/reference/benchmark/config.yaml:45) and
the identified stage-3 latency-tail lever (STATUS.md known-gaps-3).

Quality metric caveat (watermarked like run_benchmark.py): weights are
random-init in this zero-egress environment. The synthetic task is
lexically grounded (queries are token subsets of their relevant doc),
and random-weight encoders preserve token-identity signal (identical
tokens -> identical embeddings), so NDCG deltas across widths measure
real funnel attrition — but absolute values are NOT real-checkpoint
quality.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/bench_funnel_width.py
Run (CPU dev): ... --tiny --docs 300 --queries 12
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
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--widths", type=int, nargs="+", default=[25, 50, 100])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--int8-stage3", action="store_true",
                    help="also measure int8 cross-encoder weights at "
                         "each width")
    args = ap.parse_args()

    if args.tiny:
        # CPU dev smoke: the axon sitecustomize forces the TPU platform
        # at import, so flip it back post-import.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
    from tristage_rag_tpu.eval.harness import run_evaluation
    from tristage_rag_tpu.eval.limit import load_limit
    from tristage_rag_tpu.eval.synthetic import generate_synthetic_task

    data_dir = tempfile.mkdtemp(prefix="funnel_width_")
    generate_synthetic_task(
        data_dir, n_docs=args.docs, n_queries=args.queries, seed=0
    )
    task = load_limit(data_dir, "limit-small")

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

    rows = []
    variants = [("bf16", {})]
    if args.int8_stage3:
        variants.append(("int8_s3", {"stage3_weights_int8": True}))
    for width in args.widths:
        for vname, extra in variants:
            cfg = PipelineConfig(
                stage1_top_k=500, stage2_top_k=width, stage3_top_k=20,
                stage1_bm25_top_k=300,
                stage2_cache_doc_embeddings=True,
                enable_fused_search=True, mesh_data_parallel=1,
                **models, **extra,
            )
            p = RetrievalPipeline(cfg)
            t0 = time.time()
            out = run_evaluation(p, task, top_k=20)
            wall = time.time() - t0
            row = {
                "stage2_top_k": width,
                "variant": vname,
                "ndcg_at_10": round(out["metrics"]["ndcg_at_10"], 4),
                "recall_at_10": round(out["metrics"]["recall_at_10"], 4),
                "eval_qps": round(out["qps"], 1),
                "p50_ms": round(out["latency_p50_ms"], 2),
                "wall_s": round(wall, 1),
                "random_weights_watermark": True,
            }
            if p._fused is not None and p._fused.ready():
                probe = p._fused.device_time_probe(
                    next(iter(task.queries.values())), iters=32
                )
                row["device_ms_per_query"] = round(probe["per_query_ms"], 2)
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("# width vs quality vs device-time:")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

"""Synthetic-LIMIT NDCG@10 leg for the driver gate (VERDICT r3 next-10).

Trains the tiny three-stage stack on a fixed-seed synthetic LIMIT task
(queries are token subsets of their relevant doc — lexically grounded,
so funnel attrition is measurable without real checkpoints), runs the
full fused funnel over it, and prints ONE JSON line:

  {"synthetic_ndcg_at_10": X, "synthetic_recall_at_10": Y}

CPU-only (forces the CPU platform before any compute) so bench.py can
run it CONCURRENTLY with the device legs. Everything is seeded; the
number is comparable across rounds — a quality regression in the
funnel (ranking, fusion, masking, kernel numerics) moves it, latency
changes don't.

Protocol: 400 docs / 24 queries / seed 0, tiny models trained 40
steps (bi+colbert InfoNCE, cross BCE with BM25-mined hard negatives —
scripts/bench_funnel_width.py::_train_tiny_stack), funnel
500/25/20 fused. Reference counterpart: the MTEB NDCG@10 main score
(/root/reference/benchmark/limit_mteb_tasks.py:41).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu"

    from bench_funnel_width import _inject_trained, _train_tiny_stack

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
    from tristage_rag_tpu.eval.harness import run_evaluation
    from tristage_rag_tpu.eval.limit import load_limit
    from tristage_rag_tpu.eval.synthetic import generate_synthetic_task

    data_dir = tempfile.mkdtemp(prefix="ndcg_gate_")
    generate_synthetic_task(data_dir, n_docs=400, n_queries=24, seed=0)
    task = load_limit(data_dir, "limit-small")

    models = dict(
        stage1_model="tiny-gemma",
        stage2_model="tiny-modernbert",
        stage3_model="tiny-bert",
    )
    trained = _train_tiny_stack(task, steps=40, models=models)

    cfg = PipelineConfig(
        stage1_top_k=500, stage2_top_k=25, stage3_top_k=20,
        stage1_bm25_top_k=300,
        stage2_cache_doc_embeddings=True,
        enable_fused_search=True, mesh_data_parallel=1,
        **models,
    )
    p = RetrievalPipeline(cfg)
    _inject_trained(p, trained)
    out = run_evaluation(p, task, top_k=20)
    print(json.dumps({
        "synthetic_ndcg_at_10": round(out["metrics"]["ndcg_at_10"], 4),
        "synthetic_recall_at_10": round(out["metrics"]["recall_at_10"], 4),
    }), flush=True)


if __name__ == "__main__":
    main()

"""Distilled stage-3 student: the structural latency lever.

BENCH_NOTES measured the other two stage-3 levers: weight-only int8 is
latency-neutral (compute-bound stage) and int8 activations recover
1.2-2.9x on the projection dots. The remaining lever is STRUCTURAL —
fewer layers. The reference serves cross-encoder/ms-marco-MiniLM-L6-v2
(/root/reference/src/stage3_reranker.py:17); its published fast sibling
(L2-v2) is a 2-layer distillation of the same family.
`train/distill.py` produces such a student in-domain; this bench
measures both axes of the trade:

* **Latency axis (default, full-size archs, TPU)**: the same funnel
  with stage-3 = MiniLM-L6 vs the L2 layout. Weights are random-init
  (zero egress) — irrelevant for latency, which depends on shapes only.
* **Quality axis (--tiny --train-steps N)**: fine-tune the tiny stack
  on the synthetic task (reusing bench_funnel_width's trainer), distill
  the trained 2-layer teacher into a 1-layer student on in-funnel pairs
  (query x BM25 candidates — the distribution stage-3 actually faces),
  and report NDCG@10 teacher vs student vs undistilled student.

Run (TPU):  PYTHONPATH=/root/repo python -u scripts/bench_distill.py
Run (CPU):  ... --tiny --train-steps 300 --docs 300 --queries 12
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _distill_student(task, teacher_params, models: dict, steps: int):
    """Distill the (trained) tiny 2-layer stage-3 teacher into the
    1-layer student on in-funnel pairs. Returns the student param tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tristage_rag_tpu.engine.factory import build_runtime
    from tristage_rag_tpu.index.bm25 import BM25Index
    from tristage_rag_tpu.train.data import cross_pair_batch
    from tristage_rag_tpu.train.distill import (
        CrossEncoderDistiller,
        DistillConfig,
        init_student_from_teacher,
    )

    teacher_rt, tok = build_runtime(
        "cross", models["stage3_model"], model_dir="", seed=0,
        compute_dtype="float32",
    )
    student_rt, _ = build_runtime(
        "cross", "tiny-bert-1l", model_dir="", seed=1,
        compute_dtype="float32",
    )

    # Distillation set: every query paired with its BM25 top-10 — the
    # candidate mix (relevant + hard negatives) the reranker sees live.
    def _text(doc):
        return doc.get("text", "") if isinstance(doc, dict) else str(doc)

    doc_ids = list(task.corpus)
    bm25 = BM25Index()
    bm25.add([_text(task.corpus[d]) for d in doc_ids])
    pairs = [
        (q, _text(task.corpus[doc_ids[di]]))
        for q in task.queries.values()
        for di, _s in bm25.search(q, 10)
    ]
    rng = np.random.default_rng(0)
    bs = min(32, len(pairs))

    def batch():
        idx = rng.choice(len(pairs), size=bs, replace=False)
        cb = cross_pair_batch(
            tok, [pairs[i][0] for i in idx], [pairs[i][1] for i in idx],
            max_length=96,
        )
        return (jnp.asarray(cb.ids), jnp.asarray(cb.mask),
                jnp.asarray(cb.types), jnp.asarray(cb.labels))

    dist = CrossEncoderDistiller(
        student_rt.module,
        DistillConfig(learning_rate=1e-3, warmup_steps=max(steps // 10, 1),
                      total_steps=steps),
        teacher_module=teacher_rt.module,
    )
    b0 = batch()
    state = dist.init_state(jax.random.PRNGKey(0), b0[0], b0[1])
    warm, copied = init_student_from_teacher(
        student_rt.params, teacher_params
    )
    state["params"] = jax.device_put(jax.device_get(warm))
    tp = jax.device_get(teacher_params)
    first = last = None
    for _ in range(steps):
        state, m = dist.train_step(state, tp, *batch())
        last = float(m["loss"])
        first = last if first is None else first
    print(f"# distilled stage3 ({copied} leaves warm): "
          f"mse {first:.4f} -> {last:.4f}", flush=True)
    return jax.device_get(state["params"]), jax.device_get(student_rt.params)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--width", type=int, default=100,
                    help="stage2_top_k (pairs the reranker scores)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--train-steps", type=int, default=0,
                    help="(tiny) fine-tune the stack for N steps first so "
                         "the NDCG axis is meaningful")
    ap.add_argument("--distill-steps", type=int, default=300)
    args = ap.parse_args()
    if args.train_steps and not args.tiny:
        ap.error("--train-steps requires --tiny")

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import bench_funnel_width as bfw

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
    from tristage_rag_tpu.eval.harness import run_evaluation
    from tristage_rag_tpu.eval.limit import load_limit
    from tristage_rag_tpu.eval.synthetic import generate_synthetic_task

    data_dir = tempfile.mkdtemp(prefix="distill_bench_")
    generate_synthetic_task(
        data_dir, n_docs=args.docs, n_queries=args.queries, seed=0
    )
    task = load_limit(data_dir, "limit-small")

    if args.tiny:
        models = dict(stage1_model="tiny-gemma",
                      stage2_model="tiny-modernbert",
                      stage3_model="tiny-bert")
        student_name = "tiny-bert-1l"
    else:
        models = dict(stage1_model="embeddinggemma-300m",
                      stage2_model="gte-moderncolbert",
                      stage3_model="minilm-l6-cross")
        student_name = "minilm-l2-cross"

    trained = None
    student_params = raw_student = None
    if args.train_steps:
        trained = bfw._train_tiny_stack(task, args.train_steps, models)
        student_params, raw_student = _distill_student(
            task, trained["stage3"], models, args.distill_steps
        )

    # Variants: teacher funnel; student funnel; (tiny) undistilled
    # student as the ablation floor.
    variants = [("teacher", models["stage3_model"], "teacher")]
    variants.append(("student", student_name,
                     "distilled" if trained is not None else "random"))
    if raw_student is not None:
        variants.append(("student_raw", student_name, "raw"))

    rows = []
    for vname, s3_model, weights in variants:
        cfg = PipelineConfig(
            stage1_top_k=500, stage2_top_k=args.width, stage3_top_k=20,
            stage1_bm25_top_k=300, stage2_cache_doc_embeddings=True,
            enable_fused_search=True, mesh_data_parallel=1,
            **{**models, "stage3_model": s3_model},
        )
        p = RetrievalPipeline(cfg)
        if trained is not None:
            import jax

            p.initialize_stages()
            inject = dict(trained)
            if weights == "distilled":
                inject["stage3"] = student_params
            elif weights == "raw":
                inject["stage3"] = raw_student
            for stage in ("stage1", "stage2", "stage3"):
                rt = getattr(p, stage).runtime
                rt.load_params(jax.device_put(inject[stage]))
                rt.weights_loaded = True
        t0 = time.time()
        out = run_evaluation(p, task, top_k=20)
        wall = time.time() - t0
        row = {
            "stage3": vname,
            "model": s3_model,
            "weights": weights,
            "ndcg_at_10": round(out["metrics"]["ndcg_at_10"], 4),
            "recall_at_10": round(out["metrics"]["recall_at_10"], 4),
            "eval_qps": round(out["qps"], 1),
            "p50_ms": round(out["latency_p50_ms"], 2),
            "wall_s": round(wall, 1),
        }
        if p._fused is not None and p._fused.ready():
            probe = p._fused.device_time_probe(
                next(iter(task.queries.values())), iters=32
            )
            row["device_ms_per_query"] = round(probe["per_query_ms"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("# stage-3 distillation: teacher vs student:")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

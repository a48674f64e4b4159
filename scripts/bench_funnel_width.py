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


def _task_pairs(task) -> list[tuple[str, str]]:
    def _text(doc):
        return doc.get("text", "") if isinstance(doc, dict) else str(doc)

    return [
        (task.queries[qid], _text(task.corpus[did]))
        for qid, rels in task.qrels.items()
        for did in rels
        if qid in task.queries and did in task.corpus
    ]


def _train_tiny_stack(task, steps: int, models: dict, seed: int = 0) -> dict:
    """Fine-tune the three tiny models on the task's (query, relevant
    doc) pairs — bi/colbert InfoNCE + cross BCE — returning trained
    param trees keyed by stage. Runs on the measurement device.
    ``seed`` drives sampling, init, and warm-start (seed 0 is
    bit-identical to the historical single-seed protocol)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tristage_rag_tpu.engine.factory import build_runtime
    from tristage_rag_tpu.train.contrastive import (
        ColBERTTrainer, CrossEncoderTrainer, TrainConfig, Trainer,
    )
    from tristage_rag_tpu.train.data import cross_pair_batch

    pairs = _task_pairs(task)
    rng_np = np.random.default_rng(seed)
    bs = min(32, len(pairs))

    # BM25-mined hard negatives for the cross-encoder: the top-ranked
    # NON-relevant doc per query — the candidate distribution stage-3
    # actually faces inside the funnel (random negatives teach topic
    # matching only; the reranker then can't separate same-topic docs
    # and a wider funnel hurts instead of helping).
    from tristage_rag_tpu.index.bm25 import BM25Index

    def _text(doc):
        return doc.get("text", "") if isinstance(doc, dict) else str(doc)

    doc_ids = list(task.corpus)
    bm25 = BM25Index()
    bm25.add([_text(task.corpus[d]) for d in doc_ids])
    hard_neg: dict[str, str] = {}
    for qid, q in task.queries.items():
        rel = set(task.qrels.get(qid, ()))
        for di, _score in bm25.search(q, 10):
            if doc_ids[di] not in rel:
                hard_neg[q] = _text(task.corpus[doc_ids[di]])
                break
    fallback = _text(task.corpus[doc_ids[0]])
    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_steps=max(steps // 10, 1),
        total_steps=steps,
    )
    out = {}
    for stage, kind, cls in (
        ("stage1", "bi", Trainer),
        ("stage2", "colbert", ColBERTTrainer),
        ("stage3", "cross", CrossEncoderTrainer),
    ):
        runtime, tok = build_runtime(
            kind, models[f"{stage}_model"], model_dir="", seed=seed,
            compute_dtype="float32",
        )
        trainer = cls(runtime.module, tcfg)

        def batch():
            idx = rng_np.choice(len(pairs), size=bs, replace=False)
            qs = [pairs[i][0] for i in idx]
            ds = [pairs[i][1] for i in idx]
            if kind == "cross":
                negs = [hard_neg.get(q, fallback) for q in qs]
                cb = cross_pair_batch(tok, qs, ds, max_length=96,
                                      negatives=negs)
                return (jnp.asarray(cb.ids), jnp.asarray(cb.mask),
                        jnp.asarray(cb.types), jnp.asarray(cb.labels))
            qb = tok.encode_batch(qs, 64, buckets=(64,))
            db = tok.encode_batch(ds, 96, buckets=(96,))
            return (jnp.asarray(qb.input_ids), jnp.asarray(qb.attn_mask),
                    jnp.asarray(db.input_ids), jnp.asarray(db.attn_mask))

        b0 = batch()
        state = trainer.init_state(jax.random.PRNGKey(seed), b0[0], b0[1])
        # warm-start from the runtime's deterministic init so the
        # trained tree matches the params the pipeline will build.
        # Copy via host: the train step DONATES its state, and
        # device_put of an already-placed array is a no-op alias —
        # donation would delete runtime.params out from under us.
        state["params"] = jax.device_put(jax.device_get(runtime.params))
        first = last = None
        for _ in range(steps):
            state, m = trainer.train_step(state, *batch())
            last = float(m["loss"])
            first = last if first is None else first
        print(f"# trained {stage} ({kind}): loss {first:.3f} -> "
              f"{last:.3f}", flush=True)
        out[stage] = jax.device_get(state["params"])
    return out


def _inject_trained(pipeline, trained: dict) -> None:
    """Install trained params into a pipeline's runtimes BEFORE any
    indexing (the device caches encode with these weights)."""
    import jax

    pipeline.initialize_stages()
    for stage in ("stage1", "stage2", "stage3"):
        rt = getattr(pipeline, stage).runtime
        rt.load_params(jax.device_put(trained[stage]))
        rt.weights_loaded = True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--widths", type=int, nargs="+", default=[25, 50, 100])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--int8-stage3", action="store_true",
                    help="also measure int8 cross-encoder weights at "
                         "each width")
    ap.add_argument("--act-int8-pallas", action="store_true",
                    help="also measure the fused Pallas int8 kernel "
                         "(stage3_act_int8='pallas': quant/dot/dequant/"
                         "bias in one VMEM pass — the lever for the "
                         "in-context fusion loss BENCH_NOTES measured "
                         "on the XLA int8 lowering)")
    ap.add_argument("--act-int8-static-pallas", action="store_true",
                    help="also measure the static-scale fused Pallas "
                         "mode (stage3_act_int8='static-pallas')")
    ap.add_argument("--fused-mlp", action="store_true",
                    help="also measure the bf16 whole-block fused MLP "
                         "(stage3_fused_mlp: no quantization, the "
                         "[M, mlp_dim] intermediate stays in VMEM)")
    ap.add_argument("--flash", action="store_true",
                    help="also measure flash attention for the "
                         "cross-encoder (stage3_flash_attention: "
                         "logits/probs never materialize to HBM)")
    ap.add_argument("--flash-fused-mlp", action="store_true",
                    help="also measure flash attention + bf16 fused "
                         "MLP together (the full bf16 kernel stack)")
    ap.add_argument("--aligned", action="store_true",
                    help="(tiny mode) use the lane-aligned tiny models "
                         "(hidden 128) so the fused Pallas kernels and "
                         "flash attention actually engage on CPU — the "
                         "quality-preservation leg for the kernel stack")
    ap.add_argument("--train-steps", type=int, default=0,
                    help="(tiny mode) fine-tune all three tiny models "
                         "on the synthetic task for N steps before "
                         "measuring — gives the NDCG axis real signal "
                         "instead of the random-weight watermark")
    args = ap.parse_args()
    if args.train_steps and not args.tiny:
        ap.error("--train-steps requires --tiny (training full-size "
                 "archs from random init is not meaningful)")
    if args.aligned and not args.tiny:
        ap.error("--aligned requires --tiny (full-size archs are "
                 "already lane-aligned)")

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
        suffix = "-aligned" if args.aligned else ""
        models = dict(
            stage1_model=f"tiny-gemma{suffix}",
            stage2_model=f"tiny-modernbert{suffix}",
            stage3_model=f"tiny-bert{suffix}",
        )
    else:
        models = dict(
            stage1_model="embeddinggemma-300m",
            stage2_model="gte-moderncolbert",
            stage3_model="minilm-l6-cross",
        )

    trained = None
    if args.train_steps:
        trained = _train_tiny_stack(task, args.train_steps, models)

    rows = []
    # the default is now stage*_fused_mlp="auto" (kernel ON on TPU):
    # EVERY variant pins the knob both ways so each A/B leg isolates
    # exactly its labeled effect (otherwise e.g. the flash_attn leg
    # would silently also run the fused-MLP kernel on TPU)
    def v(name, **extra):
        base = {"stage3_fused_mlp": False, "stage3_flash_attention": False}
        base.update(extra)
        return (name, base)

    variants = [v("bf16")]
    if args.int8_stage3:
        variants.append(v("int8_s3", stage3_weights_int8=True))
    if args.act_int8_pallas:
        variants.append(v("act_int8_pallas", stage3_act_int8="pallas"))
    if args.act_int8_static_pallas:
        variants.append(
            v("act_int8_static_pallas", stage3_act_int8="static-pallas")
        )
    if args.fused_mlp:
        variants.append(v("fused_mlp_bf16", stage3_fused_mlp=True))
    if args.flash:
        variants.append(v("flash_attn", stage3_flash_attention=True))
    if args.flash_fused_mlp:
        variants.append(
            v("flash+fused_mlp", stage3_flash_attention=True,
              stage3_fused_mlp=True)
        )
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
            if trained is not None:
                _inject_trained(p, trained)
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
                "weights": (
                    f"synthetic-trained-{args.train_steps}steps"
                    if trained is not None else "random-init-watermark"
                ),
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

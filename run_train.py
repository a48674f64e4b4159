#!/usr/bin/env python
"""Contrastive fine-tuning runner for the stage-1 bi-encoder.

Trains on (query, positive) pairs with in-batch negatives over a
(dp, tp) device mesh, checkpointing via Orbax, and optionally
evaluates retrieval recall on a held-out split before/after.

Example (asset-free smoke run):
  python run_train.py --pairs pairs.jsonl --model tiny-gemma \
      --steps 200 --batch-size 32 --ckpt-dir ./ckpts
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", required=True, help="JSONL/TSV of query/positive pairs")
    ap.add_argument("--model", default="tiny-gemma", help="registry config or checkpoint name")
    ap.add_argument("--arch", choices=("bi", "colbert", "cross", "distill"),
                    default="bi",
                    help="bi = stage-1 bi-encoder InfoNCE; colbert = "
                         "stage-2 late-interaction (MaxSim) InfoNCE; "
                         "cross = stage-3 cross-encoder pointwise BCE "
                         "with shifted in-batch negatives; distill = "
                         "stage-3 logit distillation of --teacher into "
                         "--model (train/distill.py)")
    ap.add_argument("--teacher", default=None,
                    help="(distill) teacher cross-encoder registry/"
                         "checkpoint name, e.g. minilm-l6-cross")
    ap.add_argument("--hard-label-weight", type=float, default=0.0,
                    help="(distill) mix of hard-label BCE into the "
                         "logit-matching MSE (0 = pure distillation)")
    ap.add_argument("--model-dir", default="./models")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--temperature", type=float, default=0.05)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--query-max-len", type=int, default=64)
    ap.add_argument("--doc-max-len", type=int, default=256)
    ap.add_argument("--ckpt-dir", default="./train_ckpts")
    ap.add_argument("--ckpt-every", type=int, default=200)
    ap.add_argument("--export-dir", default=None,
                    help="after training, write a servable native "
                         "checkpoint (models/native_ckpt.py) here — "
                         "load it by directory basename via "
                         "PipelineConfig.stageN_model + model_dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dp", type=int, default=0, help="data-parallel size (0=auto)")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. 'cpu' for local "
                         "dev — the axon sitecustomize preselects the "
                         "TPU tunnel at interpreter start)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tristage_rag_tpu.engine.factory import build_runtime
    from tristage_rag_tpu.train.checkpoint import TrainCheckpointer
    from tristage_rag_tpu.train.contrastive import (
        ColBERTTrainer, CrossEncoderTrainer, TrainConfig, Trainer,
    )
    from tristage_rag_tpu.train.data import (
        PairDataLoader, cross_pair_batch, load_pairs,
    )

    pairs = load_pairs(args.pairs)
    print(f"loaded {len(pairs)} training pairs from {args.pairs}")

    devices = jax.devices()
    dp = args.dp or max(len(devices) // args.tp, 1)
    if args.batch_size % dp != 0:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by dp={dp} "
            f"(pass --dp explicitly or adjust the batch)"
        )
    mesh = None
    if dp * args.tp > 1:
        mesh = Mesh(
            np.asarray(devices[: dp * args.tp]).reshape(dp, args.tp), ("dp", "tp")
        )
        print(f"mesh: dp={dp} tp={args.tp}")

    build_kind = "cross" if args.arch == "distill" else args.arch
    compute_dtype = (
        "bfloat16" if devices[0].platform != "cpu" else "float32"
    )
    runtime, tokenizer = build_runtime(
        build_kind, args.model, args.model_dir, compute_dtype=compute_dtype,
        seed=args.seed,
    )
    teacher_runtime = None
    if args.arch == "distill":
        if not args.teacher:
            raise SystemExit("--arch distill requires --teacher")
        teacher_runtime, teacher_tok = build_runtime(
            "cross", args.teacher, args.model_dir,
            compute_dtype=compute_dtype, seed=args.seed,
        )
        # ONE tokenizer must feed both forwards (same family/vocab is
        # the distillation contract), and the teacher's is
        # authoritative: a registry-init student has no tokenizer
        # files, and hash-tokenizing a checkpoint teacher would make
        # its logits (the distillation targets) noise.
        if teacher_tok.vocab_size <= runtime.cfg.vocab_size:
            tokenizer = teacher_tok
        elif tokenizer.vocab_size != teacher_tok.vocab_size:
            raise SystemExit(
                f"teacher tokenizer vocab ({teacher_tok.vocab_size}) "
                f"exceeds the student embedding table "
                f"({runtime.cfg.vocab_size}); pick a same-family student"
            )
    if args.arch in ("cross", "distill"):
        # Joint pair rows (each batch = B positives + B shifted
        # negatives) through the SAME pair encoding serving uses.
        def _cross_stream():
            rng_np = np.random.default_rng(args.seed)
            while True:
                order = rng_np.permutation(len(pairs))
                bs = args.batch_size
                for s in range(0, len(order) - bs + 1, bs):
                    idx = order[s : s + bs]
                    yield cross_pair_batch(
                        tokenizer,
                        [pairs[i][0] for i in idx],
                        [pairs[i][1] for i in idx],
                        args.doc_max_len,
                    )

        loader = _cross_stream()
    else:
        loader = PairDataLoader(
            pairs, tokenizer, batch_size=args.batch_size,
            query_max_len=args.query_max_len, doc_max_len=args.doc_max_len,
            seed=args.seed,
        )
    if args.arch == "distill":
        from tristage_rag_tpu.train.distill import (
            CrossEncoderDistiller, DistillConfig,
        )

        trainer = CrossEncoderDistiller(
            runtime.module,
            DistillConfig(
                learning_rate=args.lr, temperature=args.temperature,
                warmup_steps=args.warmup, total_steps=args.steps,
                hard_label_weight=args.hard_label_weight,
            ),
            mesh=mesh,
            teacher_module=teacher_runtime.module,
        )
    else:
        trainer_cls = {
            "bi": Trainer, "colbert": ColBERTTrainer,
            "cross": CrossEncoderTrainer,
        }[args.arch]
        trainer = trainer_cls(
            runtime.module,
            TrainConfig(
                learning_rate=args.lr, temperature=args.temperature,
                warmup_steps=args.warmup, total_steps=args.steps,
            ),
            mesh=mesh,
        )
    first = next(iter(loader))
    if args.arch in ("cross", "distill"):
        state = trainer.init_state(
            jax.random.PRNGKey(args.seed),
            jnp.asarray(first.ids), jnp.asarray(first.mask),
        )
    else:
        state = trainer.init_state(
            jax.random.PRNGKey(args.seed),
            jnp.asarray(first.q_ids), jnp.asarray(first.q_mask),
        )
    teacher_host = None
    if args.arch == "distill":
        if runtime.weights_loaded:
            # the student came from a real checkpoint (e.g. a previous
            # --export-dir): keep its weights — warm-starting would
            # clobber the prior distillation with teacher copies
            print("student loaded checkpoint weights; skipping teacher "
                  "warm start")
        else:
            # DistilBERT-style warm start (layer-mapped teacher copy
            # where shapes match), then the ordinary mesh placement.
            from tristage_rag_tpu.train.distill import (
                init_student_from_teacher,
            )

            warm, copied = init_student_from_teacher(
                runtime.params, teacher_runtime.params
            )
            runtime.params = warm
            print(f"warm-started student from teacher: {copied} leaves "
                  f"copied")
        # teacher params ride each step as a replicated jit ARG
        # (device_put once by Trainer._place_repl, reused every step)
        teacher_host = jax.device_get(teacher_runtime.params)
    # warm-start from the loaded checkpoint weights if any — re-placed
    # onto the training mesh shardings (the inference runtime placed
    # them single-device/replicated).
    if runtime.params is not None:
        # Master weights stay f32: the serving runtime pre-casts its
        # embedding tables to the compute dtype (bf16 on TPU), which
        # must not leak into the optimizer state.
        def _master(x):
            x = np.asarray(x)
            # jnp.issubdtype, not np: bfloat16 (ml_dtypes) is not an
            # np.floating subtype
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(np.float32)
            return x

        if mesh is not None:
            from tristage_rag_tpu.train.contrastive import make_param_shardings

            sh = make_param_shardings(runtime.params, mesh, "tp")
            state["params"] = jax.tree.map(
                lambda x, s: jax.device_put(_master(x), s),
                runtime.params, sh,
            )
        else:
            # copy via host: the train step donates its state, and a
            # same-device device_put aliases — donation would delete
            # runtime.params
            state["params"] = jax.device_put(
                jax.tree.map(_master, jax.device_get(runtime.params))
            )

    ckpt = TrainCheckpointer(args.ckpt_dir)
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state['step'])}")

    t0 = time.time()
    # Track the step HOST-SIDE: fetching int(state["step"]) every
    # iteration forces a device sync (a full tunnel round trip on dev
    # TPUs) and blocks dispatch pipelining. train_step increments by
    # exactly 1, so the host counter stays in lockstep; only log/ckpt
    # steps touch device values.
    start_step = step = int(state["step"])
    stream = iter(loader)
    while step < args.steps:
        b = next(stream)
        if args.arch in ("cross", "distill"):
            step_args = (
                jnp.asarray(b.ids), jnp.asarray(b.mask),
                jnp.asarray(b.types), jnp.asarray(b.labels),
            )
        else:
            step_args = (
                jnp.asarray(b.q_ids), jnp.asarray(b.q_mask),
                jnp.asarray(b.d_ids), jnp.asarray(b.d_mask),
            )
        if args.arch == "distill":
            state, metrics = trainer.train_step(
                state, teacher_host, *step_args
            )
        else:
            state, metrics = trainer.train_step(state, *step_args)
        step += 1
        if step % args.log_every == 0 or step == args.steps:
            done = step - start_step  # this process's own work
            print(
                f"step {step:>6}/{args.steps}  loss={float(metrics['loss']):.4f}  "
                f"acc={float(metrics['accuracy']):.3f}  "
                f"({done / max(time.time() - t0, 1e-9):.1f} steps/s)"
            )
        if step % args.ckpt_every == 0 or step == args.steps:
            ckpt.save(step, state)
    ckpt.close()
    print(f"done: {step - start_step} steps in {time.time() - t0:.1f}s "
          f"(through step {step}/{args.steps}); checkpoints in {args.ckpt_dir}")

    if args.export_dir:
        from tristage_rag_tpu.engine.factory import checkpoint_dir
        from tristage_rag_tpu.models.native_ckpt import save_native

        out = save_native(
            args.export_dir,
            kind=build_kind,
            enc_cfg=runtime.cfg,
            head_cfg=runtime.head_cfg,
            params=state["params"],
            prompts=runtime.prompts,
            # tokenize like the base checkpoint — or the teacher's for
            # a registry-init distillation student
            tokenizer_src=checkpoint_dir(args.model_dir, args.model)
            or (checkpoint_dir(args.model_dir, args.teacher)
                if args.teacher else None),
        )
        print(f"exported servable checkpoint to {out} "
              f"(use stage model '{Path(out).name}' with "
              f"model_dir '{Path(out).parent}')")
    return 0


if __name__ == "__main__":
    sys.exit(main())

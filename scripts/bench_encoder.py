"""Encoder forward microbenchmark: where does indexing device time go?

Times the jitted stage-1 bi-encoder forward (embeddinggemma-300m
architecture) with the chained-dependency method (the axon relay acks
dispatches early; each iteration feeds the previous output back in, so
iterations cannot overlap). Sweeps (batch, seq) to separate:

  * MXU-bound dense time (scales ~batch*seq),
  * attention-logit HBM traffic (scales ~batch*seq^2),
  * per-dispatch overhead (constant per batch).

Usage: python scripts/bench_encoder.py [--shapes 32x512,256x256,...]
Prints one JSON line per shape: ms/batch, docs/s, tokens/s.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="embeddinggemma-300m")
    ap.add_argument("--kind", default="bi", choices=["bi", "colbert"])
    ap.add_argument("--shapes", default="32x512,32x256,128x256,256x256")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from tristage_rag_tpu.models.config import ColBERTConfig, PoolingConfig
    from tristage_rag_tpu.models.heads import BiEncoder, ColBERTEncoder
    from tristage_rag_tpu.models.registry import (
        COLBERT_CONFIGS,
        POOLING_CONFIGS,
        encoder_config,
    )
    from tristage_rag_tpu.utils.benchtime import chained_loop_time

    cfg = encoder_config(args.model)
    if args.kind == "colbert":
        module = ColBERTEncoder(
            cfg, COLBERT_CONFIGS.get(args.model, ColBERTConfig())
        )
    else:
        head = POOLING_CONFIGS.get(
            args.model, PoolingConfig(pooling="mean", projection_dims=())
        )
        module = BiEncoder(cfg, head)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 8), dtype=jnp.int32)
    params = module.init(rng, dummy, jnp.ones_like(dummy))["params"]

    for shape in args.shapes.split(","):
        b, l = (int(v) for v in shape.split("x"))
        ids = jax.random.randint(
            jax.random.PRNGKey(1), (b, l), 0, cfg.vocab_size, dtype=jnp.int32
        )
        mask = jnp.ones((b, l), dtype=jnp.int32)

        # Chain via the ids: perturb them with the output embedding sum
        # (stays a valid token id) so iterations serialize. Params ride
        # the second argument slot — closing over them would bake 150M
        # f32 constants into the HLO, and the tunnel's remote-compile
        # endpoint rejects such bodies with HTTP 413.
        def step(ids_f32, p):
            ids_i = ids_f32.astype(jnp.int32) % cfg.vocab_size
            emb = module.apply({"params": p}, ids_i, mask)
            upd = jnp.sum(emb.reshape(b, -1), axis=1, keepdims=True)  # [b, 1]
            return (upd, ids_f32[:, :1].astype(jnp.int32))

        per = chained_loop_time(
            step, ids.astype(jnp.float32), params, iters=args.iters
        )
        print(json.dumps({
            "shape": shape, "ms_per_batch": round(per * 1e3, 2),
            "docs_per_s": round(b / per, 1),
            "tokens_per_s": round(b * l / per, 1),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Microbench: int8xint8 MXU matmul vs bf16 on one TPU chip.

Go/no-go probe for int8-activation stage-3 (BENCH_NOTES round-3: the
weight-only int8 cross-encoder measured latency-neutral because the
stage is MXU compute-bound; the written-down real lever is int8
activations). v5e MXU peak is 394 TOPS int8 vs 197 TFLOPS bf16 — this
measures how much of that 2x XLA actually delivers at cross-encoder
shapes, including the dynamic-quantization overhead (per-row abs-max,
round, scale) that a real stage-3 int8 path must pay per layer.

Prints one JSON line per shape with ms + TOPs for:
  bf16        — baseline dot_general
  int8_static — int8 inputs pre-quantized (pure MXU ceiling)
  int8_dyn    — bf16 input, in-jit per-row quantize + int8 dot + dequant
                (what a serving layer actually runs)
  pallas_dyn / pallas_static — the same two quant modes through the
                fused Pallas kernel (ops/pallas_qdense.py): quant ->
                int8 dot -> dequant in one VMEM pass, no HBM
                materialization of codes/accumulator. The gap between
                int8_dyn and pallas_dyn is exactly the XLA fusion loss
                BENCH_NOTES round-3 measured at the funnel level.

Timing: chained fori_loop differencing (the method in
utils/benchtime.py, inlined here because the step signature is a
matmul, not a (values, indices) search) — honest under the acking
relay: every iteration's input depends on the previous output, timed
at two iteration counts to difference out RTT + dispatch overhead.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# [tokens, in, out]: cross-encoder-ish shapes. B*L for 100 pairs at
# L=256 is 25,600 tokens; MiniLM-ish hidden 384/1536, BERT-base-ish
# 768/3072.
SHAPES = [
    (25600, 384, 1536),
    (25600, 1536, 384),
    (25600, 768, 3072),
    (25600, 3072, 768),
    (4096, 768, 768),
]


def timed(make_step, a0, b0, iters: int = 50, reps: int = 3) -> float:
    @jax.jit
    def loop(a, b, it):
        def body(_, a):
            return make_step(a, b)

        return jnp.sum(jax.lax.fori_loop(0, it, body, a).astype(jnp.float32))

    def best_of(it):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(a0, b0, it))
            best = min(best, time.perf_counter() - t0)
        return best

    for attempt in (iters, iters * 2):
        float(loop(a0, b0, 2))
        float(loop(a0, b0, 2 + attempt))
        per = (best_of(2 + attempt) - best_of(2)) / attempt
        if per > 0:
            return per
    raise RuntimeError("non-positive differenced time twice; tunnel unstable")


def main() -> None:
    for (m, k, n) in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), dtype=jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), dtype=jnp.bfloat16)
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
        w8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
        w_scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0

        dn = (((1,), (0,)), ((), ()))

        def bf16_step(a, b):
            y = jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32)
            # chain: next input depends on this output (cheap rank-1 mix)
            return a + jnp.mean(y, axis=1, keepdims=True).astype(a.dtype) * jnp.asarray(1e-8, a.dtype)

        def int8_static_step(a, b):
            y = jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.int32)
            return a ^ (jnp.max(y, axis=1, keepdims=True) & 1).astype(jnp.int8)

        def int8_dyn_step(a, b):
            af = a.astype(jnp.float32)
            s = jnp.max(jnp.abs(af), axis=1, keepdims=True) / 127.0
            aq = jnp.clip(jnp.round(af / jnp.maximum(s, 1e-9)), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(aq, b, dn, preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * s * w_scale[None, :]
            return a + jnp.mean(y, axis=1, keepdims=True).astype(a.dtype) * jnp.asarray(1e-8, a.dtype)

        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        xs_cal = jnp.float32(
            float(jnp.max(jnp.abs(x.astype(jnp.float32)))) / 127.0
        )

        def pallas_dyn_step(a, b):
            y = fused_qdense(a, b, w_scale, out_dtype=jnp.float32)
            return a + jnp.mean(y, axis=1, keepdims=True).astype(a.dtype) * jnp.asarray(1e-8, a.dtype)

        def pallas_static_step(a, b):
            y = fused_qdense(a, b, w_scale, x_scale=xs_cal, out_dtype=jnp.float32)
            return a + jnp.mean(y, axis=1, keepdims=True).astype(a.dtype) * jnp.asarray(1e-8, a.dtype)

        rows = {}
        for name, fn, a0, b0 in (
            ("bf16", bf16_step, x, w),
            ("int8_static", int8_static_step, x8, w8),
            ("int8_dyn", int8_dyn_step, x, w8),
            ("pallas_dyn", pallas_dyn_step, x, w8),
            ("pallas_static", pallas_static_step, x, w8),
        ):
            per = timed(fn, a0, b0)
            tops = 2 * m * k * n / per / 1e12
            rows[name] = {"ms": round(per * 1e3, 4), "tops": round(tops, 1)}
        for key in ("int8_dyn", "int8_static", "pallas_dyn", "pallas_static"):
            rows[f"speedup_{key.replace('int8_', '')}"] = round(
                rows["bf16"]["ms"] / rows[key]["ms"], 3
            )
        print(json.dumps({"shape": [m, k, n], **rows}), flush=True)


if __name__ == "__main__":
    main()

"""Honest device timing under acking relays — ONE implementation.

The axon relay acks dispatches before device completion, so naive
``block_until_ready`` wall-clock under-reports by orders of magnitude.
The method here (used by bench.py and scripts/bench_pallas_int8.py):
jit a ``fori_loop`` whose every iteration feeds its output back into
the next input (the device cannot overlap iterations), time it at two
iteration counts, and difference out the constant RTT + dispatch
overhead.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def chained_loop_time(step_fn, q, docs, iters: int, reps: int = 3) -> float:
    """Seconds per iteration of ``step_fn(q, docs) -> (values, indices)``.

    Retries once with doubled iterations if differencing goes
    non-positive (a tunnel stall during the short run); raises rather
    than returning a nonsensical negative/zero time.
    """

    @jax.jit
    def loop(q, docs, it):
        def body(_, q):
            v, i = step_fn(q, docs)
            upd = jnp.sum(v, axis=1) + jnp.sum(i, axis=1).astype(jnp.float32)
            return q + upd[:, None].astype(q.dtype) * jnp.asarray(
                1e-8, dtype=q.dtype
            )

        q = jax.lax.fori_loop(0, it, body, q)
        return jnp.sum(q)

    def best_of(it):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(q, docs, it))
            best = min(best, time.perf_counter() - t0)
        return best

    for attempt_iters in (iters, iters * 2):
        # warm both shapes of the dynamic loop bound
        float(loop(q, docs, 2))
        float(loop(q, docs, 2 + attempt_iters))
        per = (best_of(2 + attempt_iters) - best_of(2)) / attempt_iters
        if per > 0:
            return per
    raise RuntimeError(
        "chained-loop differencing produced a non-positive time twice — "
        "the device/tunnel is too unstable to measure"
    )

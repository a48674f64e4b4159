#!/usr/bin/env bash
# One-shot runner for the round-3 TPU measurement backlog
# (BENCH_NOTES.md "Pallas kernel stack — MEASUREMENT BACKLOG").
# Probes the tunnel first; runs cheapest-signal-first; logs everything
# under $OUT (default /tmp/tpu_backlog). Safe to re-run — each step
# overwrites its own log. ONE TPU process at a time by construction.
set -u
OUT="${OUT:-/tmp/tpu_backlog}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

echo "== tunnel probe =="
if ! timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()), jax.devices())"; then
  echo "tunnel down — aborting" >&2
  exit 1
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "== $name (timeout ${t}s) =="
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "   exit=$? -> $OUT/$name.log"
  tail -n 8 "$OUT/$name.log" | sed 's/^/   /'
}

# 1. per-dot microbench: is the fused kernel faster than the XLA int8
#    lowering at all? If pallas_dyn does not beat bf16 here, profile
#    before running funnel-level legs.
run int8_mxu 1800 python -u scripts/bench_int8_mxu.py

# 2. stage-3 funnel level: flash / fused-MLP / int8-pallas variants.
run funnel_width 5400 python -u scripts/bench_funnel_width.py \
    --widths 50 100 --flash --fused-mlp --flash-fused-mlp \
    --act-int8-pallas --act-int8-static-pallas

# 3. indexing encoders: static-pallas vs the recorded static-XLA +35%,
#    plus the bf16 legs (flash, fused-MLP) and the pending dynamic leg.
run indexing_static_pallas 3600 python -u scripts/bench_indexing.py --act-int8 static-pallas
run indexing_dynamic      3600 python -u scripts/bench_indexing.py --act-int8 dynamic
run indexing_bf16_control 3600 python -u scripts/bench_indexing.py
run indexing_fused_mlp    3600 python -u scripts/bench_indexing.py --fused-mlp
run indexing_flash        3600 python -u scripts/bench_indexing.py --flash

# 4. stage-1 int8 fused topk at N=1M (adds ~5 min Mosaic compiles).
run bench_pallas 5400 env BENCH_PALLAS=1 python -u bench.py

# 5. staged-path MaxSim kernel row.
run tristage_maxsim 5400 python -u scripts/bench_tristage.py \
    --docs 2048 --reps 30 --staged-also --maxsim pallas

# 6. restart cost: persisted-cache restore vs corpus re-encode.
run restart 3600 python -u scripts/bench_restart.py --docs 2048

# 7. op-level attribution traces (only worth reading if something above
#    surprises).
run profile_funnel 3600 python -u scripts/profile_funnel.py \
    --variants bf16 static pallas --out "$OUT/traces"

echo "== backlog complete; logs in $OUT =="

#!/usr/bin/env bash
# Round-4 TPU measurement backlog (runs when the tunnel returns):
#  1. bench.py driver gate, twice: a warming pass (populates the
#     persistent compile cache the gate's funnel leg points at ./
#     xla_cache) then a driver-budget-bounded pass that must emit the
#     full merged JSON line with rc=0 (VERDICT r3 next-1 validation).
#  2. Served-p50 decomposition (RTT / device / host) + pipelined
#     serving A/B/A at 8 clients (VERDICT next-6; re-queued backlog5).
#  3. Result cache under Zipf 1.5 with the pipelined server — earn it
#     or record the decisive negative (VERDICT next-9).
#  4. Compile-cache cold/warm A/B (re-queued backlog7 leg).
set -u
OUT="${OUT:-/tmp/tpu_backlog8}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

echo "== tunnel probe =="
if ! timeout 600 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()), jax.devices())"; then
  echo "tunnel down — aborting" >&2
  exit 1
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "== $name (timeout ${t}s) =="
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "   exit=$? -> $OUT/$name.log"
  tail -n 6 "$OUT/$name.log" | sed 's/^/   /'
}

# --- 1. driver gate: warm, then validate at driver budget ----------
# Warming must bypass bench.py's internal leg caps: on a COLD compile
# cache the full-size Mosaic compiles take minutes each and the gate's
# 300 s funnel cap would kill them before they land in ./xla_cache —
# run the funnel gate directly (it owns the chip, no internal cap),
# then validate the whole gate at driver budget against the warm cache.
run funnel_warm 5400 python -u scripts/bench_funnel_gate.py
run gate_budget 1200 env BENCH_BUDGET_S=1100 python -u bench.py

# --- 2. p50 decomposition + pipelined serving A/B/A ----------------
run p50_decomp 3600 python -u scripts/bench_p50_decomp.py
MCP="python -u scripts/bench_mcp.py --config configs/scale.yaml --docs 256 --clients 8 --queries 400"
run mcp_baseline_a 3600 $MCP
run mcp_pipelined  3600 $MCP --pipelined
run mcp_baseline_b 3600 $MCP
run mcp_seq_base      1800 $MCP --clients 1 --queries 120
run mcp_seq_pipelined 1800 $MCP --clients 1 --queries 120 --pipelined

# --- 3. result cache at Zipf 1.5, pipelined ------------------------
ZIPF="python -u scripts/bench_mcp.py --config configs/scale.yaml --docs 256 --clients 8 --queries 800 --zipf 1.5 --query-pool 64 --pipelined"
run zipf15_nocache 3600 $ZIPF
run zipf15_cache   3600 $ZIPF --result-cache

# --- 4. compile-cache cold/warm ------------------------------------
CACHE_DIR="$OUT/xla-cache"
rm -rf "$CACHE_DIR"
COMPILE_PROBE='
import os, sys, time
import jax, jax.numpy as jnp
from tristage_rag_tpu.utils.compilecache import enable_compilation_cache
enable_compilation_cache(os.environ["CC_DIR"])
from tristage_rag_tpu.ops.pallas_qdense import fused_mlp_bf16
import numpy as np
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((256, 384)), jnp.bfloat16)
wi = jnp.asarray(rng.standard_normal((384, 1536)) * 0.05, jnp.bfloat16)
wo = jnp.asarray(rng.standard_normal((1536, 384)) * 0.05, jnp.bfloat16)
f = jax.jit(lambda x: fused_mlp_bf16(x, wi, None, wo, glu=False))
t0 = time.time()
f(x).block_until_ready()
print(f"first-call (compile+run): {time.time()-t0:.1f}s")
'
run cc_cold 3600 env CC_DIR="$CACHE_DIR" python -u -c "$COMPILE_PROBE"
run cc_warm 3600 env CC_DIR="$CACHE_DIR" python -u -c "$COMPILE_PROBE"
echo "   cache entries: $(ls "$CACHE_DIR" 2>/dev/null | wc -l)"

echo "== backlog8 complete; logs in $OUT =="

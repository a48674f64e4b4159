#!/usr/bin/env bash
# Session-5 TPU backlog: legs still pending after run_tpu_backlog.sh
# (indexing legs re-queued with the fixed --docs default; restart;
# staged maxsim; MCP Zipf result-cache; the new clustered sweep with
# both probe kernels). One TPU process at a time; logs under $OUT.
set -u
OUT="${OUT:-/tmp/tpu_backlog2}"
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
  tail -n 6 "$OUT/$name.log" | sed 's/^/   /'
}

# 1. clustered stage-1 sweep, both probe kernels (new this session).
run clustered_xla    5400 python -u scripts/bench_clustered.py --kernel xla
run clustered_pallas 5400 python -u scripts/bench_clustered.py --kernel pallas

# 2. indexing legs (re-queued: the earlier run used an off-bucket doc
#    count and measured a remote compile inside the clock).
run indexing_bf16_control  3600 python -u scripts/bench_indexing.py
run indexing_static        3600 python -u scripts/bench_indexing.py --act-int8 static
run indexing_static_pallas 3600 python -u scripts/bench_indexing.py --act-int8 static-pallas
run indexing_dynamic       3600 python -u scripts/bench_indexing.py --act-int8 dynamic
run indexing_fused_mlp     3600 python -u scripts/bench_indexing.py --fused-mlp
run indexing_flash         3600 python -u scripts/bench_indexing.py --flash

# 3. restart cost with persisted device caches.
run restart 3600 python -u scripts/bench_restart.py --docs 2048

# 4. staged-path MaxSim kernel row.
run tristage_maxsim 5400 python -u scripts/bench_tristage.py \
    --docs 2048 --reps 30 --staged-also --maxsim pallas

# 5. MCP serving under a skewed mix: result-cache hit rate + latency.
run mcp_zipf_nocache 3600 python -u scripts/bench_mcp.py --zipf 1.2
run mcp_zipf_cache   3600 python -u scripts/bench_mcp.py --zipf 1.2 --result-cache

echo "== backlog2 complete; logs in $OUT =="

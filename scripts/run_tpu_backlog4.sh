#!/usr/bin/env bash
# Session-6 TPU backlog, part 2: re-measure the serving/indexing hot
# paths after the embedding-table pre-cast (the bf16 funnel trace
# showed a 1.9 ms/dispatch full-table convert_element_type — 28% —
# from flax nn.Embed promoting f32-stored tables every dispatch), and
# a longer MCP Zipf A/B (the 120-query run was too short to judge the
# result cache). One TPU process at a time; logs under $OUT.
set -u
OUT="${OUT:-/tmp/tpu_backlog4}"
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

# 1. fused funnel latency, post-precast (headline p50 + device ms).
run tristage_postcast 5400 python -u scripts/bench_tristage.py \
    --docs 2048 --reps 30 --staged-also

# 2. funnel-width rows, post-precast: bf16 control + best kernel cfg.
run funnel_postcast 7200 python -u scripts/bench_funnel_width.py \
    --widths 50 100

# 3. re-trace for op attribution, post-precast.
run profile_postcast 3600 python -u scripts/profile_funnel.py \
    --docs 2000 --variants bf16 --out "$OUT/traces"

# 4. indexing, post-precast (control + the recommended fused_mlp).
run indexing_postcast           3600 python -u scripts/bench_indexing.py
run indexing_postcast_fused_mlp 3600 python -u scripts/bench_indexing.py --fused-mlp

# 5. MCP Zipf A/B, long enough to mean something.
run mcp_zipf_nocache_long 3600 python -u scripts/bench_mcp.py --zipf 1.2 --queries 800
run mcp_zipf_cache_long   3600 python -u scripts/bench_mcp.py --zipf 1.2 --queries 800 --result-cache

echo "== backlog4 complete; logs in $OUT =="

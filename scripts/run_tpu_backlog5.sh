#!/usr/bin/env bash
# Round-3 session-10/11 TPU measurement backlog: pipelined serving A/B.
# The two-phase dispatch/fetch split (serve_pipelined) overlaps the
# next micro-batch's dispatch with the current batch's device time +
# device->host round-trip (~30 ms over the relay tunnel) — the win
# should show as serving QPS / p50 under concurrent MCP load.
# Probes the tunnel first; logs under $OUT (default /tmp/tpu_backlog5).
set -u
OUT="${OUT:-/tmp/tpu_backlog5}"
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
  tail -n 4 "$OUT/$name.log" | sed 's/^/   /'
}

# Serving A/B at the shipped perf profile, 8 concurrent clients with
# live adds (the BENCH_NOTES serving scenario). A/B/A to bound
# tunnel-noise: baseline, pipelined, baseline again.
MCP="python -u scripts/bench_mcp.py --config configs/scale.yaml --docs 256 --clients 8 --queries 400"
run mcp_baseline_a 3600 $MCP
run mcp_pipelined  3600 $MCP --pipelined
run mcp_baseline_b 3600 $MCP

# Single-client sequential (no coalescing): pipelining should be
# neutral here — the check that it costs nothing when there is no
# next batch to overlap.
run mcp_seq_base      1800 $MCP --clients 1 --queries 120
run mcp_seq_pipelined 1800 $MCP --clients 1 --queries 120 --pipelined

# Skewed mix with the result cache: epoch-guarded seeding under load.
run mcp_zipf_pipelined 3600 $MCP --pipelined --result-cache --zipf 1.2

echo "== backlog5 complete; logs in $OUT =="

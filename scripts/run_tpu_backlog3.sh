#!/usr/bin/env bash
# Session-6 TPU backlog: the clustered Pallas leg re-run after the
# blockskip small-batch fix (batch 1 now pads to the kernel tile
# instead of raising), plus a second bench.py pass for the round
# gate sanity. One TPU process at a time; logs under $OUT.
set -u
OUT="${OUT:-/tmp/tpu_backlog3}"
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

run clustered_pallas 7200 python -u scripts/bench_clustered.py --kernel pallas
run bench_gate 3600 python -u bench.py

echo "== backlog3 complete; logs in $OUT =="

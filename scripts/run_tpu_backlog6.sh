#!/usr/bin/env bash
# Round-3 session-12 TPU measurement backlog:
#  - stage-2 gather-width bucket (_d2_budget) A/B at the standard
#    2k-doc width-100 shape (expect: most of the ~260 us/query
#    "stage-2 gather/norm/MaxSim" group at 192->32 widths);
#  - fused funnel at 100k docs: scan vs clustered stage-1 probe
#    (expect: the 6.29 ms/q 100k row drops toward the 2k-doc funnel
#    time as the probe reads ~n_probe*1024 rows instead of 100k).
set -u
OUT="${OUT:-/tmp/tpu_backlog6}"
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
  tail -n 10 "$OUT/$name.log" | sed 's/^/   /'
}

run funnel_scale_2k 3600 python -u scripts/bench_funnel_scale.py \
  --docs 2000 --block-size 256 --probes 4 8 --queries 8

run funnel_scale_100k 7200 python -u scripts/bench_funnel_scale.py \
  --docs 100000 --probes 16 32 64 --queries 8

echo "== backlog6 complete; logs in $OUT =="

#!/usr/bin/env bash
# Tunnel watcher: wait for the TPU relay to hold up for two consecutive
# probes (90 s apart), then run the queued measurement backlogs in
# sequence (backlog6: d2-budget + clustered funnel-scale; backlog5:
# pipelined serving A/B/A). Logs to /tmp/tpu_watcher.log.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=/tmp/tpu_watcher.log
probe() {
  timeout 600 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1
}
# Wait out any in-flight full-suite pytest run first: it saturates
# every core, which inflates probe/compile times past their timeouts
# and would skew host-sensitive serving measurements.
BUSY_LOG="${BUSY_LOG:-/tmp/pytest_r3s13.log}"
while [ -f "$BUSY_LOG" ] && ! grep -q "^pytest rc=" "$BUSY_LOG"; do
  echo "$(date +%T) waiting for pytest suite to finish" >> "$LOG"
  sleep 300
done
ok=0
while [ "$ok" -lt 2 ]; do
  if probe; then
    ok=$((ok + 1))
    echo "$(date +%T) probe ok ($ok/2)" >> "$LOG"
    [ "$ok" -lt 2 ] && sleep 90
  else
    ok=0
    echo "$(date +%T) probe failed; retry in 10 min" >> "$LOG"
    sleep 600
  fi
done
echo "$(date +%T) tunnel stable — running backlog6" >> "$LOG"
bash scripts/run_tpu_backlog6.sh >> "$LOG" 2>&1
echo "$(date +%T) backlog6 rc=$? — running backlog5" >> "$LOG"
bash scripts/run_tpu_backlog5.sh >> "$LOG" 2>&1
echo "$(date +%T) backlog5 rc=$? — running backlog7" >> "$LOG"
bash scripts/run_tpu_backlog7.sh >> "$LOG" 2>&1
echo "$(date +%T) backlog7 rc=$? — watcher done" >> "$LOG"

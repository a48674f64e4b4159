#!/usr/bin/env bash
# Round-3 session-13 TPU backlog:
#  - persistent-compilation-cache A/B over the tunnel: the same
#    Pallas-kernel program compiled in two fresh processes, cold
#    (populating compilation_cache_dir) then warm — does the cache
#    short-circuit the remote Mosaic compile?
#  - full driver-gate validation: bench.py end-to-end, including the
#    new subprocess funnel leg, so the round-end driver run is known
#    to work.
set -u
OUT="${OUT:-/tmp/tpu_backlog7}"
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

run bench_gate 5400 python -u bench.py

echo "== backlog7 complete; logs in $OUT =="

"""Minimal end-to-end funnel leg for the driver gate (bench.py).

Builds the shipped default pipeline at the BASELINE.md protocol shape
(full-size architectures, random weights — latency is
weight-independent; 2k docs; funnel 500/100/20), then reports:

  * ``funnel_ms_per_query`` — best of N chained ``device_time_probe``
    readings (the probe includes relay throttling gaps; round-4 data
    showed a ±45% noise band for the SAME program across gate runs, so
    a single reading cannot detect a regression — VERDICT r4 weak-1);
  * ``funnel_ms_spread`` — (max-min)/best over the N probes, so a
    cross-round reader can see how much of any delta is noise;
  * ``funnel_trace_ms`` — per-program device time from a jax.profiler
    trace of the same dispatch loop (sums the synchronous "XLA Ops"
    line; reproduces to ~1 us run-to-run — the canonical cross-round
    number);
  * ``indexed_docs_s`` — WARM indexing throughput: capacities reserved
    and every (batch-bucket, length-bucket) write/encode shape compiled
    by a throwaway batch BEFORE the clock (round-4's cold number read
    6-40x under the BENCH_NOTES warm figure and varied 5x run-to-run —
    VERDICT r4 weak-2), plus ``indexing_warmup_s`` for the excluded
    compile/warm phase.

Prints ONE JSON line. Run as a subprocess by bench.py so a hang/crash
here can never break the stage-1 headline.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_tristage import make_docs  # noqa: E402  (same dir)

N_PROBES = int(os.environ.get("BENCH_FUNNEL_PROBES", 5))
PROBE_ITERS = int(os.environ.get("BENCH_FUNNEL_ITERS", 32))


def _dependent_fetch(*arrays) -> None:
    """Block until the device really finished (the relay acks
    dispatches before completion, so wall-clock around an un-fetched
    add_documents under-measures). Flattens nested state tuples
    (e.g. TieredTokenCache.state())."""
    import numpy as np

    for a in arrays:
        if isinstance(a, (tuple, list)):
            _dependent_fetch(*a)
        elif a is not None and hasattr(a, "dtype"):
            np.asarray(a[..., :1])


def main() -> None:
    n_docs = int(os.environ.get("BENCH_FUNNEL_DOCS", 2000))
    if os.environ.get("BENCH_FORCE_CPU"):  # local smoke validation
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yaml_cfg = os.environ.get("BENCH_FUNNEL_CONFIG")
    if yaml_cfg:
        # measure a YAML profile (e.g. configs/scale.yaml — the
        # capacity stack) instead of the shipped defaults
        cfg = PipelineConfig.from_yaml(yaml_cfg)
        cfg.enable_fused_search = True
        cfg.stage2_cache_doc_embeddings = True
        cfg.mesh_data_parallel = 1
    elif os.environ.get("BENCH_FUNNEL_TINY"):  # CPU smoke only
        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert",
            stage1_top_k=64, stage2_top_k=16, stage3_top_k=8,
            stage1_bm25_top_k=32,
            enable_fused_search=True, stage2_cache_doc_embeddings=True,
            mesh_data_parallel=1,
        )
    else:
        cfg = PipelineConfig(
            stage1_model="embeddinggemma-300m",
            stage2_model="gte-moderncolbert",
            stage3_model="minilm-l6-cross",
            stage1_top_k=500, stage2_top_k=100, stage3_top_k=20,
            stage1_bm25_top_k=300,
            enable_fused_search=True, stage2_cache_doc_embeddings=True,
            mesh_data_parallel=1,
            # persistent compile cache: the full-size Mosaic compiles
            # run REMOTELY (~minutes each) on tunneled dev TPUs — warm
            # runs reload executables so this leg fits bench.py's
            # 300 s budget
            compilation_cache_dir=os.path.join(repo, "xla_cache"),
        )
    p = RetrievalPipeline(cfg)
    p.initialize_stages()

    # ---- indexing: reserve + bucket-warm OUTSIDE the clock, measure
    # the steady-state fill (mirrors scripts/bench_indexing.py, whose
    # warm figures — 330-420 docs/s — are the numbers this field must
    # agree with; VERDICT r4 weak-2)
    warm_n = max(cfg.stage1_batch_size, cfg.stage2_batch_size, 8)
    t0 = time.time()
    p.add_documents(make_docs(8, seed=8))  # creates the lazy index
    final_ids = 8 + warm_n + n_docs + 72
    if p.stage2 is not None and p.stage2._cache is not None:
        p.stage2._cache.reserve(final_ids)
    if p._fused is not None:
        p._fused.doc_tokens.reserve(final_ids)
    p.stage1.index._grow(final_ids)
    p.add_documents(make_docs(warm_n, seed=9))  # warms every write op
    _dependent_fetch(
        p.stage1.index._buf,
        *(p.stage2._cache.state() if p.stage2._cache else (None,)),
    )
    warmup_s = time.time() - t0

    docs = make_docs(n_docs)
    t0 = time.time()
    p.add_documents(docs)
    _dependent_fetch(
        p.stage1.index._buf,
        *(p.stage2._cache.state() if p.stage2._cache else (None,)),
    )
    dt = time.time() - t0

    q = "semantic retrieval ranking kernel"
    out = p.search(q)  # warm + assert the fused path serves
    assert out["timing"].get("fused") is True, out["timing"]

    # ---- N chained probes: best + dispersion. Print the JSON line
    # incrementally (first probe -> full probe set -> +trace): the
    # parent salvages the LAST line on a leg timeout, so a slow relay
    # window degrades the extras instead of losing the leg.
    readings = []
    result = {
        "indexed_docs_s": round(n_docs / dt, 1),
        "indexing_warmup_s": round(warmup_s, 1),
    }
    if yaml_cfg:
        result["config"] = yaml_cfg
    # first partial: the indexing fields land even if the probe phase
    # never finishes on a degraded window
    print(json.dumps(result), flush=True)
    for i in range(N_PROBES):
        readings.append(
            p._fused.device_time_probe(q, iters=PROBE_ITERS)["per_query_ms"]
        )
        best = min(readings)
        result["funnel_ms_per_query"] = round(best, 3)
        result["funnel_ms_spread"] = round((max(readings) - best) / best, 3)
        result["funnel_probe_ms_all"] = [round(r, 3) for r in readings]
        print(json.dumps(result), flush=True)

    # ---- trace-derived per-program device time (ground truth)
    try:
        from trace_ops import device_total_us

        tdir = tempfile.mkdtemp(prefix="funnel_gate_trace_")
        p._fused.device_time_probe(q, iters=16, trace_dir=tdir)
        us = device_total_us(tdir, per_iter=16)
        if us is not None:
            result["funnel_trace_ms"] = round(us / 1000.0, 3)
    except Exception as e:  # proto libs absent, trace failure, ...
        print(f"# trace-derived time unavailable: {e}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()

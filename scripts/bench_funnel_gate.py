"""Minimal end-to-end funnel leg for the driver gate (bench.py).

Builds the shipped default pipeline at the BASELINE.md protocol shape
(full-size architectures, random weights — latency is
weight-independent; 2k docs; funnel 500/100/20), then reports the
fused single-dispatch program's pure device time per query via
``device_time_probe`` (dispatch-chained, blocks on the last result
only — honest under the acking relay, BENCH_NOTES.md method note).

Prints ONE JSON line: {"funnel_ms_per_query": X, "indexed_docs_s": Y}.
Run as a subprocess by bench.py so a hang/crash here can never break
the stage-1 headline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_tristage import make_docs  # noqa: E402  (same dir)


def main() -> None:
    n_docs = int(os.environ.get("BENCH_FUNNEL_DOCS", 2000))
    if os.environ.get("BENCH_FORCE_CPU"):  # local smoke validation
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    yaml_cfg = os.environ.get("BENCH_FUNNEL_CONFIG")
    if yaml_cfg:
        # measure a YAML profile (e.g. configs/perf.yaml — the tuned
        # serving stack) instead of the shipped defaults; bench.py
        # runs this as a second leg so the driver JSON carries BOTH
        # the default-config and best-stack funnel numbers
        cfg = PipelineConfig.from_yaml(yaml_cfg)
        cfg.enable_fused_search = True
        cfg.stage2_cache_doc_embeddings = True
        cfg.mesh_data_parallel = 1
        p = RetrievalPipeline(cfg)
        docs = make_docs(n_docs)
        t0 = time.time()
        p.add_documents(docs)
        dt = time.time() - t0
        q = "semantic retrieval ranking kernel"
        out = p.search(q)
        assert out["timing"].get("fused") is True, out["timing"]
        probe = p._fused.device_time_probe(q, iters=32)
        print(json.dumps({
            "funnel_ms_per_query": round(probe["per_query_ms"], 3),
            "indexed_docs_s": round(n_docs / dt, 1),
            "config": yaml_cfg,
        }))
        return

    if os.environ.get("BENCH_FUNNEL_TINY"):  # CPU smoke only
        models = dict(stage1_model="tiny-gemma",
                      stage2_model="tiny-modernbert",
                      stage3_model="tiny-bert",
                      stage1_top_k=64, stage2_top_k=16, stage3_top_k=8,
                      stage1_bm25_top_k=32)
    else:
        models = dict(stage1_model="embeddinggemma-300m",
                      stage2_model="gte-moderncolbert",
                      stage3_model="minilm-l6-cross",
                      stage1_top_k=500, stage2_top_k=100, stage3_top_k=20,
                      stage1_bm25_top_k=300)
    cfg = PipelineConfig(
        enable_fused_search=True,
        stage2_cache_doc_embeddings=True,
        mesh_data_parallel=1,
        # persistent compile cache: the full-size Mosaic compiles run
        # REMOTELY (~minutes each) on tunneled dev TPUs — warm runs
        # reload executables so this leg fits bench.py's 300 s budget
        compilation_cache_dir=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "xla_cache",
        ),
        **models,
    )
    p = RetrievalPipeline(cfg)
    docs = make_docs(n_docs)
    t0 = time.time()
    p.add_documents(docs)
    dt = time.time() - t0
    q = "semantic retrieval ranking kernel"
    out = p.search(q)  # warm + assert the fused path serves
    assert out["timing"].get("fused") is True, out["timing"]
    probe = p._fused.device_time_probe(q, iters=32)
    print(json.dumps({
        "funnel_ms_per_query": round(probe["per_query_ms"], 3),
        "indexed_docs_s": round(n_docs / dt, 1),
    }))


if __name__ == "__main__":
    main()

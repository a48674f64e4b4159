"""Kernel stack through the REAL funnel at lane-aligned shapes.

The fused Pallas kernels and flash attention only engage when hidden/
attn-N/mlp dims are multiples of 128 and (for flash) the sequence
bucket is lane-aligned — the standard tiny test models (hidden 64) fall
back everywhere, so these tests use the ``tiny-*-aligned`` registry
entries plus docs long enough to land in the 128-token bucket. They
pin two properties end-to-end:

1. the kernels actually ENGAGE (counted via monkeypatch), and
2. rankings through the full tri-stage pipeline are stable vs the
   baseline paths (identical for static-pallas vs static-XLA, which is
   the same math; tolerance-close for flash/fused-MLP vs bf16).
"""

from __future__ import annotations

import numpy as np
import pytest

WORDS = ("kernel", "fusion", "retrieval", "index", "latency", "memory",
         "bandwidth", "shard", "topic", "funnel", "token", "cache")


def _docs(n=14, words=90):
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        body = " ".join(rng.choice(WORDS, size=words).tolist())
        out.append(f"doc {i} about topic {i % 4}: {body}")
    return out


QUERIES = ["retrieval kernel latency topic 2 " + "funnel " * 60,
           "memory bandwidth shard topic 1 " + "cache " * 60]


def _base_cfg(**extra):
    from tristage_rag_tpu.engine.config import PipelineConfig

    kw = dict(
        stage1_model="tiny-gemma-aligned",
        stage2_model="tiny-modernbert-aligned",
        stage3_model="tiny-bert-aligned",
        stage1_top_k=8, stage2_top_k=6, stage3_top_k=3,
        stage1_max_text_length=128, stage2_max_seq_length=128,
        stage3_max_length=128, mesh_data_parallel=1,
        compute_dtype="float32",
    )
    kw.update(extra)
    return PipelineConfig(**kw)


def _run(**extra):
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    p = RetrievalPipeline(_base_cfg(**extra))
    p.add_documents(_docs())
    out = []
    for q in QUERIES:
        r = p.search(q, top_k=3)["results"]
        out.append(([x["doc_id"] for x in r],
                    [x["stage3_score"] for x in r]))
    return out


class TestKernelEngagement:
    def test_flash_engages_on_aligned_pipeline(self, monkeypatch):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        calls = {"n": 0}
        orig = fa.mha_reference

        def counted(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(fa, "mha_reference", counted)
        _run(stage1_flash_attention=True, stage2_flash_attention=True,
             stage3_flash_attention=True)
        assert calls["n"] > 0

    def test_fused_mlp_engages_on_aligned_pipeline(self, monkeypatch):
        import tristage_rag_tpu.ops.pallas_qdense as pq

        calls = {"n": 0}
        orig = pq.fused_mlp_bf16

        def counted(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(pq, "fused_mlp_bf16", counted)
        _run(stage1_fused_mlp=True, stage2_fused_mlp=True,
             stage3_fused_mlp=True)
        assert calls["n"] > 0

    def test_fused_qmlp_engages_under_pallas_int8(self, monkeypatch):
        import tristage_rag_tpu.ops.pallas_qdense as pq

        calls = {"mlp": 0, "dense": 0}
        orig_mlp, orig_dense = pq.fused_qmlp, pq.fused_qdense

        def counted_mlp(*a, **kw):
            calls["mlp"] += 1
            return orig_mlp(*a, **kw)

        def counted_dense(*a, **kw):
            calls["dense"] += 1
            return orig_dense(*a, **kw)

        monkeypatch.setattr(pq, "fused_qmlp", counted_mlp)
        monkeypatch.setattr(pq, "fused_qdense", counted_dense)
        _run(stage3_act_int8="pallas")
        assert calls["mlp"] > 0      # fused MLP block
        assert calls["dense"] > 0    # fused QKV / o_proj


class TestFusedFunnelComposition:
    """The kernels must compose INSIDE the fused single-dispatch
    program (engine/fused.py builds one XLA program around the same
    modules), not just on the staged path."""

    def test_kernels_engage_inside_fused_program(self, monkeypatch):
        import tristage_rag_tpu.ops.pallas_qdense as pq
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        calls = {"mlp": 0}
        orig = pq.fused_qmlp

        def counted(*a, **kw):
            calls["mlp"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(pq, "fused_qmlp", counted)
        p = RetrievalPipeline(_base_cfg(
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
            stage3_act_int8="pallas",
        ))
        p.add_documents(_docs())
        out = p.search(QUERIES[0], top_k=3)
        assert out["timing"].get("fused") is True
        assert len(out["results"]) == 3
        assert calls["mlp"] > 0  # fused MLP traced inside the program

    def test_fused_rankings_stable_with_flash_and_fused_mlp(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        def run(**extra):
            p = RetrievalPipeline(_base_cfg(
                stage2_cache_doc_embeddings=True,
                enable_fused_search=True, **extra,
            ))
            p.add_documents(_docs())
            out = p.search(QUERIES[0], top_k=3)
            assert out["timing"].get("fused") is True
            return [r["doc_id"] for r in out["results"]]

        base = run()
        stacked = run(
            stage1_flash_attention=True, stage2_flash_attention=True,
            stage3_flash_attention=True, stage1_fused_mlp=True,
            stage2_fused_mlp=True, stage3_fused_mlp=True,
        )
        assert base[0] == stacked[0]
        assert set(base) == set(stacked)


class TestShardedComposition:
    """Kernel stack over the 8-virtual-device mesh: the shard-mapped
    fused funnel wraps the same modules, so the Pallas kernels must
    compose with shard_map end-to-end (per-shard shapes, replicated
    params) and rank identically to the staged mesh path."""

    def test_sharded_fused_parity_with_kernel_stack(self):
        import jax

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-virtual-device CPU mesh")
        stack = dict(
            stage3_act_int8="pallas", stage1_fused_mlp=True,
            stage2_fused_mlp=True,
        )
        # SHORT docs: stage-3 truncation must not fire — fused vs
        # staged differ there by the documented static-cap divergence
        # (PARITY.md), which would mask what this test pins. The int8
        # and fused-MLP kernels engage regardless of seq bucket.
        docs = [f"doc {i} about topic {i % 4} quick brown fox"
                for i in range(14)]

        def run(fused):
            p = RetrievalPipeline(_base_cfg(
                mesh_data_parallel=0, enable_fused_search=fused,
                stage2_cache_doc_embeddings=fused, **stack,
            ))
            p.add_documents(list(docs))
            out = p.search("quick brown fox topic 2", top_k=3)
            if fused:
                assert out["timing"].get("fused") is True
            return [r["doc_id"] for r in out["results"]]

        assert run(True) == run(False)


class TestRankingStability:
    def test_flash_fused_mlp_close_to_bf16(self):
        base = _run()
        stacked = _run(
            stage1_flash_attention=True, stage2_flash_attention=True,
            stage3_flash_attention=True, stage1_fused_mlp=True,
            stage2_fused_mlp=True, stage3_fused_mlp=True,
        )
        for (ids_b, sc_b), (ids_s, sc_s) in zip(base, stacked):
            assert ids_b[0] == ids_s[0]  # top-1 stable
            # same candidate set within the top-3
            assert set(ids_b) == set(ids_s)
            for a, b in zip(sorted(sc_b), sorted(sc_s)):
                assert abs(a - b) < 0.02

    def test_static_pallas_close_to_bf16(self):
        """Quantization error of the full static-pallas stack stays
        within ranking-stability tolerance of the bf16 baseline (the
        XLA static mode it used to be compared against was pruned —
        VERDICT r3 next-7)."""
        base = _run()
        pal = _run(stage1_act_int8="static-pallas",
                   stage2_act_int8="static-pallas",
                   stage3_act_int8="static-pallas")
        for (ids_b, sc_b), (ids_p, sc_p) in zip(base, pal):
            assert ids_b[0] == ids_p[0]  # top-1 stable
            assert set(ids_b) == set(ids_p)
            # full-stack int8 quantization error vs bf16 is real
            # (~0.08 on sigmoid scores at tiny shapes); the ranking
            # assertions above are the stability contract
            for a, b in zip(sorted(sc_b), sorted(sc_p)):
                assert abs(a - b) < 0.15

"""int8 activations on the stage-1/2 encoders (``stage1_act_int8`` /
``stage2_act_int8``).

Stage-3 got the int8 x int8 MXU path first (test_int8_act.py,
test_int8_act_static.py); these knobs extend it to the bi-encoder and
the ColBERT encoder, whose document forwards dominate INDEXING time
(BENCH_NOTES round-2: stage-1 fill 892 docs/s is encode-bound on a
healthy tunnel). Queries and documents encode through the same
quantized forward, so similarity comparisons stay like-with-like.

Pins: embedding closeness vs bf16, end-to-end funnel rank stability
(flips only between near-ties), staged/fused consistency within a
mode, static-mode lazy calibration on the indexing path AND on the
load_index + fused path (where no host-side forward ever runs), YAML
round-trip, and the per-knob error message.
"""

from __future__ import annotations

import numpy as np
import pytest


def _base(**extra):
    from tristage_rag_tpu.engine.config import PipelineConfig

    return PipelineConfig(
        stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
        stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
        stage3_top_k=3, stage1_max_text_length=64,
        stage2_max_seq_length=32, stage3_max_length=64,
        mesh_data_parallel=1, compute_dtype="float32", **extra,
    )


DOCS = [f"doc {i} about topic {i % 4} quick brown fox" for i in range(16)]
QUERIES = ("quick brown fox topic 2", "doc topic fox", "topic 3 doc")


class TestStage1ActInt8:
    @pytest.mark.parametrize("mode", ["pallas", "static-pallas"])
    def test_embeddings_close_to_bf16(self, mode):
        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        base = Stage1Retriever(_base())
        qz = Stage1Retriever(_base(stage1_act_int8=mode))
        e_base = base.encode(DOCS[:8])
        e_q = qz.encode(DOCS[:8])
        if mode == "static-pallas":
            assert not qz.runtime.needs_act_calibration
        # unit-norm embeddings: cosine of each pair near 1
        cos = np.sum(e_base * e_q, axis=-1) / (
            np.linalg.norm(e_base, axis=-1) * np.linalg.norm(e_q, axis=-1)
        )
        assert cos.min() > 0.98, cos.min()

    @pytest.mark.parametrize("mode", ["pallas", "static-pallas"])
    def test_funnel_top_set_stable(self, mode):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        extra = dict(stage2_cache_doc_embeddings=True,
                     enable_fused_search=True)
        p_base = RetrievalPipeline(_base(**extra))
        p_base.add_documents(list(DOCS))
        p_q = RetrievalPipeline(_base(stage1_act_int8=mode, **extra))
        p_q.add_documents(list(DOCS))
        agree = 0
        for q in QUERIES:
            o_b = p_base.search(q, top_k=3)
            o_q = p_q.search(q, top_k=3)
            assert o_b["timing"].get("fused") and o_q["timing"].get("fused")
            ids_b = {r["doc_id"] for r in o_b["results"]}
            ids_q = {r["doc_id"] for r in o_q["results"]}
            agree += len(ids_b & ids_q)
        # stage-1 feeds a wide funnel (top 8 of 16 docs): quantization
        # noise may swap borderline candidates but the final top-3 sets
        # must broadly agree
        assert agree >= 2 * len(QUERIES), agree

    def test_staged_vs_fused_consistent_within_mode(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(_base(
            stage1_act_int8="static-pallas", stage2_cache_doc_embeddings=True,
            enable_fused_search=True,
        ))
        p.add_documents(list(DOCS))
        q = QUERIES[0]
        fused = p.search(q, top_k=3)
        assert fused["timing"].get("fused")
        p._fused = None
        staged = p.search(q, top_k=3)
        assert [r["doc_id"] for r in fused["results"]] == [
            r["doc_id"] for r in staged["results"]
        ]


class TestStage2ActInt8:
    @pytest.mark.parametrize("mode", ["pallas", "static-pallas"])
    def test_rescoring_close_to_bf16(self, mode):
        from tristage_rag_tpu.engine.stage2 import ColBERTScorer

        base = ColBERTScorer(_base())
        qz = ColBERTScorer(_base(stage2_act_int8=mode))
        cands = [
            {"doc_id": i, "document": d, "score": 0.0}
            for i, d in enumerate(DOCS[:8])
        ]
        q = QUERIES[0]
        import copy

        s_base = np.asarray([
            c["stage2_score"]
            for c in base.rescore_candidates(q, copy.deepcopy(cands))
        ])
        s_q = np.asarray([
            c["stage2_score"]
            for c in qz.rescore_candidates(q, copy.deepcopy(cands))
        ])
        # MaxSim over unit-norm projected tokens: absolute scale is small
        assert np.abs(np.sort(s_base) - np.sort(s_q)).max() < 0.05

    def test_funnel_with_both_encoders_int8(self):
        """stage1+stage2 both int8 (the indexing configuration) still
        produce a sane funnel vs full bf16."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        extra = dict(stage2_cache_doc_embeddings=True,
                     enable_fused_search=True)
        p_base = RetrievalPipeline(_base(**extra))
        p_base.add_documents(list(DOCS))
        p_q = RetrievalPipeline(_base(
            stage1_act_int8="static-pallas", stage2_act_int8="static-pallas", **extra
        ))
        p_q.add_documents(list(DOCS))
        agree = 0
        for q in QUERIES:
            ids_b = {r["doc_id"]
                     for r in p_base.search(q, top_k=3)["results"]}
            ids_q = {r["doc_id"] for r in p_q.search(q, top_k=3)["results"]}
            agree += len(ids_b & ids_q)
        assert agree >= 2 * len(QUERIES), agree


class TestStaticCalibrationPaths:
    def test_indexing_triggers_calibration(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(_base(
            stage1_act_int8="static-pallas", stage2_act_int8="static-pallas",
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        ))
        p.initialize_stages()
        assert p.stage1.runtime.needs_act_calibration
        assert p.stage2.runtime.needs_act_calibration
        p.add_documents(list(DOCS))
        # the fill paths run runtime.forward -> lazy calibration fired
        assert not p.stage1.runtime.needs_act_calibration
        assert not p.stage2.runtime.needs_act_calibration

    def test_load_index_fused_calibrates(self, tmp_path):
        """After load_index nothing host-side ever encodes — the fused
        _prepare must calibrate stages 1-3 before dispatch."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg_kw = dict(
            stage1_act_int8="static-pallas", stage2_act_int8="static-pallas",
            stage3_act_int8="static-pallas",
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        )
        p0 = RetrievalPipeline(_base(**cfg_kw))
        p0.add_documents(list(DOCS))
        ref = p0.search(QUERIES[0], top_k=3)
        p0.save_index(str(tmp_path / "idx"))

        p1 = RetrievalPipeline(_base(**cfg_kw))
        p1.load_index(str(tmp_path / "idx"))
        assert p1.stage1.runtime.needs_act_calibration
        out = p1.search(QUERIES[0], top_k=3)
        assert out["timing"].get("fused")
        for rt in (p1.stage1.runtime, p1.stage2.runtime,
                   p1.stage3.runtime):
            assert not rt.needs_act_calibration
        # doc caches were encoded by p0's calibrated params; p1
        # calibrates on the same docs -> same scales -> same ranking
        assert [r["doc_id"] for r in out["results"]] == [
            r["doc_id"] for r in ref["results"]
        ]


class TestConfigSurface:
    def test_yaml_roundtrip(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = _base(stage1_act_int8="static-pallas", stage2_act_int8="pallas")
        path = tmp_path / "c.yaml"
        cfg.export(path)
        back = PipelineConfig.from_yaml(path)
        assert back.stage1_act_int8 == "static-pallas"
        assert back.stage2_act_int8 == "pallas"

    @pytest.mark.parametrize("knob", ["stage1_act_int8", "stage2_act_int8"])
    def test_invalid_mode_names_knob(self, knob):
        from tristage_rag_tpu.engine.factory import act_int8_overrides

        with pytest.raises(ValueError, match=knob):
            act_int8_overrides("int4", knob)

    @pytest.mark.parametrize("mode", [True, "dynamic", "static"])
    def test_removed_xla_modes_fail_loudly(self, mode):
        """The plain-XLA act-int8 modes were pruned after measuring as
        in-context losses (VERDICT r3 next-7) — configs carrying them
        must fail with a pointer to the surviving modes, not silently
        run a different quantization."""
        from tristage_rag_tpu.engine.factory import act_int8_overrides

        with pytest.raises(ValueError, match="removed"):
            act_int8_overrides(mode, "stage1_act_int8")

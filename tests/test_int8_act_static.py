"""Static-scale int8 activations (``stage3_act_int8="static-pallas"``).

Dynamic per-token quantization pays an abs-max reduction over the
activations before every dot, which makes contraction-heavy shapes
LOSE (bench_int8_mxu: 3072->768 at 0.87x). Static mode calibrates one
per-tensor scale per site (abs-max on the first real batch, sowed via
the ``act_stats`` collection) so the reduction disappears and o_proj /
down_proj run int8 x int8 as well — the "static column" of the
microbench (2.4-2.9x on those shapes).

This file pins: quantizer numerics (incl. saturation), the scale-leaf
param-tree contract (graft for scale-less checkpoints, treedef
stability across calibration — no recompiles), lazy calibration on
both the staged (runtime.forward) and fused (FusedSearcher._prepare)
paths, and score/rank parity vs the bf16 cross-encoder.
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


def _assert_flips_are_near_ties(s_ref, s_q, tol=0.02):
    """Any pair the two paths order differently must be closer than the
    quantization noise floor in the reference scores."""
    o_ref, o_q = np.argsort(-s_ref), np.argsort(-s_q)
    if o_ref.tolist() == o_q.tolist():
        return
    rank_q = {d: r for r, d in enumerate(o_q)}
    for i in range(len(o_ref)):
        for j in range(i + 1, len(o_ref)):
            a, b = o_ref[i], o_ref[j]
            if rank_q[a] > rank_q[b]:
                assert abs(s_ref[a] - s_ref[b]) < tol, (a, b)


class TestQuantStatic:
    def test_codes_and_saturation(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import quant_static

        x = jnp.asarray([[0.6, -1.0, 300.0, -300.0]], jnp.float32)
        codes, s = quant_static(x, jnp.float32(1.0))
        assert s.ndim == 0
        np.testing.assert_array_equal(
            np.asarray(codes)[0], [1, -1, 127, -127]  # saturates, no wrap
        )

    def test_matmul_scalar_scale_matches_dense(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from tristage_rag_tpu.models.layers import _int8_matmul, quant_static

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((48, 64)), jnp.float32)
        scale = jnp.float32(float(np.abs(np.asarray(x)).max()) / 127.0)
        y = np.asarray(
            _int8_matmul(x, w, jnp.float32, pre=quant_static(x, scale))
        )
        y_ref = np.asarray(x @ w)
        denom = np.abs(y_ref).max()
        assert np.abs(y - y_ref).max() / denom < 0.05


class TestScaleParams:
    def _cross_runtime(self, static=True):
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        mode = "static-pallas" if static else False
        return CrossEncoderReranker(
            _base(stage3_act_int8=mode, stage3_normalize_scores=False)
        )

    def test_static_tree_has_scale_leaves(self):
        from flax.traverse_util import flatten_dict

        import jax

        s = self._cross_runtime(static=True)
        names = {
            p[-1]
            for p in flatten_dict(jax.device_get(s.runtime.params))
        }
        for site in ("attn_in_scale", "attn_out_scale",
                     "mlp_in_scale", "mlp_mid_scale"):
            assert site in names

    def test_calibration_preserves_treedef(self):
        import jax

        s = self._cross_runtime(static=True)
        before = jax.tree_util.tree_structure(s.runtime.params)
        scores = s.predict("quick brown fox", DOCS[:4])
        assert len(scores) == 4
        assert not s.runtime.needs_act_calibration
        after = jax.tree_util.tree_structure(s.runtime.params)
        assert before == after  # calibration never retriggers a compile

    def test_graft_restores_missing_scale_leaves(self):
        """A checkpoint saved WITHOUT scale leaves (e.g. a bf16-trained
        one) must load into a static-mode runtime."""
        import jax
        from flax.traverse_util import flatten_dict, unflatten_dict

        from tristage_rag_tpu.models.runtime import EncoderRuntime

        s = self._cross_runtime(static=True)
        rt = s.runtime
        flat = {
            p: v
            for p, v in flatten_dict(jax.device_get(rt.params)).items()
            if not p[-1].endswith("_scale")
        }
        rebuilt = EncoderRuntime(
            "cross", rt.cfg, rt.head_cfg, params=unflatten_dict(flat),
            seed=7,
        )
        assert rebuilt.needs_act_calibration
        assert jax.tree_util.tree_structure(
            rebuilt.params
        ) == jax.tree_util.tree_structure(rt.params)

    def test_load_params_grafts_and_rearms_calibration(self):
        """Injecting a bf16-trained tree into a live static-mode
        runtime (the bench/trained-weights path) must graft the scale
        leaves and re-arm calibration — direct ``rt.params =`` skips
        both and the next forward dies with ScopeParamNotFoundError
        (the exact failure the aligned funnel-width quality leg hit)."""
        import jax
        from flax.traverse_util import flatten_dict, unflatten_dict

        s = self._cross_runtime(static=True)
        rt = s.runtime
        # simulate a tree produced by bf16 training: no scale leaves
        flat = {
            p: v
            for p, v in flatten_dict(jax.device_get(rt.params)).items()
            if not p[-1].endswith("_scale")
        }
        rt.needs_act_calibration = False  # pretend already calibrated
        rt.load_params(unflatten_dict(flat))
        assert rt.needs_act_calibration
        # forward still works end-to-end (lazy calibration included)
        out = s.predict("quick brown fox", ["doc one", "doc two"])
        assert len(out) == 2


class TestStage3Static:
    def test_scores_close_flips_are_near_ties(self):
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        base = CrossEncoderReranker(_base(stage3_normalize_scores=False))
        stat = CrossEncoderReranker(
            _base(stage3_act_int8="static-pallas", stage3_normalize_scores=False)
        )
        query = "quick brown fox topic 2"
        s_base = np.asarray(base.predict(query, DOCS))
        s_stat = np.asarray(stat.predict(query, DOCS))
        assert np.abs(s_base - s_stat).max() < 0.03
        _assert_flips_are_near_ties(s_base, s_stat)

    def test_calibration_is_once_and_scores_stable(self):
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        stat = CrossEncoderReranker(
            _base(stage3_act_int8="static-pallas", stage3_normalize_scores=False)
        )
        q = "topic 1 doc"
        first = np.asarray(stat.predict(q, DOCS))
        assert not stat.runtime.needs_act_calibration
        second = np.asarray(stat.predict(q, DOCS))
        np.testing.assert_allclose(first, second, atol=1e-6)

    def test_fused_path_calibrates_and_ranks(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        extra = dict(
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        )
        p_base = RetrievalPipeline(_base(**extra))
        p_base.add_documents(list(DOCS))
        p_stat = RetrievalPipeline(_base(stage3_act_int8="static-pallas", **extra))
        p_stat.add_documents(list(DOCS))
        assert p_stat.stage3.runtime.needs_act_calibration
        for q in ("quick brown fox topic 2", "doc topic fox"):
            o_b = p_base.search(q, top_k=3)
            o_s = p_stat.search(q, top_k=3)
            assert o_b["timing"].get("fused") and o_s["timing"].get("fused")
            s_b = np.asarray([r["stage3_score"] for r in o_b["results"]])
            s_s = np.asarray([r["stage3_score"] for r in o_s["results"]])
            # min-max-normalized scale amplifies raw deltas ~3x; the
            # top-3 SET must agree, order flips only between near-ties
            assert {r["doc_id"] for r in o_b["results"]} == {
                r["doc_id"] for r in o_s["results"]
            }
        assert not p_stat.stage3.runtime.needs_act_calibration

    def test_staged_vs_fused_static_consistent(self):
        """Within static mode, the staged fallback and the fused path
        rank the same (both consume the same calibrated params)."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(_base(
            stage3_act_int8="static-pallas", stage2_cache_doc_embeddings=True,
            enable_fused_search=True,
        ))
        p.add_documents(list(DOCS))
        q = "quick brown fox topic 2"
        fused = p.search(q, top_k=3)
        assert fused["timing"].get("fused")
        p._fused = None  # force the staged path
        staged = p.search(q, top_k=3)
        assert [r["doc_id"] for r in fused["results"]] == [
            r["doc_id"] for r in staged["results"]
        ]

    def test_yaml_roundtrip_carries_static(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = _base(stage3_act_int8="static-pallas")
        path = tmp_path / "c.yaml"
        cfg.export(path)
        back = PipelineConfig.from_yaml(path)
        assert back.stage3_act_int8 == "static-pallas"

    def test_invalid_mode_rejected(self):
        from tristage_rag_tpu.engine.factory import act_int8_overrides

        with pytest.raises(ValueError, match="stage3_act_int8"):
            act_int8_overrides("int4", "stage3_act_int8")


class TestLoadParamsTransforms:
    def _static_cross(self):
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        return CrossEncoderReranker(_base(
            stage3_act_int8="static-pallas", stage3_normalize_scores=False,
        ))

    def test_calibrated_tree_keeps_scales(self):
        """A tree saved from a CALIBRATED runtime carries representative
        scales — load_params must not re-arm calibration (which would
        overwrite them from the first serving batch)."""
        import jax

        s = self._static_cross()
        s.predict("quick brown fox", ["doc one", "doc two"])  # calibrates
        assert not s.runtime.needs_act_calibration
        tree = jax.device_get(s.runtime.params)
        s.runtime.load_params(tree)
        assert not s.runtime.needs_act_calibration

    def test_weight_int8_runtime_requantizes_dense_tree(self):
        """Installing a dense (trained) tree into a runtime that ran
        quantize_weights_int8 must re-quantize — otherwise the
        DequantModule wrapper silently serves dense weights while the
        config claims int8."""
        import jax
        from flax.traverse_util import flatten_dict

        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        s = CrossEncoderReranker(_base(
            stage3_weights_int8=True, stage3_normalize_scores=False,
        ))
        rt = s.runtime

        def q8_kernels(tree):
            return sum(
                1 for p in flatten_dict(tree) if p[-1] == "q8"
            )

        n_before = q8_kernels(jax.device_get(rt.params))
        assert n_before > 0
        # a dense tree, as training would produce it
        from tristage_rag_tpu.engine.factory import build_runtime

        dense_rt, _ = build_runtime(
            "cross", "tiny-bert", "./models", compute_dtype="float32",
            seed=_base().seed + 2,
        )
        rt.load_params(jax.device_get(dense_rt.params))
        assert q8_kernels(jax.device_get(rt.params)) == n_before
        out = s.predict("quick brown fox", ["doc one", "doc two"])
        assert len(out) == 2

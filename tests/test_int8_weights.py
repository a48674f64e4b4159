"""Weight-only int8 for the stage-3 cross-encoder
(``stage3_weights_int8``, VERDICT r2 next-3).

Per-output-channel symmetric int8 on large 2-D kernels; the dequant
runs inside the jit via a transparent module adapter
(models/runtime.py::DequantModule), so the SAME (module, params) pair
serves the staged forwards and the fused funnel programs.
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


class TestInt8Weights:
    def test_quantize_kernel_roundtrip(self):
        from tristage_rag_tpu.models.runtime import (
            _dequant_tree, _quantize_kernel,
        )

        rng = np.random.default_rng(0)
        w = rng.standard_normal((64, 96)).astype(np.float32)
        q = _quantize_kernel(w)
        assert q["q8"].dtype == np.int8 and q["scale"].shape == (1, 96)
        back = np.asarray(_dequant_tree({"kernel": q}, np.float32)["kernel"])
        # per-channel quantization error bounded by scale/2 per entry
        assert np.abs(back - w).max() <= (q["scale"].max() / 2) + 1e-6

    def test_runtime_quantizes_large_kernels_only(self):
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        r = CrossEncoderReranker(_base(stage3_weights_int8=True))
        flat = []

        def walk(p, path=()):
            if hasattr(p, "items"):
                for k, v in p.items():
                    walk(v, path + (k,))
            else:
                flat.append((path, p))

        walk(r.runtime.params)
        q8 = [p for p, v in flat if p and p[-1] == "q8"]
        assert q8, "no kernels were quantized"
        # embedding tables must stay dense
        assert not any("embedding" in "/".join(p) and p[-1] == "q8"
                       for p in q8)

    def test_staged_scores_close_and_rank_identical(self):
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        a = CrossEncoderReranker(_base())
        b = CrossEncoderReranker(_base(stage3_weights_int8=True))
        q = "quick brown fox"
        sa = a.predict(q, DOCS[:8])
        sb = b.predict(q, DOCS[:8])
        assert max(abs(x - y) for x, y in zip(sa, sb)) < 0.02
        # order must match wherever bf16 score gaps exceed the int8
        # error budget (near-ties may legitimately swap)
        ra, rb = np.argsort(sa)[::-1], np.argsort(sb)[::-1]
        for pos, (i, j) in enumerate(zip(ra, rb)):
            if i != j:
                assert abs(sa[i] - sa[j]) < 0.02, (pos, sa, sb)

    def test_fused_path_rank_identical(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        extra = dict(
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        )
        p1 = RetrievalPipeline(_base(**extra))
        p1.add_documents(list(DOCS))
        p2 = RetrievalPipeline(_base(stage3_weights_int8=True, **extra))
        p2.add_documents(list(DOCS))
        for q in ("quick brown fox topic 2", "doc topic fox"):
            o1 = p1.search(q, top_k=3)
            o2 = p2.search(q, top_k=3)
            assert o1["timing"].get("fused") and o2["timing"].get("fused")
            assert [r["doc_id"] for r in o1["results"]] == [
                r["doc_id"] for r in o2["results"]
            ]

    def test_yaml_roundtrip_carries_flag(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = _base(stage3_weights_int8=True)
        path = tmp_path / "c.yaml"
        cfg.export(path)
        back = PipelineConfig.from_yaml(path)
        assert back.stage3_weights_int8 is True


class TestWeightInt8QuantizesFromF32:
    """The dense-kernel pre-cast (runtime._precast_embed_tables) must
    NOT feed weight-only int8 quantization: int8 codes/scales derive
    from the ORIGINAL f32 kernels, not bf16-rounded ones (stacked
    rounding). stage3 passes precast_kernels=False when
    stage3_weights_int8 is set; quantize_weights_int8 then pins the
    flag off for every later load_params placement."""

    def _runtime(self, precast):
        from tristage_rag_tpu.models.config import EncoderConfig
        from tristage_rag_tpu.models.heads import CrossEncoderConfig
        from tristage_rag_tpu.models.runtime import EncoderRuntime

        cfg = EncoderConfig(
            vocab_size=128, hidden_size=128, num_layers=1, num_heads=2,
            mlp_dim=256, max_position_embeddings=64, dtype="bfloat16",
        )
        return EncoderRuntime(
            "cross", cfg, CrossEncoderConfig(), seed=0,
            precast_kernels=precast,
        )

    def _kernel_dtypes(self, params):
        from flax.traverse_util import flatten_dict

        return {
            "/".join(p): v.dtype
            for p, v in flatten_dict(params).items()
            if p[-1] == "kernel" and getattr(v, "ndim", 0) >= 2
        }

    def test_precast_flag_keeps_kernels_f32(self):
        import jax.numpy as jnp

        on = self._kernel_dtypes(self._runtime(True).params)
        off = self._kernel_dtypes(self._runtime(False).params)
        assert any(dt == jnp.bfloat16 for dt in on.values()), on
        assert all(dt == jnp.float32 for dt in off.values()), off

    def test_quantize_sources_are_f32(self):
        import numpy as np
        from tristage_rag_tpu.models.runtime import _quantize_kernel

        rt = self._runtime(False)
        f32_kernels = {
            k: np.asarray(v)
            for k, v in self._kernel_dtypes(rt.params).items()
        }
        # capture one big f32 kernel before quantization
        from flax.traverse_util import flatten_dict

        flat = {
            "/".join(p): np.asarray(v)
            for p, v in flatten_dict(jax.device_get(rt.params)).items()
            if p[-1] == "kernel" and getattr(v, "ndim", 0) == 2
            and v.size >= 4096
        }
        assert flat, "expected at least one quantizable kernel"
        name, w = next(iter(flat.items()))
        n = rt.quantize_weights_int8()
        assert n >= 1
        assert rt._precast_kernels is False
        expect = _quantize_kernel(w)
        got = None
        for p, v in flatten_dict(jax.device_get(rt.params)).items():
            if "/".join(p).startswith(name) and p[-1] == "q8":
                got = v
        # the q8 codes match quantizing the f32 source exactly; a
        # bf16-precast source would differ on ~0.4% of entries
        assert got is not None
        np.testing.assert_array_equal(np.asarray(got), expect["q8"])

    def test_stage3_pipeline_keeps_f32_sources(self):
        # end-to-end: the stage-3 builder disables kernel precast when
        # weight-int8 is requested, even at bf16 compute dtype
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
            stage3_top_k=3, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            mesh_data_parallel=1, compute_dtype="bfloat16",
            stage3_weights_int8=True,
        )
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        rt = CrossEncoderReranker(cfg).runtime
        assert rt._weights_int8 and rt._precast_kernels is False


import jax  # noqa: E402  (used by TestWeightInt8QuantizesFromF32)

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


class TestStage12WeightsInt8:
    """``stage{1,2}_weights_int8`` — the batch-1 query-encode
    bandwidth lever (the serving funnel's stage-1/2 query encodes are
    weight-HBM-bound; halving the weight read is direct latency there,
    unlike compute-bound stage-3 where weight-int8 measured neutral)."""

    def test_stage1_embeddings_close(self):
        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        a = Stage1Retriever(_base())
        b = Stage1Retriever(_base(stage1_weights_int8=True))
        assert b.runtime._weights_int8 and not a.runtime._weights_int8
        ea = np.asarray(a.encode(["quick brown fox"], kind="query"))
        eb = np.asarray(b.encode(["quick brown fox"], kind="query"))
        # unit-norm embeddings: cosine similarity, not absolute error
        cos = float((ea * eb).sum())
        assert cos > 0.98, cos

    def test_stage2_scores_close_and_rank_tolerant(self):
        from tristage_rag_tpu.engine.stage2 import ColBERTScorer

        a = ColBERTScorer(_base())
        b = ColBERTScorer(_base(stage2_weights_int8=True))
        q = "quick brown fox"
        cands = [
            {"doc_id": i, "document": d} for i, d in enumerate(DOCS[:8])
        ]
        sa = [r["stage2_score"] for r in sorted(
            a.rescore_candidates(q, [dict(c) for c in cands]),
            key=lambda r: r["doc_id"])]
        sb = [r["stage2_score"] for r in sorted(
            b.rescore_candidates(q, [dict(c) for c in cands]),
            key=lambda r: r["doc_id"])]
        assert max(abs(x - y) for x, y in zip(sa, sb)) < 0.05
        ra, rb = np.argsort(sa)[::-1], np.argsort(sb)[::-1]
        for i, j in zip(ra, rb):
            if i != j:
                assert abs(sa[i] - sa[j]) < 0.05, (sa, sb)

    def test_fused_pipeline_all_stages_quantized(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(_base(
            stage1_weights_int8=True, stage2_weights_int8=True,
            stage3_weights_int8=True,
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        ))
        p.add_documents(list(DOCS))
        out = p.search("quick brown fox topic 2", top_k=3)
        assert out["timing"].get("fused") is True
        assert len(out["results"]) == 3
        r0 = out["results"][0]
        for k in ("doc_id", "score", "stage1_score", "stage2_score",
                  "stage3_score"):
            assert k in r0 and np.isfinite(r0[k]), (k, r0)

    def test_persisted_cache_keys_on_stage2_encode_mode(self, tmp_path):
        # token embeddings written under bf16 weights must NOT serve a
        # stage2_weights_int8 pipeline: the meta mismatch forces refill
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        extra = dict(
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
            persist_device_caches=True, index_dir=str(tmp_path),
        )
        p1 = RetrievalPipeline(_base(**extra))
        p1.add_documents(list(DOCS))
        p1.save_index()
        p2 = RetrievalPipeline(_base(stage2_weights_int8=True, **extra))
        assert p2.load_index()
        ok2, ok3 = p2._load_device_caches(str(tmp_path))
        assert not ok2 and not ok3  # encode-mode mismatch -> refill
        # same mode loads fine
        p3 = RetrievalPipeline(_base(**extra))
        assert p3.load_index()
        ok2, _ = p3._load_device_caches(str(tmp_path))
        assert ok2

    def test_yaml_roundtrip_carries_flags(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = _base(stage1_weights_int8=True, stage2_weights_int8=True)
        path = tmp_path / "c.yaml"
        cfg.export(path)
        back = PipelineConfig.from_yaml(path)
        assert back.stage1_weights_int8 is True
        assert back.stage2_weights_int8 is True


class TestWeightInt8KernelPath:
    """Weight-int8 through the Pallas fused-MLP kernel (VMEM tile
    dequant) — the serving path that actually halves the weight HBM
    read. The XLA dequant lowering materializes dense kernels per
    dispatch and measured SLOWER than plain bf16 (BENCH_NOTES s9)."""

    def _aligned(self, **extra):
        from tristage_rag_tpu.engine.config import PipelineConfig

        return PipelineConfig(
            stage1_model="tiny-gemma-aligned",
            stage2_model="tiny-modernbert-aligned",
            stage3_model="tiny-bert-aligned", stage1_top_k=8,
            stage2_top_k=6, stage3_top_k=3, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            mesh_data_parallel=1, compute_dtype="bfloat16",
            stage1_fused_mlp=True, stage2_fused_mlp=True,
            stage3_fused_mlp=True, **extra,
        )

    def test_mlp_dicts_pass_through_when_kernel_engages(self):
        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        r = Stage1Retriever(self._aligned(stage1_weights_int8=True))
        assert r.runtime.module._keep_names == (
            "gate_proj", "up_proj", "down_proj",
        )
        # misaligned dims -> module path -> everything must dequantize
        from tristage_rag_tpu.engine.config import PipelineConfig

        r2 = Stage1Retriever(PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_fused_mlp=True,
            stage1_weights_int8=True, mesh_data_parallel=1,
        ))
        assert r2.runtime.module._keep_names == ()

    def test_attention_kernels_quantize_too(self):
        # 3-D DenseGeneral kernels (QKV) quantize with broadcastable
        # per-output-unit scales; survivors pre-cast to compute dtype
        # (an f32 survivor would re-convert per dispatch — the
        # session-9 trace pathology)
        import jax
        import jax.numpy as jnp
        from flax.traverse_util import flatten_dict
        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        r = Stage1Retriever(self._aligned(stage1_weights_int8=True))
        flat = flatten_dict(jax.device_get(r.runtime.params))
        q8_3d = [
            (p, v) for p, v in flat.items()
            if p[-1] == "q8" and v.ndim == 3
        ]
        assert q8_3d, "no 3-D (attention) kernels were quantized"
        for p, v in q8_3d:
            scale = flat[p[:-1] + ("scale",)]
            assert scale.shape == (1,) + v.shape[1:], (p, scale.shape)
        # no f32 dense kernel survives outside the classifier
        for p, v in flat.items():
            if p[-1] == "kernel" and not isinstance(v, dict):
                assert v.dtype != jnp.float32 or "classifier" in str(p), p

    def test_fused_pipeline_matches_bf16_ranking(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        extra = dict(
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        )
        pa = RetrievalPipeline(self._aligned(**extra))
        pa.add_documents(list(DOCS))
        pb = RetrievalPipeline(self._aligned(
            stage1_weights_int8=True, stage2_weights_int8=True,
            stage3_weights_int8=True, **extra,
        ))
        pb.add_documents(list(DOCS))
        oa = pa.search("quick brown fox topic 2", top_k=3)
        ob = pb.search("quick brown fox topic 2", top_k=3)
        assert oa["timing"].get("fused") and ob["timing"].get("fused")
        sa = {r["doc_id"]: r["score"] for r in oa["results"]}
        sb = {r["doc_id"]: r["score"] for r in ob["results"]}
        # top hit identical, scores within the int8 contract
        assert oa["results"][0]["doc_id"] == ob["results"][0]["doc_id"]
        for i in set(sa) & set(sb):
            assert abs(sa[i] - sb[i]) < 0.05


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

"""Native checkpoint format (models/native_ckpt.py): the train->serve
bridge.

Pins: per-kind round-trip (configs, params, prompts), factory by-name
loading (weights_loaded honesty flag, prompt pass-through, kind
mismatch falls back to random init), runtime-knob hygiene (int8 modes
never persist; *_scale calibration leaves stripped and re-graftable;
weight-only int8 trees refused), and the full loop: run_train
--export-dir -> PipelineConfig serves the exported model by name.
"""

from __future__ import annotations

import numpy as np
import pytest


def _runtime(kind, name, seed=0):
    from tristage_rag_tpu.engine.factory import build_runtime

    return build_runtime(kind, name, "", compute_dtype="float32", seed=seed)


class TestRoundTrip:
    @pytest.mark.parametrize("kind,name", [
        ("bi", "tiny-gemma"),
        ("colbert", "tiny-modernbert"),
        ("cross", "tiny-bert"),
    ])
    def test_save_load_identity(self, tmp_path, kind, name):
        import jax
        from flax.traverse_util import flatten_dict

        from tristage_rag_tpu.models.native_ckpt import load_native, save_native

        rt, _ = _runtime(kind, name)
        prompts = {"query": "q: ", "document": "d: "} if kind == "bi" else {}
        out = save_native(
            tmp_path / "m", kind, rt.cfg, rt.head_cfg, rt.params,
            prompts=prompts,
        )
        k2, cfg2, head2, params2, prompts2 = load_native(
            out, compute_dtype="float32"
        )
        assert k2 == kind
        assert cfg2 == rt.cfg.replace(
            int8_activations=False, int8_act_static=False
        )
        assert head2 == rt.head_cfg
        assert prompts2 == prompts
        flat_a = flatten_dict(jax.device_get(rt.params))
        flat_b = flatten_dict(params2)
        assert set(flat_a) == set(flat_b)
        for p in flat_a:
            np.testing.assert_allclose(
                np.asarray(flat_a[p]), flat_b[p], atol=0
            )

    def test_scale_leaves_stripped_and_regraftable(self, tmp_path):
        """A static-int8 runtime's calibration leaves don't persist;
        a static-mode deployment re-grafts them on load."""
        import jax
        from flax.traverse_util import flatten_dict

        from tristage_rag_tpu.models.native_ckpt import load_native, save_native
        from tristage_rag_tpu.models.runtime import EncoderRuntime

        rt, _ = _runtime("cross", "tiny-bert")
        static_cfg = rt.cfg.replace(
            int8_activations=True, int8_act_static=True
        )
        static_rt = EncoderRuntime("cross", static_cfg, rt.head_cfg, seed=0)
        assert any(
            p[-1].endswith("_scale")
            for p in flatten_dict(jax.device_get(static_rt.params))
        )
        out = save_native(
            tmp_path / "m", "cross", static_cfg, static_rt.head_cfg,
            static_rt.params,
        )
        _, cfg2, head2, params2, _ = load_native(out, "float32")
        assert not cfg2.int8_activations and not cfg2.int8_act_static
        assert not any(
            p[-1].endswith("_scale") for p in flatten_dict(params2)
        )
        # a static deployment grafts the scales back (checkpoint-
        # predates-scales path in EncoderRuntime.__init__)
        redeployed = EncoderRuntime(
            "cross", cfg2.replace(int8_activations=True,
                                  int8_act_static=True),
            head2, params=params2, seed=1,
        )
        assert redeployed.needs_act_calibration

    def test_weight_only_int8_tree_refused(self, tmp_path):
        from tristage_rag_tpu.models.native_ckpt import save_native

        rt, _ = _runtime("cross", "tiny-bert")
        rt.quantize_weights_int8(min_size=1)
        with pytest.raises(ValueError, match="q8"):
            save_native(tmp_path / "m", "cross", rt.cfg, rt.head_cfg,
                        rt.params)

    def test_wrong_head_type_refused(self, tmp_path):
        from tristage_rag_tpu.models.config import PoolingConfig
        from tristage_rag_tpu.models.native_ckpt import save_native

        rt, _ = _runtime("cross", "tiny-bert")
        with pytest.raises(TypeError):
            save_native(tmp_path / "m", "cross", rt.cfg, PoolingConfig(),
                        rt.params)


class TestFactoryLoads:
    def test_by_name_with_prompts(self, tmp_path):
        import jax
        from flax.traverse_util import flatten_dict

        from tristage_rag_tpu.engine.factory import build_runtime
        from tristage_rag_tpu.models.native_ckpt import save_native

        rt, _ = _runtime("bi", "tiny-gemma")
        prompts = {"query": "task: q | ", "document": "task: d | "}
        save_native(tmp_path / "my-tuned-bi", "bi", rt.cfg, rt.head_cfg,
                    rt.params, prompts=prompts)
        loaded, _tok = build_runtime(
            "bi", "my-tuned-bi", str(tmp_path), compute_dtype="float32"
        )
        assert loaded.weights_loaded
        assert loaded.prompts == prompts
        fa = flatten_dict(jax.device_get(rt.params))
        fb = flatten_dict(jax.device_get(loaded.params))
        for p in fa:
            np.testing.assert_allclose(np.asarray(fa[p]),
                                       np.asarray(fb[p]), atol=0)

    def test_kind_mismatch_fails_loudly(self, tmp_path):
        """Pointing a stage at the wrong-kind checkpoint is a CONFIG
        error — it must raise, not degrade to random-init serving
        (which would return garbage scores that look live)."""
        from tristage_rag_tpu.engine.factory import build_runtime
        from tristage_rag_tpu.models.native_ckpt import (
            CheckpointKindError, save_native,
        )

        rt, _ = _runtime("cross", "tiny-bert")
        save_native(tmp_path / "a-cross-model", "cross", rt.cfg,
                    rt.head_cfg, rt.params)
        with pytest.raises(CheckpointKindError, match="'cross'"):
            build_runtime(
                "bi", "a-cross-model", str(tmp_path),
                compute_dtype="float32",
            )

    def test_prompt_mode_none_suppresses_saved_prompts(self, tmp_path):
        from tristage_rag_tpu.engine.factory import build_runtime
        from tristage_rag_tpu.models.native_ckpt import save_native

        rt, _ = _runtime("bi", "tiny-gemma")
        save_native(tmp_path / "b", "bi", rt.cfg, rt.head_cfg, rt.params,
                    prompts={"query": "QQ", "document": "DD"})
        loaded, _ = build_runtime(
            "bi", "b", str(tmp_path), compute_dtype="float32",
            prompt_mode="none",
        )
        assert loaded.prompts == {"query": "", "document": ""}


class TestTrainServeLoop:
    def test_distill_export_then_serve(self, tmp_path):
        """run_train --arch distill --export-dir, then the pipeline
        serves the distilled student BY NAME."""
        import json
        import os
        import subprocess
        import sys

        pairs = tmp_path / "pairs.jsonl"
        with open(pairs, "w") as f:
            for i in range(32):
                f.write(json.dumps({
                    "query": f"query about topic {i % 4}",
                    "positive": f"document {i} covers topic {i % 4} fully",
                }) + "\n")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        export = tmp_path / "models" / "distilled-l1"
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "run_train.py"),
             "--pairs", str(pairs), "--arch", "distill",
             "--model", "tiny-bert-1l", "--teacher", "tiny-bert",
             "--steps", "6", "--batch-size", "8", "--lr", "3e-3",
             "--warmup", "1", "--doc-max-len", "48", "--log-every", "3",
             "--ckpt-dir", str(tmp_path / "ckpts"), "--ckpt-every", "6",
             "--export-dir", str(export), "--platform", "cpu"],
            capture_output=True, text=True, timeout=300,
            env={**os.environ, "PYTHONPATH": repo + os.pathsep
                 + os.environ.get("PYTHONPATH", "")},
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "exported servable checkpoint" in out.stdout
        assert (export / "native_config.json").exists()

        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="distilled-l1", model_dir=str(tmp_path / "models"),
            stage1_top_k=8, stage2_top_k=6, stage3_top_k=3,
            stage1_max_text_length=64, stage2_max_seq_length=32,
            stage3_max_length=64, mesh_data_parallel=1,
            compute_dtype="float32",
        ))
        p.add_documents(
            [f"document {i} covers topic {i % 4} fully" for i in range(12)]
        )
        assert p.stage3.runtime.weights_loaded
        assert p.stage3.runtime.cfg.num_layers == 1
        res = p.search("query about topic 2", top_k=3)["results"]
        assert len(res) == 3 and all(np.isfinite(r["score"]) for r in res)

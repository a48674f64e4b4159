"""Cross-encoder distillation (train/distill.py).

Pins: the layer-map math, DistilBERT-style warm start (treedef
stability + which leaves copy), logit-matching convergence of a
1-layer student toward a 2-layer teacher, the hard-label mixing knob,
dp/tp-mesh execution of the distill step, and serving the distilled
student through the ordinary stage-3 runtime (registry entries
tiny-bert-1l / minilm-l2-cross).
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cross_pair():
    """(teacher_runtime, student_runtime, tokenizer) tiny pair."""
    from tristage_rag_tpu.engine.factory import build_runtime

    teacher, tok = build_runtime(
        "cross", "tiny-bert", "", compute_dtype="float32", seed=0
    )
    student, _ = build_runtime(
        "cross", "tiny-bert-1l", "", compute_dtype="float32", seed=1
    )
    return teacher, student, tok


PAIRS = [
    (f"query about topic {i % 4}", f"document {i} covers topic {i % 4} fully")
    for i in range(24)
]


def _batch(tok, rng, bs=8, max_length=48):
    from tristage_rag_tpu.train.data import cross_pair_batch

    import jax.numpy as jnp

    idx = rng.choice(len(PAIRS), size=bs, replace=False)
    cb = cross_pair_batch(
        tok, [PAIRS[i][0] for i in idx], [PAIRS[i][1] for i in idx],
        max_length,
    )
    return (jnp.asarray(cb.ids), jnp.asarray(cb.mask),
            jnp.asarray(cb.types), jnp.asarray(cb.labels))


class TestLayerMap:
    def test_spacing(self):
        from tristage_rag_tpu.train.distill import layer_map

        assert layer_map(2, 6) == [0, 5]
        assert layer_map(3, 6) == [0, 2, 5]  # round(j*5/2)
        assert layer_map(1, 6) == [5]
        assert layer_map(6, 6) == [0, 1, 2, 3, 4, 5]
        assert layer_map(0, 6) == []

    def test_warm_start_copies_and_keeps_treedef(self, cross_pair):
        import jax
        from flax.traverse_util import flatten_dict

        from tristage_rag_tpu.train.distill import init_student_from_teacher

        teacher, student, _ = cross_pair
        before = jax.tree_util.tree_structure(student.params)
        warm, copied = init_student_from_teacher(
            student.params, teacher.params
        )
        assert jax.tree_util.tree_structure(warm) == before
        # same width -> every student leaf has a teacher source
        assert copied == len(flatten_dict(jax.device_get(student.params)))
        flat_w = flatten_dict(warm)
        flat_t = flatten_dict(jax.device_get(teacher.params))
        # 1-layer student's layer_0 <- teacher's LAST layer (layer_1)
        np.testing.assert_array_equal(
            flat_w[("encoder", "layer_0", "attn", "q_proj", "kernel")],
            flat_t[("encoder", "layer_1", "attn", "q_proj", "kernel")],
        )
        np.testing.assert_array_equal(
            flat_w[("classifier", "kernel")], flat_t[("classifier", "kernel")]
        )

    def test_width_mismatch_keeps_student_init(self, cross_pair):
        """A narrower student copies nothing (shapes differ) but the
        call still succeeds with the student's own init."""
        import jax

        from tristage_rag_tpu.engine.factory import build_runtime
        from tristage_rag_tpu.models import registry
        from tristage_rag_tpu.models.runtime import EncoderRuntime

        teacher, _, _ = cross_pair
        cfg = registry.encoder_config("tiny-bert-1l").replace(hidden_size=32,
                                                              mlp_dim=64)
        narrow = EncoderRuntime(
            "cross", cfg, registry.CROSS_CONFIGS["tiny-bert-1l"], seed=3
        )
        from tristage_rag_tpu.train.distill import init_student_from_teacher

        warm, copied = init_student_from_teacher(narrow.params, teacher.params)
        # Only width-independent leaves can match shapes (the (1,)-shaped
        # classifier bias); every kernel/embedding stays the student's init.
        assert copied <= 1
        assert jax.tree_util.tree_structure(warm) == (
            jax.tree_util.tree_structure(narrow.params)
        )


class TestDistillation:
    def _fit(self, cross_pair, steps=60, mesh=None, hard_w=0.0):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.train.distill import (
            CrossEncoderDistiller, DistillConfig, init_student_from_teacher,
        )

        teacher, student, tok = cross_pair
        dist = CrossEncoderDistiller(
            student.module,
            DistillConfig(learning_rate=3e-3, warmup_steps=5,
                          total_steps=steps, hard_label_weight=hard_w),
            mesh=mesh, teacher_module=teacher.module,
        )
        rng = np.random.default_rng(0)
        b0 = _batch(tok, rng)
        state = dist.init_state(jax.random.PRNGKey(0), b0[0], b0[1])
        warm, _ = init_student_from_teacher(student.params, teacher.params)
        if mesh is None:
            state["params"] = jax.device_put(jax.device_get(warm))
        else:
            from tristage_rag_tpu.train.contrastive import make_param_shardings

            sh = make_param_shardings(warm, mesh, "tp")
            state["params"] = jax.tree.map(
                lambda x, s: jax.device_put(np.asarray(x), s), warm, sh
            )
        tp = jax.device_get(teacher.params)
        losses = []
        for _ in range(steps):
            state, m = dist.train_step(state, tp, *_batch(tok, rng))
            losses.append(float(m["loss"]))
        return teacher, student, tok, state, losses

    def test_student_converges_to_teacher(self, cross_pair):
        import jax
        import jax.numpy as jnp

        teacher, student, tok, state, losses = self._fit(cross_pair)
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

        # held-out pairs: distilled student ranks like the teacher
        from tristage_rag_tpu.train.data import cross_pair_batch

        eval_pairs = [
            ("query about topic 9", f"doc {i} on topic {i % 6}")
            for i in range(8)
        ]
        tb = tok.encode_pairs(eval_pairs, 48)
        args = (jnp.asarray(tb.input_ids), jnp.asarray(tb.attn_mask),
                jnp.asarray(tb.token_type_ids))
        t_raw = np.asarray(
            teacher.module.apply({"params": teacher.params}, *args)
        )[:, 0]
        s_raw = np.asarray(
            student.module.apply({"params": state["params"]}, *args)
        )[:, 0]
        r_raw = np.asarray(
            student.module.apply({"params": student.params}, *args)
        )[:, 0]
        err_distilled = float(np.mean((s_raw - t_raw) ** 2))
        err_random = float(np.mean((r_raw - t_raw) ** 2))
        assert err_distilled < err_random * 0.5, (err_distilled, err_random)

    def test_hard_label_mixing_runs(self, cross_pair):
        *_, losses = self._fit(cross_pair, steps=8, hard_w=0.5)
        assert np.isfinite(losses).all()

    def test_distill_step_on_mesh(self, cross_pair):
        import jax
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices("cpu")[:8]).reshape(4, 2)
        mesh = Mesh(devs, ("dp", "tp"))
        *_, losses = self._fit(cross_pair, steps=6, mesh=mesh)
        assert np.isfinite(losses).all()
        assert losses[-1] <= losses[0]


class TestRunner:
    def test_run_train_arch_distill(self, tmp_path):
        """run_train.py --arch distill end-to-end: warm start, steps,
        checkpoint — the shipped entry point for the distiller."""
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
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "run_train.py"),
             "--pairs", str(pairs), "--arch", "distill",
             "--model", "tiny-bert-1l", "--teacher", "tiny-bert",
             "--steps", "6", "--batch-size", "8", "--lr", "3e-3",
             "--warmup", "1", "--doc-max-len", "48", "--log-every", "3",
             "--ckpt-dir", str(tmp_path / "ckpts"), "--ckpt-every", "6",
             "--platform", "cpu"],
            capture_output=True, text=True, timeout=300,
            env={**os.environ, "PYTHONPATH": repo + os.pathsep
                 + os.environ.get("PYTHONPATH", "")},
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "warm-started student from teacher: 23 leaves" in out.stdout
        assert "done: 6 steps" in out.stdout
        assert (tmp_path / "ckpts").exists()

    def test_distill_requires_teacher(self, tmp_path):
        import os
        import subprocess
        import sys

        pairs = tmp_path / "p.jsonl"
        pairs.write_text('{"query": "q", "positive": "d"}\n')
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "run_train.py"),
             "--pairs", str(pairs), "--arch", "distill",
             "--model", "tiny-bert-1l", "--platform", "cpu"],
            capture_output=True, text=True, timeout=120,
            env={**os.environ, "PYTHONPATH": repo + os.pathsep
                 + os.environ.get("PYTHONPATH", "")},
        )
        assert out.returncode != 0
        assert "--arch distill requires --teacher" in out.stderr


class TestServeStudent:
    def test_student_serves_stage3(self, cross_pair):
        """The distilled student drops into the ordinary stage-3
        runtime (registry tiny-bert-1l) and reranks."""
        import jax

        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker
        from tristage_rag_tpu.train.distill import init_student_from_teacher

        teacher, student, tok = cross_pair
        rr = CrossEncoderReranker(PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert-1l", stage3_max_length=64,
            mesh_data_parallel=1, compute_dtype="float32",
            stage3_normalize_scores=False,
        ))
        warm, _ = init_student_from_teacher(rr.runtime.params, teacher.params)
        rr.runtime.params = jax.device_put(warm)
        scores = rr.predict("topic 2 query", [p[1] for p in PAIRS[:6]])
        assert len(scores) == 6 and np.isfinite(scores).all()

    def test_minilm_l2_registry_resolves(self):
        from tristage_rag_tpu.engine.factory import resolve_registry_key
        from tristage_rag_tpu.models import registry

        key = resolve_registry_key(
            "cross-encoder/ms-marco-MiniLM-L2-v2".lower(), "cross"
        )
        assert key == "minilm-l2-cross"
        cfg = registry.encoder_config(key)
        full = registry.encoder_config("minilm-l6-cross")
        assert cfg.num_layers == 2 and cfg.hidden_size == full.hidden_size

"""Cross-encoder distillation: shrink the stage-3 reranker.

Stage-3 is the measured latency tail of the funnel (BENCH_NOTES:
~+1.1 ms device time per +50 pairs; weight-only int8 is
latency-neutral because the stage is MXU compute-bound). The
structural lever is a SMALLER student: the reference serves
cross-encoder/ms-marco-MiniLM-L6-v2 (/root/reference/src/
stage3_reranker.py:17), whose published fast sibling (L2-v2) is a
2-layer distillation of the same family — this module is the
TPU-native path to produce such a student in-domain instead of
downloading one.

Recipe (standard cross-encoder logit distillation):

* **Layer-init** (`init_student_from_teacher`): copy embeddings,
  norms, and the classifier head, plus an evenly-spaced subset of
  teacher layers (first and last always included), DistilBERT-style.
  Only shape-matching leaves copy, so a narrower student silently
  keeps its random init where dims differ.
* **Logit matching** (`CrossEncoderDistiller`): MSE between the raw
  (pre-activation) teacher and student logits on serving-encoded
  pair rows, optionally mixed with the hard-label BCE of
  `CrossEncoderTrainer` via ``hard_label_weight``. The teacher
  forward runs inside the jitted step under ``stop_gradient`` with
  its params riding as a replicated ARG (never a closure — captured
  constants bloat the HLO, see CLAUDE.md) — one fused XLA program
  per step, both forwards on the MXU.

The student then serves through the ordinary stage-3 runtime (swap
``stage3_model`` to the student config and install the distilled
params); `scripts/bench_distill.py` measures the latency/quality
trade on the funnel.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import jax.numpy as jnp
import optax

from tristage_rag_tpu.train.contrastive import TrainConfig, Trainer

_LAYER_RE = re.compile(r"^layer_(\d+)$")


def _layer_indices(flat: dict) -> list[int]:
    out = set()
    for path in flat:
        for part in path:
            m = _LAYER_RE.match(str(part))
            if m:
                out.add(int(m.group(1)))
    return sorted(out)


def layer_map(n_student: int, n_teacher: int) -> list[int]:
    """Evenly-spaced teacher layer for each student layer, first and
    last teacher layers always included (the last layers carry the
    CLS features the classifier reads): S=2,T=6 -> [0, 5];
    S=3,T=6 -> [0, 2, 5] (round(j*(T-1)/(S-1)))."""
    if n_student <= 0 or n_teacher <= 0:
        return []
    if n_student == 1:
        return [n_teacher - 1]
    return [
        round(j * (n_teacher - 1) / (n_student - 1))
        for j in range(n_student)
    ]


def init_student_from_teacher(student_params, teacher_params):
    """DistilBERT-style warm start. Returns ``(params, n_copied)``;
    the returned tree has the student's exact treedef (only values
    change), so it drops into an existing EncoderRuntime without
    recompiles."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat_s = dict(flatten_dict(jax.device_get(student_params)))
    flat_t = dict(flatten_dict(jax.device_get(teacher_params)))
    s_layers = _layer_indices(flat_s)
    t_layers = _layer_indices(flat_t)
    mapping = dict(zip(s_layers, layer_map(len(s_layers), len(t_layers))))

    def _source(path):
        parts = []
        for part in path:
            m = _LAYER_RE.match(str(part))
            if m:
                j = int(m.group(1))
                if j not in mapping:
                    return None
                part = f"layer_{t_layers[mapping[j]]}"
            parts.append(part)
        return tuple(parts)

    copied = 0
    out = {}
    for path, leaf in flat_s.items():
        src = _source(path)
        if src is not None and src in flat_t and flat_t[src].shape == leaf.shape:
            out[path] = flat_t[src]
            copied += 1
        else:
            out[path] = leaf
    return unflatten_dict(out), copied


@dataclasses.dataclass
class DistillConfig(TrainConfig):
    # loss = (1-w) * MSE(student_raw, teacher_raw) + w * BCE(hard labels)
    hard_label_weight: float = 0.0


@dataclasses.dataclass
class CrossEncoderDistiller(Trainer):
    """Logit-matching distiller for the stage-3 cross-encoder family.

    ``module`` is the STUDENT; ``teacher_module`` the (frozen) teacher.
    train_step(state, teacher_params, ids, mask, types, labels):
    batch rows are serving-encoded pairs (train/data.py::
    cross_pair_batch — labels only matter when ``hard_label_weight``
    > 0, but ride along so the same loader feeds both trainers).
    Teacher params ride as the Trainer base's replicated leading arg:
    device_put ONCE (cached while the caller passes the same host
    tree — re-uploading ~100 MB per step would dominate on tunneled
    TPUs) and replicated over the mesh; batch rows shard over dp
    exactly like CrossEncoderTrainer's.
    """

    teacher_module: Any = None
    _N_REPL_ARGS = 1

    @staticmethod
    def _raw(module, params, ids, mask, types):
        logits = module.apply({"params": params}, ids, mask, types)
        if logits.shape[-1] == 1:
            return logits[..., 0]
        return logits[..., -1] - logits[..., 0]

    def _loss_fn(self, params, teacher_params, ids, mask, types, labels):
        t = jax.lax.stop_gradient(
            self._raw(self.teacher_module, teacher_params, ids, mask, types)
        ).astype(jnp.float32)
        s = self._raw(self.module, params, ids, mask, types).astype(jnp.float32)
        mse = jnp.mean(jnp.square(s - t))
        w = getattr(self.cfg, "hard_label_weight", 0.0)
        loss = mse
        if w > 0.0:
            y = labels[..., 0].astype(jnp.float32)
            bce = jnp.mean(optax.sigmoid_binary_cross_entropy(s, y))
            loss = (1.0 - w) * mse + w * bce
        # "accuracy" = sign agreement with the teacher's decision.
        acc = jnp.mean((s > 0) == (t > 0))
        return loss, acc

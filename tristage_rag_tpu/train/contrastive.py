"""Contrastive (InfoNCE) training for the retrieval encoders.

The reference ships inference-only models; production retrieval engines
fine-tune their encoders on in-domain pairs, so the TPU build provides a
first-class training path: symmetric in-batch-negative InfoNCE over
(query, document) pairs, jitted over a 2-D ``(dp, tp)`` mesh —

* ``dp``: batch sharding (queries/docs split across data-parallel groups;
  gradients all-reduced by XLA from the sharded loss),
* ``tp``: tensor parallelism — Dense/DenseGeneral kernels shard their
  output-feature axis, embedding tables shard the vocab axis; XLA
  inserts the all-gathers/reduce-scatters over ICI.

In-batch negatives use the GLOBAL batch (logits q @ d^T couple every
shard pair), so the dp axis also behaves like a contrastive
"negative-sharing" axis — XLA turns the cross-shard logit matmul into
ICI collectives automatically under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    temperature: float = 0.05
    warmup_steps: int = 100
    total_steps: int = 10_000
    max_grad_norm: float = 1.0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def late_interaction_scores(
    q_emb: jax.Array, q_mask: jax.Array,
    d_emb: jax.Array, d_mask: jax.Array,
) -> jax.Array:
    """[B, C] late-interaction score matrix for training.

    The batched all-pairs form of ops/maxsim.py::maxsim_scores
    (mean over valid query tokens of max over valid doc tokens of
    cosine similarity) — every query scores every in-batch document,
    which under dp becomes the cross-shard negative coupling XLA turns
    into ICI collectives."""
    def _norm(x):
        # clamp INSIDE the sqrt: padded token rows are exactly zero
        # (ColBERTEncoder masks them), and d/ds sqrt(s) at s=0 is inf —
        # inf * 0 = NaN would poison every gradient. max() before the
        # sqrt routes the zero branch's gradient through the constant.
        s = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                    keepdims=True)
        n = jnp.sqrt(jnp.maximum(s, 1e-24))
        return (x.astype(jnp.float32) / n).astype(x.dtype)

    q_emb, d_emb = _norm(q_emb), _norm(d_emb)
    sim = jnp.einsum(
        "bqd,cld->bcql", q_emb, d_emb, preferred_element_type=jnp.float32
    )
    d_valid = d_mask.astype(bool)[None, :, None, :]  # [1, C, 1, Ld]
    sim = jnp.where(d_valid, sim, jnp.float32(-1e30))
    per_q = jnp.max(sim, axis=-1)  # [B, C, Lq]
    has_doc = jnp.any(d_mask.astype(bool), axis=-1)  # [C]
    q_valid = q_mask.astype(bool)[:, None, :]  # [B, 1, Lq]
    per_q = jnp.where(q_valid & has_doc[None, :, None], per_q, 0.0)
    nq = jnp.maximum(jnp.sum(q_mask.astype(jnp.float32), axis=-1), 1.0)
    return jnp.sum(per_q, axis=-1) / nq[:, None]


def colbert_info_nce_loss(
    q_emb: jax.Array, q_mask: jax.Array,
    d_emb: jax.Array, d_mask: jax.Array,
    temperature: float,
):
    """In-batch-negative InfoNCE over MaxSim scores (PyLate's training
    objective for models like GTE-ModernColBERT). One-directional —
    MaxSim is asymmetric, so only query->doc cross-entropy applies."""
    logits = late_interaction_scores(q_emb, q_mask, d_emb, d_mask) / temperature
    labels = jnp.arange(logits.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, acc


def info_nce_loss(q_emb: jax.Array, d_emb: jax.Array, temperature: float):
    """Symmetric in-batch-negative InfoNCE.

    q_emb, d_emb: [B, E] L2-normalized embeddings; pair i is positive.
    """
    logits = (
        jnp.einsum("be,ce->bc", q_emb, d_emb, preferred_element_type=jnp.float32)
        / temperature
    )
    labels = jnp.arange(logits.shape[0])
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_d = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (loss_q.mean() + loss_d.mean())
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, acc


# ---------------------------------------------------------------------------
# sharding rules
# ---------------------------------------------------------------------------


def param_partition_spec(path: tuple, value, tp_axis: str) -> P:
    """Tensor-parallel partitioning by param shape/name.

    * embedding tables [V, H] -> shard vocab on tp (row-parallel lookup)
    * Dense kernels [in, out] -> shard out on tp (column-parallel)
    * DenseGeneral attn kernels [in, h, hd] -> shard heads on tp
    * attn out kernels [h, hd, out] -> shard heads on tp (row-parallel)
    * 1-D scales/biases -> replicated
    """
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    ndim = value.ndim
    if "embedding" in joined:
        return P(tp_axis, None)
    if ndim == 3:  # attention DenseGeneral
        return P(None, tp_axis, None) if "o_proj" not in joined else P(tp_axis, None, None)
    if ndim == 2 and "kernel" in joined:
        return P(None, tp_axis)
    return P()


def make_param_shardings(params, mesh: Mesh, tp_axis: str = "tp"):
    def spec(path, v):
        s = param_partition_spec(path, v, tp_axis)
        # Don't shard axes that aren't divisible by the mesh axis size.
        tp = mesh.shape[tp_axis]
        fixed = []
        for dim, axis_name in zip(v.shape, tuple(s) + (None,) * (v.ndim - len(s))):
            if axis_name is not None and dim % tp != 0:
                axis_name = None
            fixed.append(axis_name)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(spec, params)


# ---------------------------------------------------------------------------
# train state + step
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Trainer:
    """Builds and runs the jitted sharded train step for a BiEncoder."""

    module: Any  # flax module: (input_ids, attn_mask) -> [B, E]
    cfg: TrainConfig
    mesh: Optional[Mesh] = None
    dp_axis: str = "dp"
    tp_axis: str = "tp"

    # Leading step args (between state and the 4 batch arrays) that are
    # mesh-REPLICATED rather than dp-sharded — e.g. the distiller's
    # frozen teacher params. Subclasses override.
    _N_REPL_ARGS = 0

    def __post_init__(self):
        self.optimizer = make_optimizer(self.cfg)
        self._step_fn = None
        # position -> (id(host_tree), placed_tree): replicated args are
        # device_put ONCE and reused while the caller passes the same
        # host object (re-uploading a ~100 MB teacher tree every step
        # would dominate step time on tunneled TPUs).
        self._repl_cache: dict = {}

    def init_state(self, rng, sample_ids, sample_mask):
        params = self.module.init(rng, sample_ids, sample_mask)["params"]
        if self.mesh is not None:
            shardings = make_param_shardings(params, self.mesh, self.tp_axis)
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, s), params, shardings
            )
        opt_state = self.optimizer.init(params)
        step = jnp.int32(0)
        if self.mesh is not None:
            # optax scalars (e.g. adam's count) come back on a single
            # device while mu/nu inherit the param shardings; commit
            # every non-mesh leaf as mesh-replicated so the whole state
            # has one consistent device set (checkpoint restore commits
            # placements, and jit refuses mixed device sets).
            repl = NamedSharding(self.mesh, P())

            def place(x):
                s = getattr(x, "sharding", None)
                if isinstance(s, NamedSharding) and s.mesh == self.mesh:
                    return x
                return jax.device_put(x, repl)

            opt_state = jax.tree.map(place, opt_state)
            step = jax.device_put(step, repl)
        return {"params": params, "opt_state": opt_state, "step": step}

    def _loss_fn(self, params, q_ids, q_mask, d_ids, d_mask):
        q_emb = self.module.apply({"params": params}, q_ids, q_mask)
        d_emb = self.module.apply({"params": params}, d_ids, d_mask)
        return info_nce_loss(q_emb, d_emb, self.cfg.temperature)

    def _train_step(self, state, *args):
        (loss, acc), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state["params"], *args
        )
        updates, opt_state = self.optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss, "accuracy": acc}

    def step_fn(self):
        """The jitted train step; replicated leading args (if any),
        then the 4 batch arrays sharded over dp."""
        if self._step_fn is not None:
            return self._step_fn
        if self.mesh is None:
            self._step_fn = jax.jit(self._train_step, donate_argnums=(0,))
        else:
            batch_sh = NamedSharding(self.mesh, P(self.dp_axis, None))
            repl = NamedSharding(self.mesh, P())
            self._step_fn = jax.jit(
                self._train_step,
                in_shardings=(None,)
                + (repl,) * self._N_REPL_ARGS
                + (batch_sh,) * 4,
                donate_argnums=(0,),
            )
        return self._step_fn

    def _place_repl(self, pos: int, tree):
        """Replicated-arg placement, cached while the caller keeps
        passing the same host object at this position."""
        key = id(tree)
        hit = self._repl_cache.get(pos)
        if hit is not None and hit[0] == key:
            return hit[1]
        if self.mesh is not None:
            placed = jax.device_put(tree, NamedSharding(self.mesh, P()))
        else:
            placed = jax.device_put(tree)
        self._repl_cache[pos] = (key, placed)
        return placed

    def train_step(self, state, *args):
        n = self._N_REPL_ARGS
        repl = tuple(self._place_repl(i, a) for i, a in enumerate(args[:n]))
        batch = args[n:]
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.dp_axis, None))
            batch = tuple(jax.device_put(x, sh) for x in batch)
        return self.step_fn()(state, *repl, *batch)


@dataclasses.dataclass
class CrossEncoderTrainer(Trainer):
    """Pointwise BCE trainer for the stage-3 cross-encoder family.

    Batches are pre-built joint pair rows — each (query, positive) pair
    contributes a label-1 row and a shifted in-batch negative
    (train/data.py::cross_pair_batch) a label-0 row. The module is the
    serving CrossEncoder (CLS -> classifier logits); completing the
    training story across all three funnel stages.

    train_step(state, ids, mask, types, labels): ids/mask/types are
    [B, L] int32, labels [B, 1] f32 (2-D so the dp batch sharding spec
    applies uniformly)."""

    def _loss_fn(self, params, ids, mask, types, labels):
        logits = self.module.apply({"params": params}, ids, mask, types)
        if logits.shape[-1] == 1:
            raw = logits[..., 0]
        else:  # multi-label heads: positive-class logit margin
            raw = logits[..., -1] - logits[..., 0]
        y = labels[..., 0].astype(jnp.float32)
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(raw, y))
        acc = jnp.mean((raw > 0).astype(jnp.float32) == y)
        return loss, acc


@dataclasses.dataclass
class ColBERTTrainer(Trainer):
    """Late-interaction contrastive trainer for a ColBERTEncoder: the
    module returns [B, L, D] token embeddings and the loss is MaxSim
    InfoNCE (late_interaction_scores). Extends the stage-1 training
    path to the stage-2 model family — the stack PyLate trains for the
    reference's GTE-ModernColBERT (src/stage2_rescorer.py defaults).
    Shares the dp/tp sharding rules, optimizer, and checkpointing."""

    def _loss_fn(self, params, q_ids, q_mask, d_ids, d_mask):
        q_emb = self.module.apply({"params": params}, q_ids, q_mask)
        d_emb = self.module.apply({"params": params}, d_ids, d_mask)
        return colbert_info_nce_loss(
            q_emb, q_mask, d_emb, d_mask, self.cfg.temperature
        )

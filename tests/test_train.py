import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tristage_rag_tpu.models.config import PoolingConfig
from tristage_rag_tpu.models.heads import BiEncoder
from tristage_rag_tpu.models.registry import encoder_config
from tristage_rag_tpu.train.contrastive import (
    TrainConfig,
    Trainer,
    info_nce_loss,
)


def _toy_batch(rng, b=8, l=12, vocab=1024):
    q = rng.integers(4, vocab, size=(b, l)).astype(np.int32)
    # positives share most tokens with their query
    d = q.copy()
    d[:, ::3] = rng.integers(4, vocab, size=d[:, ::3].shape)
    mask = np.ones((b, l), np.int32)
    return jnp.asarray(q), jnp.asarray(mask), jnp.asarray(d), jnp.asarray(mask)


def test_info_nce_perfect_alignment():
    e = np.eye(4, 8, dtype=np.float32)
    loss, acc = info_nce_loss(jnp.asarray(e), jnp.asarray(e), temperature=0.05)
    assert float(acc) == 1.0
    assert float(loss) < 1e-3


def test_info_nce_random():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((6, 8)).astype(np.float32)
    d = rng.standard_normal((6, 8)).astype(np.float32)
    loss, acc = info_nce_loss(jnp.asarray(q), jnp.asarray(d), temperature=1.0)
    assert np.isfinite(float(loss))


def test_training_reduces_loss():
    cfg = encoder_config("tiny-gemma").replace(dtype="float32", num_layers=1)
    module = BiEncoder(cfg, PoolingConfig(pooling="mean"))
    trainer = Trainer(
        module, TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=30)
    )
    rng = np.random.default_rng(1)
    q, qm, d, dm = _toy_batch(rng, vocab=cfg.vocab_size)
    state = trainer.init_state(jax.random.PRNGKey(0), q, qm)
    losses = []
    for _ in range(12):
        state, m = trainer.train_step(state, q, qm, d, dm)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state["step"]) == 12


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_training_matches_single_device():
    from jax.sharding import Mesh

    cfg = encoder_config("tiny-gemma").replace(dtype="float32", num_layers=1)
    module = BiEncoder(cfg, PoolingConfig(pooling="mean", projection_dims=(32,)))
    rng = np.random.default_rng(2)
    q, qm, d, dm = _toy_batch(rng, b=8, vocab=cfg.vocab_size)

    t_single = Trainer(module, TrainConfig())
    s0 = t_single.init_state(jax.random.PRNGKey(0), q, qm)
    _, m_single = t_single.train_step(s0, q, qm, d, dm)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
    t_mesh = Trainer(module, TrainConfig(), mesh=mesh)
    s1 = t_mesh.init_state(jax.random.PRNGKey(0), q, qm)
    _, m_mesh = t_mesh.train_step(s1, q, qm, d, dm)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_mesh["loss"]), rtol=1e-4
    )


# ---------------------------------------------------------------------------
# ColBERT (late-interaction) training — train/contrastive.py::ColBERTTrainer
# ---------------------------------------------------------------------------


def test_late_interaction_scores_match_serving_scorer():
    """The training score matrix's row for one query must equal the
    serving scorer (ops/maxsim.py, method='maxsim') on the same
    query/candidates — training optimizes the metric serving uses."""
    from tristage_rag_tpu.ops.maxsim import maxsim_scores
    from tristage_rag_tpu.train.contrastive import late_interaction_scores

    rng = np.random.default_rng(3)
    B, C, Lq, Ld, D = 3, 5, 6, 9, 16
    q = rng.standard_normal((B, Lq, D)).astype(np.float32)
    d = rng.standard_normal((C, Ld, D)).astype(np.float32)
    qm = np.ones((B, Lq), np.int32)
    qm[1, 4:] = 0
    dm = np.ones((C, Ld), np.int32)
    dm[2, 5:] = 0
    dm[4, :] = 0  # fully-padded doc
    got = np.asarray(late_interaction_scores(
        jnp.asarray(q), jnp.asarray(qm), jnp.asarray(d), jnp.asarray(dm)
    ))
    for b in range(B):
        ref = np.asarray(maxsim_scores(
            jnp.asarray(q[b]), jnp.asarray(qm[b]),
            jnp.asarray(d), jnp.asarray(dm), method="maxsim",
        ))
        np.testing.assert_allclose(got[b], ref, rtol=1e-5, atol=1e-6)


def test_colbert_loss_perfect_alignment():
    from tristage_rag_tpu.train.contrastive import colbert_info_nce_loss

    # orthogonal single-token docs: query i matches doc i exactly
    e = np.eye(4, 8, dtype=np.float32)[:, None, :]  # [4, 1, 8]
    m = np.ones((4, 1), np.int32)
    loss, acc = colbert_info_nce_loss(
        jnp.asarray(e), jnp.asarray(m), jnp.asarray(e), jnp.asarray(m),
        temperature=0.05,
    )
    assert float(acc) == 1.0
    assert float(loss) < 1e-3


def test_colbert_gradients_finite_with_padded_tokens():
    """ColBERTEncoder zeroes padded token rows; the loss's normalize
    must clamp INSIDE the sqrt or d/ds sqrt(s)|_{s=0} = inf turns every
    gradient NaN after one step (round-3 regression: training diverged
    to nan at step 2 on any batch containing padding)."""
    from tristage_rag_tpu.models.config import ColBERTConfig
    from tristage_rag_tpu.models.heads import ColBERTEncoder
    from tristage_rag_tpu.train.contrastive import ColBERTTrainer

    cfg = encoder_config("tiny-modernbert").replace(
        dtype="float32", num_layers=1
    )
    module = ColBERTEncoder(cfg, ColBERTConfig(output_dim=16))
    trainer = ColBERTTrainer(
        module, TrainConfig(learning_rate=1e-3, warmup_steps=1,
                            total_steps=10)
    )
    rng = np.random.default_rng(6)
    q, qm, d, dm = _toy_batch(rng, vocab=cfg.vocab_size)
    qm = np.asarray(qm).copy()
    dm = np.asarray(dm).copy()
    qm[:, 6:] = 0  # ragged padding — zeroed token rows
    dm[:, 8:] = 0
    qm, dm = jnp.asarray(qm), jnp.asarray(dm)
    state = trainer.init_state(jax.random.PRNGKey(0), q, qm)
    for _ in range(3):
        state, m = trainer.train_step(state, q, qm, d, dm)
        assert np.isfinite(float(m["loss"])), "NaN loss with padding"


def test_colbert_training_reduces_loss():
    from tristage_rag_tpu.models.config import ColBERTConfig
    from tristage_rag_tpu.models.heads import ColBERTEncoder
    from tristage_rag_tpu.train.contrastive import ColBERTTrainer

    cfg = encoder_config("tiny-modernbert").replace(
        dtype="float32", num_layers=1
    )
    module = ColBERTEncoder(cfg, ColBERTConfig(output_dim=16))
    trainer = ColBERTTrainer(
        module, TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=30)
    )
    rng = np.random.default_rng(4)
    q, qm, d, dm = _toy_batch(rng, vocab=cfg.vocab_size)
    state = trainer.init_state(jax.random.PRNGKey(0), q, qm)
    losses = []
    for _ in range(12):
        state, m = trainer.train_step(state, q, qm, d, dm)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state["step"]) == 12


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_colbert_sharded_training_matches_single_device():
    from jax.sharding import Mesh

    from tristage_rag_tpu.models.config import ColBERTConfig
    from tristage_rag_tpu.models.heads import ColBERTEncoder
    from tristage_rag_tpu.train.contrastive import ColBERTTrainer

    cfg = encoder_config("tiny-modernbert").replace(
        dtype="float32", num_layers=1
    )
    module = ColBERTEncoder(cfg, ColBERTConfig(output_dim=16))
    rng = np.random.default_rng(5)
    q, qm, d, dm = _toy_batch(rng, b=8, vocab=cfg.vocab_size)

    t_single = ColBERTTrainer(module, TrainConfig())
    s0 = t_single.init_state(jax.random.PRNGKey(0), q, qm)
    _, m_single = t_single.train_step(s0, q, qm, d, dm)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
    t_mesh = ColBERTTrainer(module, TrainConfig(), mesh=mesh)
    s1 = t_mesh.init_state(jax.random.PRNGKey(0), q, qm)
    _, m_mesh = t_mesh.train_step(s1, q, qm, d, dm)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_mesh["loss"]), rtol=1e-4
    )


# ---------------------------------------------------------------------------
# Cross-encoder (stage-3) training — train/contrastive.py::CrossEncoderTrainer
# ---------------------------------------------------------------------------


def _cross_toy_batch(rng, b=8, l=24, vocab=1024):
    from tristage_rag_tpu.models.tokenizer import HashTokenizer
    from tristage_rag_tpu.train.data import cross_pair_batch

    tok = HashTokenizer(vocab_size=vocab)
    queries = [f"query topic {i} alpha beta" for i in range(b)]
    positives = [f"document topic {i} alpha beta gamma delta" for i in range(b)]
    cb = cross_pair_batch(tok, queries, positives, max_length=l)
    return cb


def test_cross_pair_batch_layout():
    cb = _cross_toy_batch(np.random.default_rng(0), b=4)
    assert cb.ids.shape[0] == 8 and cb.labels.shape == (8, 1)
    assert cb.labels[:4].sum() == 4.0 and cb.labels[4:].sum() == 0.0
    # negative rows pair query i with positive i+1 — different content
    assert not np.array_equal(cb.ids[0], cb.ids[4])


def test_cross_training_reduces_loss():
    from tristage_rag_tpu.models.config import CrossEncoderConfig
    from tristage_rag_tpu.models.heads import CrossEncoder
    from tristage_rag_tpu.train.contrastive import CrossEncoderTrainer

    cfg = encoder_config("tiny-bert").replace(dtype="float32", num_layers=1)
    module = CrossEncoder(cfg, CrossEncoderConfig(num_labels=1))
    trainer = CrossEncoderTrainer(
        module, TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=30)
    )
    cb = _cross_toy_batch(np.random.default_rng(1), vocab=cfg.vocab_size)
    ids, mask = jnp.asarray(cb.ids), jnp.asarray(cb.mask)
    types, labels = jnp.asarray(cb.types), jnp.asarray(cb.labels)
    state = trainer.init_state(jax.random.PRNGKey(0), ids, mask)
    losses = []
    for _ in range(15):
        state, m = trainer.train_step(state, ids, mask, types, labels)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cross_sharded_training_matches_single_device():
    from jax.sharding import Mesh

    from tristage_rag_tpu.models.config import CrossEncoderConfig
    from tristage_rag_tpu.models.heads import CrossEncoder
    from tristage_rag_tpu.train.contrastive import CrossEncoderTrainer

    cfg = encoder_config("tiny-bert").replace(dtype="float32", num_layers=1)
    module = CrossEncoder(cfg, CrossEncoderConfig(num_labels=1))
    cb = _cross_toy_batch(np.random.default_rng(2), b=8, vocab=cfg.vocab_size)
    ids, mask = jnp.asarray(cb.ids), jnp.asarray(cb.mask)
    types, labels = jnp.asarray(cb.types), jnp.asarray(cb.labels)

    t_single = CrossEncoderTrainer(module, TrainConfig())
    s0 = t_single.init_state(jax.random.PRNGKey(0), ids, mask)
    _, m_single = t_single.train_step(s0, ids, mask, types, labels)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
    t_mesh = CrossEncoderTrainer(module, TrainConfig(), mesh=mesh)
    s1 = t_mesh.init_state(jax.random.PRNGKey(0), ids, mask)
    _, m_mesh = t_mesh.train_step(s1, ids, mask, types, labels)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_mesh["loss"]), rtol=1e-4
    )

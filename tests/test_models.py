import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tristage_rag_tpu.models.config import (
    ColBERTConfig,
    CrossEncoderConfig,
    PoolingConfig,
)
from tristage_rag_tpu.models.heads import apply_score_activation, pool
from tristage_rag_tpu.models.registry import encoder_config
from tristage_rag_tpu.models.runtime import EncoderRuntime
from tristage_rag_tpu.models.tokenizer import (
    Batch,
    HashTokenizer,
    WordPieceTokenizer,
    pick_bucket,
)


class TestTokenizers:
    def test_hash_deterministic(self):
        t = HashTokenizer(vocab_size=1024)
        a = t.tokenize_to_ids("Hello, TPU world!")
        b = t.tokenize_to_ids("Hello, TPU world!")
        assert a == b and len(a) == 5  # hello , tpu world !
        assert all(4 <= i < 1024 for i in a)

    def test_encode_batch_padding(self):
        t = HashTokenizer(vocab_size=1024)
        batch = t.encode_batch(["one two", "one two three four five six"], 64)
        assert batch.input_ids.shape == batch.attn_mask.shape
        assert batch.input_ids.shape[1] in (16, 32, 64)
        assert batch.attn_mask[0].sum() == 4  # cls + 2 + sep
        assert batch.attn_mask[1].sum() == 8

    def test_encode_pairs_types(self):
        t = HashTokenizer(vocab_size=1024)
        batch = t.encode_pairs([("short query", "longer document text here")], 64)
        row_types = batch.token_type_ids[0][batch.attn_mask[0].astype(bool)]
        assert row_types[0] == 0 and row_types[-1] == 1

    def test_pair_truncation(self):
        t = HashTokenizer(vocab_size=1024)
        long = " ".join(["word"] * 100)
        batch = t.encode_pairs([(long, long)], 32)
        assert batch.input_ids.shape[1] == 32
        assert batch.attn_mask[0].sum() == 32

    def test_wordpiece(self):
        vocab = {
            "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
            "un": 4, "##aff": 5, "##able": 6, "hello": 7,
        }
        t = WordPieceTokenizer(vocab)
        assert t.tokenize_to_ids("hello unaffable") == [7, 4, 5, 6]
        assert t.tokenize_to_ids("xyz") == [1]

    def test_bucket(self):
        assert pick_bucket(10, (16, 32), 512) == 16
        assert pick_bucket(17, (16, 32), 512) == 32
        assert pick_bucket(600, (16, 32), 512) == 512


class TestPooling:
    def test_mean_pool_masks_padding(self):
        h = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
        m = jnp.asarray([[1, 1, 0, 0]])
        out = np.asarray(pool(h, m, "mean"))
        np.testing.assert_allclose(out[0], np.arange(24).reshape(4, 6)[:2].mean(0))

    def test_cls_max(self):
        h = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4)).astype(np.float32))
        m = jnp.ones((2, 3))
        assert np.asarray(pool(h, m, "cls")).shape == (2, 4)
        assert np.asarray(pool(h, m, "max")).shape == (2, 4)

    def test_score_activation(self):
        logits1 = jnp.asarray([[2.0], [-2.0]])
        s = np.asarray(apply_score_activation(logits1, "sigmoid"))
        assert 0 < s[1] < 0.5 < s[0] < 1
        logits2 = jnp.asarray([[1.0, 3.0]])
        s2 = np.asarray(apply_score_activation(logits2, "softmax"))
        assert s2.shape == (1,) and 0.5 < s2[0] < 1


@pytest.mark.parametrize("name", ["tiny-bert", "tiny-gemma", "tiny-modernbert"])
def test_encoder_forward_shapes(name):
    cfg = encoder_config(name).replace(dtype="float32")
    rt = EncoderRuntime("bi", cfg, PoolingConfig(pooling="mean", projection_dims=(16,)))
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    out = rt.encode_texts(["hello world", "second text here"], tok, max_length=32)
    assert out.shape == (2, 16)
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_encoder_padding_invariance():
    """Same text must embed identically regardless of batch padding."""
    cfg = encoder_config("tiny-bert").replace(dtype="float32")
    rt = EncoderRuntime("bi", cfg, PoolingConfig(pooling="mean"))
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    solo = rt.encode_texts(["the same text"], tok, max_length=32)
    batched = rt.encode_texts(
        ["the same text", "another much longer text that pads the batch out"],
        tok,
        max_length=32,
    )
    np.testing.assert_allclose(solo[0], batched[0], atol=2e-5)


def test_colbert_runtime_masks():
    cfg = encoder_config("tiny-modernbert").replace(dtype="float32")
    rt = EncoderRuntime("colbert", cfg, ColBERTConfig(output_dim=16))
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb, mask = rt.encode_token_embeddings(["a b c", "a"], tok, max_length=16)
    assert emb.shape == (2, 16, 16) and mask.shape == (2, 16)
    # padded positions zeroed
    assert np.abs(emb[1][mask[1] == 0]).max() == 0.0
    # valid positions unit-norm
    valid = emb[0][mask[0] == 1]
    np.testing.assert_allclose(np.linalg.norm(valid, axis=-1), 1.0, atol=1e-5)


def test_colbert_no_projection_uses_raw_hidden():
    """project=False scores tokens at the encoder hidden size —
    reference-faithful raw last-hidden-state MaxSim
    (src/stage2_rescorer.py:156-165), toggled by stage2_use_projection."""
    cfg = encoder_config("tiny-modernbert").replace(dtype="float32")
    rt = EncoderRuntime("colbert", cfg, ColBERTConfig(project=False))
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb, mask = rt.encode_token_embeddings(["a b c"], tok, max_length=16)
    assert emb.shape == (1, 16, cfg.hidden_size)
    valid = emb[0][mask[0] == 1]
    np.testing.assert_allclose(np.linalg.norm(valid, axis=-1), 1.0, atol=1e-5)
    # no projection params exist
    assert "colbert_proj" not in rt.params


def test_stage2_projection_toggle(tiny_config):
    import dataclasses

    from tristage_rag_tpu.engine.stage2 import ColBERTScorer

    on = ColBERTScorer(tiny_config)
    off = ColBERTScorer(
        dataclasses.replace(tiny_config, stage2_use_projection=False)
    )
    assert on.get_model_info()["use_projection"] is True
    assert off.get_model_info()["use_projection"] is False
    assert off.token_dim == off.runtime.cfg.hidden_size
    e_on, _ = on.encode_documents(["a document"])
    e_off, _ = off.encode_documents(["a document"])
    assert e_on.shape[-1] != e_off.shape[-1]


def test_cross_runtime_scores():
    cfg = encoder_config("tiny-bert").replace(dtype="float32")
    rt = EncoderRuntime("cross", cfg, CrossEncoderConfig())
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    s = rt.score_pairs([("q", "doc one"), ("q", "doc two")], tok, max_length=32)
    assert s.shape == (2,)
    assert ((0 <= s) & (s <= 1)).all()


def test_runtime_determinism():
    cfg = encoder_config("tiny-gemma").replace(dtype="float32")
    rt1 = EncoderRuntime("bi", cfg, PoolingConfig(), seed=7)
    rt2 = EncoderRuntime("bi", cfg, PoolingConfig(), seed=7)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    a = rt1.encode_texts(["determinism"], tok, max_length=16)
    b = rt2.encode_texts(["determinism"], tok, max_length=16)
    np.testing.assert_array_equal(a, b)


def test_embed_tables_precast_to_compute_dtype():
    """flax nn.Embed promotes the WHOLE table to the compute dtype on
    every apply; storing the table f32 under a bf16 runtime therefore
    costs a full-table convert_element_type per dispatch (measured
    1.9 ms — 28% of the fused funnel — for Gemma's 262k x 640 table).
    The runtime must pre-cast at placement, and the pre-cast must be
    bit-identical to the per-dispatch promote."""
    from flax.traverse_util import flatten_dict

    from tristage_rag_tpu.models.runtime import Batch

    cfg = encoder_config("tiny-bert").replace(dtype="bfloat16")
    rt = EncoderRuntime("cross", cfg, CrossEncoderConfig(), seed=7)
    flat = dict(flatten_dict(jax.device_get(rt.params)))
    embeds = {p: v.dtype for p, v in flat.items() if p[-1] == "embedding"}
    assert embeds and all(d == jnp.bfloat16 for d in embeds.values()), embeds
    # f32 runtimes stay untouched
    rt32 = EncoderRuntime(
        "cross", cfg.replace(dtype="float32"), CrossEncoderConfig(), seed=7
    )
    f32 = dict(flatten_dict(jax.device_get(rt32.params)))
    assert all(
        v.dtype == jnp.float32
        for p, v in f32.items()
        if p[-1] == "embedding"
    )
    # bit-identity vs the per-dispatch promote
    ids = np.array([[2, 5, 9, 1, 0, 0, 0, 0]], dtype=np.int32)
    b = Batch(
        input_ids=ids,
        attn_mask=np.array([[1, 1, 1, 1, 0, 0, 0, 0]], dtype=np.int32),
        token_type_ids=np.zeros_like(ids),
    )
    out = np.asarray(rt.forward(b), dtype=np.float32)
    orig = EncoderRuntime._precast_embed_tables
    EncoderRuntime._precast_embed_tables = lambda self, p: p
    try:
        rt_promote = EncoderRuntime("cross", cfg, CrossEncoderConfig(), seed=7)
        out_promote = np.asarray(rt_promote.forward(b), dtype=np.float32)
    finally:
        EncoderRuntime._precast_embed_tables = orig
    np.testing.assert_array_equal(out, out_promote)
    # load_params routes through the same placement
    rt.load_params(jax.device_get(rt_promote.params))
    flat = dict(flatten_dict(jax.device_get(rt.params)))
    assert all(
        v.dtype == jnp.bfloat16
        for p, v in flat.items()
        if p[-1] == "embedding"
    )


def test_pair_truncation_matches_transformers():
    """Empirical tie-break parity with BertTokenizerFast longest_first
    (equal lengths pop from the FIRST sequence)."""
    pytest.importorskip("transformers")
    import tempfile
    from pathlib import Path

    from transformers import BertTokenizerFast

    from tristage_rag_tpu.models.tokenizer import WordPieceTokenizer

    words = [f"w{i}" for i in range(300)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    vp = Path(tempfile.mkdtemp()) / "vocab.txt"
    vp.write_text("\n".join(vocab))
    hf = BertTokenizerFast(vocab_file=str(vp), do_lower_case=True)
    ours = WordPieceTokenizer({t: i for i, t in enumerate(vocab)})
    ours._native = None
    for ql, dl in ((130, 130), (200, 100), (100, 200), (256, 10), (128, 129)):
        q = " ".join(words[:ql])
        d = " ".join(words[:dl][::-1])
        hf_ids = hf(q, d, truncation="longest_first", max_length=256)["input_ids"]
        mine = ours.encode_pairs([(q, d)], 256)
        my_ids = mine.input_ids[0][: int(mine.attn_mask[0].sum())].tolist()
        assert my_ids == hf_ids, (ql, dl)


class TestPrefetched:
    """Double-buffered input pipeline (models/runtime.py::prefetched,
    VERDICT r2 next-6): tokenize-ahead thread feeding the device fill."""

    def test_order_and_completeness(self):
        from tristage_rag_tpu.models.runtime import prefetched

        assert list(prefetched(iter(range(100)))) == list(range(100))
        assert list(prefetched(iter([]))) == []

    def test_producer_exception_propagates(self):
        from tristage_rag_tpu.models.runtime import prefetched

        def boom():
            yield 1
            raise ValueError("boom")

        with pytest.raises(ValueError, match="boom"):
            list(prefetched(boom()))

    def test_early_close_does_not_leak_thread(self):
        import threading
        import time

        from tristage_rag_tpu.models.runtime import prefetched

        before = threading.active_count()
        g = prefetched(iter(range(1000)), depth=2)
        next(g)
        g.close()
        time.sleep(0.5)
        assert threading.active_count() <= before

    def test_encode_texts_unchanged_by_prefetch(self, tiny_config):
        """Prefetching must not change results — batches arrive in
        order with identical shapes."""
        import numpy as np

        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        s1 = Stage1Retriever(tiny_config)
        texts = [f"document number {i} about foxes" for i in range(11)]
        e1 = s1.encode(texts)
        e2 = s1.encode(texts)
        assert e1.shape[0] == 11
        np.testing.assert_array_equal(e1, e2)

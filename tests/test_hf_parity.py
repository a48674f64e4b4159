"""Numerical parity vs torch/transformers on synthesized tiny checkpoints.

Strategy (SURVEY.md §7 "ST semantic parity"): build a tiny random HF
model with torch, ``save_pretrained`` it, load through our
``hf_loader``, and compare forward outputs within float32 tolerance.
This validates the weight mapping AND the Flax architecture (RoPE
conventions, norm placement, GQA, sliding windows, gated MLP chunk
order) without downloading anything.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from tristage_rag_tpu.models.encoder import TextEncoder  # noqa: E402
from tristage_rag_tpu.models.hf_loader import (  # noqa: E402
    encoder_config_from_hf,
    load_checkpoint,
    read_config,
)

ATOL = 2e-4


def _forward_ours(cfg, params, ids, mask, types=None):
    enc = TextEncoder(cfg.replace(dtype="float32"))
    out = enc.apply(
        {"params": params},
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(types) if types is not None else None,
    )
    return np.asarray(out, dtype=np.float32)


def _inputs(vocab, b=2, l=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, size=(b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    mask[1, l - 3 :] = 0  # ragged batch
    return ids, mask


class TestBertParity:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("bert_ckpt")
        cfg = transformers.BertConfig(
            vocab_size=97,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
            type_vocab_size=2,
        )
        torch.manual_seed(0)
        model = transformers.BertForSequenceClassification(cfg)
        model.config.num_labels = 2
        model.eval()
        model.save_pretrained(d, safe_serialization=True)
        return d, model

    def test_encoder_hidden_states(self, ckpt):
        d, model = ckpt
        hf = read_config(d)
        cfg = encoder_config_from_hf(hf)
        from tristage_rag_tpu.models.config import CrossEncoderConfig

        cfg2, head, params = load_checkpoint(d, "cross", cfg, CrossEncoderConfig())
        ids, mask = _inputs(hf["vocab_size"])
        ours = _forward_ours(cfg2, params["encoder"], ids, mask)
        with torch.no_grad():
            theirs = model.bert(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        # only compare valid positions
        valid = mask.astype(bool)
        np.testing.assert_allclose(ours[valid], theirs[valid], atol=ATOL)

    def test_classifier_logits(self, ckpt):
        d, model = ckpt
        hf = read_config(d)
        from tristage_rag_tpu.models.config import CrossEncoderConfig
        from tristage_rag_tpu.models.heads import CrossEncoder

        cfg, head, params = load_checkpoint(d, "cross", None, CrossEncoderConfig())
        assert head.pooler_tanh and head.num_labels == 2
        ids, mask = _inputs(hf["vocab_size"])
        ce = CrossEncoder(cfg.replace(dtype="float32"), head)
        ours = np.asarray(
            ce.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        )
        with torch.no_grad():
            theirs = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).logits.numpy()
        np.testing.assert_allclose(ours, theirs, atol=ATOL)


class TestModernBertParity:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("modernbert_ckpt")
        cfg = transformers.ModernBertConfig(
            vocab_size=97,
            hidden_size=32,
            num_hidden_layers=3,
            num_attention_heads=4,
            intermediate_size=48,
            max_position_embeddings=64,
            local_attention=8,
            global_attn_every_n_layers=2,
            global_rope_theta=160000.0,
            local_rope_theta=10000.0,
            attn_implementation="eager",
            pad_token_id=0,
            bos_token_id=1,
            eos_token_id=2,
            cls_token_id=3,
            sep_token_id=4,
        )
        torch.manual_seed(1)
        model = transformers.ModernBertModel(cfg)
        model.eval()
        model.save_pretrained(d, safe_serialization=True)
        # synthesize a PyLate-style ColBERT Dense head
        torch.manual_seed(2)
        dense_w = torch.randn(16, 32) * 0.1
        sub = d / "1_Dense"
        sub.mkdir()
        from safetensors.torch import save_file

        save_file({"linear.weight": dense_w}, sub / "model.safetensors")
        (d / "modules.json").write_text(json.dumps([
            {"idx": 0, "name": "0", "path": "", "type": "pylate.models.ModernBERT"},
            {"idx": 1, "name": "1", "path": "1_Dense", "type": "pylate.models.Dense"},
        ]))
        return d, model, dense_w

    def test_token_embeddings(self, ckpt):
        d, model, dense_w = ckpt
        hf = read_config(d)
        from tristage_rag_tpu.models.config import ColBERTConfig

        cfg, head, params = load_checkpoint(d, "colbert", None, ColBERTConfig())
        assert head.output_dim == 16
        ids, mask = _inputs(hf["vocab_size"], l=14, seed=3)
        ours_hidden = _forward_ours(cfg, params["encoder"], ids, mask)
        with torch.no_grad():
            theirs = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        valid = mask.astype(bool)
        np.testing.assert_allclose(ours_hidden[valid], theirs[valid], atol=ATOL)

    def test_colbert_projection(self, ckpt):
        d, model, dense_w = ckpt
        hf = read_config(d)
        from tristage_rag_tpu.models.config import ColBERTConfig
        from tristage_rag_tpu.models.heads import ColBERTEncoder

        cfg, head, params = load_checkpoint(d, "colbert", None, ColBERTConfig())
        ids, mask = _inputs(hf["vocab_size"], l=10, seed=4)
        enc = ColBERTEncoder(cfg.replace(dtype="float32"), head)
        ours = np.asarray(
            enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        )
        with torch.no_grad():
            hid = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state
            proj = hid @ dense_w.T
            proj = torch.nn.functional.normalize(proj, dim=-1).numpy()
        valid = mask.astype(bool)
        np.testing.assert_allclose(ours[valid], proj[valid], atol=ATOL)


class TestGemma3Parity:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("gemma3_ckpt")
        cfg = transformers.Gemma3TextConfig(
            vocab_size=97,
            hidden_size=32,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=8,
            intermediate_size=48,
            max_position_embeddings=64,
            sliding_window=8,
            sliding_window_pattern=2,
            rope_theta=1_000_000.0,
            rope_local_base_freq=10_000.0,
            query_pre_attn_scalar=8,
            use_bidirectional_attention=True,
            attn_implementation="eager",
        )
        torch.manual_seed(5)
        model = transformers.Gemma3TextModel(cfg)
        model.eval()
        model.save_pretrained(d, safe_serialization=True)
        # ST-style sentence-embedding head: mean pooling + two Dense
        from safetensors.torch import save_file

        torch.manual_seed(6)
        w2 = torch.randn(24, 32) * 0.1
        w3 = torch.randn(16, 24) * 0.1
        for name, w in (("2_Dense", w2), ("3_Dense", w3)):
            sub = d / name
            sub.mkdir()
            save_file({"linear.weight": w}, sub / "model.safetensors")
        pool_dir = d / "1_Pooling"
        pool_dir.mkdir()
        (pool_dir / "config.json").write_text(
            json.dumps({"pooling_mode_mean_tokens": True})
        )
        (d / "modules.json").write_text(json.dumps([
            {"idx": 0, "name": "0", "path": "", "type": "sentence_transformers.models.Transformer"},
            {"idx": 1, "name": "1", "path": "1_Pooling", "type": "sentence_transformers.models.Pooling"},
            {"idx": 2, "name": "2", "path": "2_Dense", "type": "sentence_transformers.models.Dense"},
            {"idx": 3, "name": "3", "path": "3_Dense", "type": "sentence_transformers.models.Dense"},
        ]))
        return d, w2, w3

    def test_hidden_states(self, ckpt):
        d, w2, w3 = ckpt
        hf = read_config(d)
        from tristage_rag_tpu.models.config import PoolingConfig

        cfg, head, params = load_checkpoint(d, "bi", None, PoolingConfig())
        assert not cfg.causal
        model = transformers.Gemma3TextModel.from_pretrained(
            d, attn_implementation="eager", torch_dtype=torch.float32
        ).eval()
        ids, mask = _inputs(hf["vocab_size"], l=12, seed=7)
        ours = _forward_ours(cfg, params["encoder"], ids, mask)
        with torch.no_grad():
            theirs = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        valid = mask.astype(bool)
        np.testing.assert_allclose(ours[valid], theirs[valid], atol=1e-4)

    def test_sentence_embedding_head(self, ckpt):
        d, w2, w3 = ckpt
        hf = read_config(d)
        from tristage_rag_tpu.models.config import PoolingConfig
        from tristage_rag_tpu.models.heads import BiEncoder

        cfg, head, params = load_checkpoint(d, "bi", None, PoolingConfig())
        assert head.pooling == "mean"
        assert head.projection_dims == (24, 16)
        model = transformers.Gemma3TextModel.from_pretrained(
            d, attn_implementation="eager", torch_dtype=torch.float32
        ).eval()
        ids, mask = _inputs(hf["vocab_size"], l=10, seed=8)
        be = BiEncoder(cfg.replace(dtype="float32"), head)
        ours = np.asarray(
            be.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        )
        with torch.no_grad():
            hid = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state
            m = torch.tensor(mask, dtype=torch.float32).unsqueeze(-1)
            pooled = (hid * m).sum(1) / m.sum(1)
            emb = pooled @ w2.T @ w3.T
            emb = torch.nn.functional.normalize(emb, dim=-1).numpy()
        np.testing.assert_allclose(ours, emb, atol=1e-4)


class TestSTDenseBiasParity:
    def test_biased_dense_module_loads_and_matches(self, tmp_path):
        """sentence-transformers Dense defaults to bias=True; the loader
        must carry the bias (code-review r2: it was silently dropped,
        offsetting every embedding)."""
        import numpy as np

        pytest.importorskip("sentence_transformers")
        torch = pytest.importorskip("torch")
        from sentence_transformers import SentenceTransformer
        from sentence_transformers import models as st_models
        from transformers import BertConfig, BertModel, BertTokenizerFast

        words = ["alpha", "beta", "gamma", "delta"]
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
        vpath = tmp_path / "vocab.txt"
        vpath.write_text("\n".join(vocab))
        tok = BertTokenizerFast(vocab_file=str(vpath), do_lower_case=True)
        torch.manual_seed(0)
        base = tmp_path / "base"
        BertModel(BertConfig(
            vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=2,
        )).eval().save_pretrained(base, safe_serialization=True)
        tok.save_pretrained(base)
        model = SentenceTransformer(modules=[
            st_models.Transformer(str(base), max_seq_length=32),
            st_models.Pooling(32, pooling_mode="mean"),
            st_models.Dense(32, 16, bias=True,
                            activation_function=torch.nn.Identity()),
            st_models.Normalize(),
        ], device="cpu")
        ckpt = tmp_path / "st-biased"
        model.save(str(ckpt))

        from tristage_rag_tpu.engine.factory import build_runtime

        runtime, tokenizer = build_runtime(
            "bi", "st-biased", str(tmp_path), compute_dtype="float32"
        )
        assert runtime.weights_loaded
        assert runtime.head_cfg.projection_bias == (True,)
        assert "bias" in runtime.params["proj_0"]
        texts = ["alpha beta gamma", "delta alpha"]
        ours = runtime.encode_texts(texts, tokenizer, max_length=32)
        theirs = model.encode(texts, convert_to_numpy=True)
        np.testing.assert_allclose(ours, theirs, atol=2e-4)

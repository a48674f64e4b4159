"""Full-size architecture load parity vs torch (VERDICT r3 next-2b).

torch models at the REAL checkpoint hyperparameters — 24-layer
embeddinggemma Gemma3 (262k vocab, GQA 3:1, sliding-window 512 pattern
6, dual rope thetas), 22-layer GTE-ModernColBERT ModernBERT (+PyLate
1_Dense 128), 6-layer ms-marco-MiniLM cross-encoder — with RANDOM
weights, saved in the exact HF layouts the real checkpoints ship
(manifests: /root/reference/benchmark/download_models.py:44-85), then
loaded through models/hf_loader and verified for

  (a) checkpoint-config derivation == registry fallback (drift guard),
  (b) param-tree structure + leaf shapes == our module init,
  (c) forward numerics vs torch at full size.

With these green, the first REAL weight load is a file copy into
./models/<basename>, not a debugging session (the remaining egress
gap is weights + dataset bytes only).
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tristage_rag_tpu.models import registry  # noqa: E402
from tristage_rag_tpu.models.hf_loader import (  # noqa: E402
    encoder_config_from_hf,
    load_checkpoint,
    read_config,
)


def _inputs(vocab, b=2, l=8, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, size=(b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    mask[1, l - 2:] = 0
    return ids, mask


def _shape_tree(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def _assert_same_arch(derived, fallback, *, ignore=()):
    """Every architecture field of the checkpoint-derived config must
    equal the registry fallback (else random-weight runs benchmark a
    different model than real-weight runs). Per-part bias overrides
    (attention_bias/mlp_bias, None -> use_bias) compare through their
    RESOLVED properties — None and an explicit equal value are the
    same architecture."""
    resolved = {"attention_bias": "attn_bias", "mlp_bias": "mlp_bias_flag"}
    for f in dataclasses.fields(type(derived)):
        if f.name in ("dtype",) + tuple(ignore):
            continue
        attr = resolved.get(f.name, f.name)
        dv, fv = getattr(derived, attr), getattr(fallback, attr)
        assert dv == fv, (
            f"registry drift on {attr}: checkpoint-derived={dv!r}, "
            f"registry fallback={fv!r}"
        )


class TestEmbeddingGemmaFullSize:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("gemma_full")
        cfg = transformers.Gemma3TextConfig(
            vocab_size=262144,
            hidden_size=768,
            num_hidden_layers=24,
            num_attention_heads=3,
            num_key_value_heads=1,
            head_dim=256,
            intermediate_size=1152,
            max_position_embeddings=2048,
            sliding_window=512,
            sliding_window_pattern=6,
            rope_theta=1_000_000.0,
            rope_local_base_freq=10_000.0,
            query_pre_attn_scalar=256,
            rms_norm_eps=1e-6,
            use_bidirectional_attention=True,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = transformers.Gemma3TextModel(cfg).eval()
        model.save_pretrained(d, safe_serialization=True)
        # save_pretrained writes the TRANSFORMED window (bidirectional
        # models get sliding_window//2+1 at config init); the real hub
        # file carries the RAW value. Patch the saved config back to
        # the hub convention so both stacks load the same bytes the
        # real checkpoint ships, then reload torch from it (its load
        # path re-applies the transform, exactly as on the real file).
        cfg_file = d / "config.json"
        saved = json.loads(cfg_file.read_text())
        saved["sliding_window"] = 512
        saved["layer_types"] = (
            ["sliding_attention"] * 5 + ["full_attention"]
        ) * 4
        cfg_file.write_text(json.dumps(saved))
        model = transformers.Gemma3TextModel.from_pretrained(
            d, attn_implementation="eager", torch_dtype=torch.float32
        ).eval()
        # the ST sentence-embedding head at real dims: 768 -> 3072 -> 768
        from safetensors.torch import save_file

        torch.manual_seed(1)
        w2 = (torch.randn(3072, 768) * 0.02)
        w3 = (torch.randn(768, 3072) * 0.02)
        for name, w in (("2_Dense", w2), ("3_Dense", w3)):
            sub = d / name
            sub.mkdir()
            save_file({"linear.weight": w}, sub / "model.safetensors")
        pool = d / "1_Pooling"
        pool.mkdir()
        (pool / "config.json").write_text(
            json.dumps({"pooling_mode_mean_tokens": True})
        )
        (d / "modules.json").write_text(json.dumps([
            {"idx": 0, "name": "0", "path": "",
             "type": "sentence_transformers.models.Transformer"},
            {"idx": 1, "name": "1", "path": "1_Pooling",
             "type": "sentence_transformers.models.Pooling"},
            {"idx": 2, "name": "2", "path": "2_Dense",
             "type": "sentence_transformers.models.Dense"},
            {"idx": 3, "name": "3", "path": "3_Dense",
             "type": "sentence_transformers.models.Dense"},
        ]))
        return d, model, w2, w3

    def test_registry_matches_checkpoint_config(self, ckpt):
        d, *_ = ckpt
        derived = encoder_config_from_hf(read_config(d))
        fb = registry.encoder_config("embeddinggemma-300m")
        _assert_same_arch(derived, fb)
        for i in range(derived.num_layers):
            assert derived.is_global_layer(i) == fb.is_global_layer(i)

    def test_param_shapes_match_module_init(self, ckpt):
        d, *_ = ckpt
        from tristage_rag_tpu.models.config import PoolingConfig
        from tristage_rag_tpu.models.heads import BiEncoder

        cfg, head, params = load_checkpoint(d, "bi", None, PoolingConfig())
        assert head.pooling == "mean"
        assert head.projection_dims == (3072, 768)
        module = BiEncoder(cfg.replace(dtype="float32"), head)
        ids = jnp.zeros((1, 4), jnp.int32)
        init_shapes = jax.eval_shape(
            module.init, jax.random.PRNGKey(0), ids, jnp.ones_like(ids)
        )["params"]
        assert _shape_tree(params) == _shape_tree(init_shapes)

    def test_forward_parity(self, ckpt):
        d, model, w2, w3 = ckpt
        from tristage_rag_tpu.models.config import PoolingConfig
        from tristage_rag_tpu.models.heads import BiEncoder

        cfg, head, params = load_checkpoint(d, "bi", None, PoolingConfig())
        assert not cfg.causal
        ids, mask = _inputs(262144, seed=2)
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
        np.testing.assert_allclose(ours, emb, atol=2e-3)


class TestGTEModernColBERTFullSize:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("mcb_full")
        cfg = transformers.ModernBertConfig(
            vocab_size=50368,
            hidden_size=768,
            num_hidden_layers=22,
            num_attention_heads=12,
            intermediate_size=1152,
            max_position_embeddings=8192,
            local_attention=128,
            global_attn_every_n_layers=3,
            global_rope_theta=160000.0,
            local_rope_theta=10000.0,
            norm_eps=1e-5,
            attn_implementation="eager",
            pad_token_id=50283,
            bos_token_id=50281,
            eos_token_id=50282,
            cls_token_id=50281,
            sep_token_id=50282,
        )
        torch.manual_seed(3)
        model = transformers.ModernBertModel(cfg).eval()
        model.save_pretrained(d, safe_serialization=True)
        from safetensors.torch import save_file

        torch.manual_seed(4)
        dense_w = torch.randn(128, 768) * 0.02  # PyLate head at real dim
        sub = d / "1_Dense"
        sub.mkdir()
        save_file({"linear.weight": dense_w}, sub / "model.safetensors")
        (d / "modules.json").write_text(json.dumps([
            {"idx": 0, "name": "0", "path": "",
             "type": "pylate.models.ModernBERT"},
            {"idx": 1, "name": "1", "path": "1_Dense",
             "type": "pylate.models.Dense"},
        ]))
        return d, model, dense_w

    def test_registry_matches_checkpoint_config(self, ckpt):
        d, *_ = ckpt
        derived = encoder_config_from_hf(read_config(d))
        _assert_same_arch(
            derived, registry.encoder_config("gte-moderncolbert"),
            # embedding_norm/type_vocab_size: hf path sets them
            # explicitly; registry relies on family defaults inside the
            # module — compare directly:
            ignore=("embedding_norm", "type_vocab_size"),
        )

    def test_param_shapes_match_module_init(self, ckpt):
        d, *_ = ckpt
        from tristage_rag_tpu.models.config import ColBERTConfig
        from tristage_rag_tpu.models.heads import ColBERTEncoder

        cfg, head, params = load_checkpoint(d, "colbert", None, ColBERTConfig())
        assert head.output_dim == 128
        module = ColBERTEncoder(cfg.replace(dtype="float32"), head)
        ids = jnp.zeros((1, 4), jnp.int32)
        init_shapes = jax.eval_shape(
            module.init, jax.random.PRNGKey(0), ids, jnp.ones_like(ids)
        )["params"]
        assert _shape_tree(params) == _shape_tree(init_shapes)

    def test_forward_parity(self, ckpt):
        d, model, dense_w = ckpt
        from tristage_rag_tpu.models.config import ColBERTConfig
        from tristage_rag_tpu.models.heads import ColBERTEncoder

        cfg, head, params = load_checkpoint(d, "colbert", None, ColBERTConfig())
        ids, mask = _inputs(50368, seed=5)
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
        np.testing.assert_allclose(ours[valid], proj[valid], atol=1e-3)


class TestMiniLMCrossFullSize:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("minilm_full")
        cfg = transformers.BertConfig(
            vocab_size=30522,
            hidden_size=384,
            num_hidden_layers=6,
            num_attention_heads=12,
            intermediate_size=1536,
            max_position_embeddings=512,
            type_vocab_size=2,
            num_labels=1,
        )
        torch.manual_seed(6)
        model = transformers.BertForSequenceClassification(cfg).eval()
        model.save_pretrained(d, safe_serialization=True)
        return d, model

    def test_registry_matches_checkpoint_config(self, ckpt):
        d, _ = ckpt
        derived = encoder_config_from_hf(read_config(d))
        _assert_same_arch(
            derived, registry.encoder_config("minilm-l6-cross"),
        )

    def test_param_shapes_match_module_init(self, ckpt):
        d, _ = ckpt
        from tristage_rag_tpu.models.config import CrossEncoderConfig
        from tristage_rag_tpu.models.heads import CrossEncoder

        cfg, head, params = load_checkpoint(d, "cross", None, CrossEncoderConfig())
        assert head.num_labels == 1 and head.pooler_tanh
        module = CrossEncoder(cfg.replace(dtype="float32"), head)
        ids = jnp.zeros((1, 4), jnp.int32)
        init_shapes = jax.eval_shape(
            module.init, jax.random.PRNGKey(0), ids, jnp.ones_like(ids)
        )["params"]
        assert _shape_tree(params) == _shape_tree(init_shapes)

    def test_forward_parity(self, ckpt):
        d, model = ckpt
        from tristage_rag_tpu.models.config import CrossEncoderConfig
        from tristage_rag_tpu.models.heads import CrossEncoder

        cfg, head, params = load_checkpoint(d, "cross", None, CrossEncoderConfig())
        ids, mask = _inputs(30522, seed=7)
        ce = CrossEncoder(cfg.replace(dtype="float32"), head)
        ours = np.asarray(
            ce.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        )
        with torch.no_grad():
            theirs = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).logits.numpy()
        np.testing.assert_allclose(ours, theirs, atol=5e-4)


class TestPreflightOnSynthesizedAssets:
    """run_benchmark --preflight must go green on a fully-stubbed asset
    tree and report blocking gaps on an empty one (VERDICT r3
    next-2a). Stubs carry the real manifests' file sets
    (download_models.py:44-85) at toy tensor sizes — preflight is
    file/header checks only, so size is irrelevant."""

    @staticmethod
    def _stub_ckpt(root, basename, model_type, extra_cfg, st_gemma=False):
        from safetensors.numpy import save_file

        d = root / basename
        d.mkdir(parents=True)
        (d / "config.json").write_text(json.dumps(
            {"model_type": model_type, **extra_cfg}
        ))
        save_file(
            {"w": np.zeros((4, 4), np.float32)}, d / "model.safetensors"
        )
        (d / "tokenizer.json").write_text("{}")
        if st_gemma:
            (d / "config_sentence_transformers.json").write_text(json.dumps(
                {"prompts": {"query": "q: ", "document": "d: "}}
            ))
            (d / "modules.json").write_text("[]")
            for sub in ("2_Dense", "3_Dense"):
                (d / sub).mkdir()
                save_file(
                    {"linear.weight": np.zeros((2, 2), np.float32)},
                    d / sub / "model.safetensors",
                )
        return d

    def test_preflight_green_on_stubs(self, tmp_path, capsys):
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.eval.preflight import run_preflight

        models = tmp_path / "models"
        self._stub_ckpt(
            models, "embeddinggemma-300m", "gemma3_text",
            {"num_hidden_layers": 24, "hidden_size": 768}, st_gemma=True,
        )
        self._stub_ckpt(
            models, "GTE-ModernColBERT-v1", "modernbert",
            {"num_hidden_layers": 22, "hidden_size": 768},
        )
        self._stub_ckpt(
            models, "ms-marco-MiniLM-L6-v2", "bert",
            {"num_hidden_layers": 6, "hidden_size": 384},
        )
        data = tmp_path / "data" / "limit-small"
        data.mkdir(parents=True)
        (data / "queries.jsonl").write_text(
            json.dumps({"_id": "q1", "text": "who likes apples?"}) + "\n"
        )
        (data / "corpus.jsonl").write_text(
            json.dumps({"_id": "d1", "text": "alice likes apples"}) + "\n"
        )
        (data / "qrels.jsonl").write_text(
            json.dumps({"query-id": "q1", "corpus-id": "d1", "score": 1}) + "\n"
        )
        cfg = PipelineConfig(model_dir=str(models))
        rc = run_preflight(cfg, str(tmp_path / "data"), "limit-small")
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "ALL CHECKS PASSED" in out

    def test_preflight_wrong_family_blocks(self, tmp_path, capsys):
        """A BERT checkpoint unpacked into the gemma directory must be
        flagged as an architecture mismatch, not pass as 'weights
        present'."""
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.eval.preflight import run_preflight

        models = tmp_path / "models"
        self._stub_ckpt(models, "embeddinggemma-300m", "bert", {})
        cfg = PipelineConfig(model_dir=str(models))
        rc = run_preflight(cfg, str(tmp_path / "data"), "limit-small")
        out = capsys.readouterr().out
        assert rc == 1
        assert "wrong checkpoint" in out

    def test_preflight_empty_tree_blocks(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.eval.preflight import run_preflight

        cfg = PipelineConfig(model_dir=str(tmp_path / "models"))
        rc = run_preflight(cfg, str(tmp_path / "data"), "limit-small")
        assert rc == 1

"""HF-checkpoint → Flax param-tree loading.

Reads a local checkpoint directory (``config.json`` + ``*.safetensors``,
optionally sentence-transformers module subdirs like ``2_Dense/``) and
produces (EncoderConfig, head config, params) for the runtime. Covers
the reference's three model families (SURVEY.md §2.1):

* ``bert`` — MiniLM bi/cross-encoders (cross-encoder/ms-marco-MiniLM-L6-v2).
* ``modernbert`` — GTE-ModernColBERT-v1 (PyLate: ModernBERT + 1_Dense).
* ``gemma3_text`` — embeddinggemma-300m (sentence-transformers: Gemma3
  + mean pooling + 2_Dense(3072) + 3_Dense(768) + normalize).

Torch weight layout notes: ``nn.Linear.weight`` is [out, in] and maps to
Flax ``kernel`` [in, out] (transpose); attention projections reshape to
DenseGeneral's [in, heads, head_dim] / [heads, head_dim, out].

Parity is tested against torch/transformers forwards on synthesized
tiny checkpoints (tests/test_hf_parity.py) — no downloads needed.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Any

import numpy as np

from tristage_rag_tpu.models.config import EncoderConfig, PoolingConfig

logger = logging.getLogger(__name__)


def _load_safetensors(path: Path) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    state: dict[str, np.ndarray] = {}
    for f in sorted(path.glob("*.safetensors")):
        state.update(load_file(f))
    if not state:
        raise FileNotFoundError(f"no safetensors files in {path}")
    return {k: np.asarray(v, dtype=np.float32) for k, v in state.items()}


def read_config(path: Path) -> dict[str, Any]:
    return json.loads((path / "config.json").read_text())


# ---------------------------------------------------------------------------
# config.json -> EncoderConfig
# ---------------------------------------------------------------------------


def encoder_config_from_hf(hf: dict[str, Any]) -> EncoderConfig:
    mt = hf.get("model_type", "bert").lower()
    if mt == "bert":
        return EncoderConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            mlp_dim=hf["intermediate_size"],
            max_position_embeddings=hf.get("max_position_embeddings", 512),
            position_type="learned",
            type_vocab_size=hf.get("type_vocab_size", 2),
            norm_eps=hf.get("layer_norm_eps", 1e-12),
            activation="gelu",
        )
    if mt == "modernbert":
        return EncoderConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            mlp_dim=hf["intermediate_size"],
            max_position_embeddings=hf.get("max_position_embeddings", 8192),
            position_type="rope",
            pre_norm=True,
            activation="geglu",
            # norm_bias drives LayerNorm bias; attention/mlp linear
            # biases are independent flags in ModernBERT configs
            use_bias=hf.get("norm_bias", False),
            attention_bias=hf.get("attention_bias", False),
            mlp_bias=hf.get("mlp_bias", False),
            sliding_window=hf.get("local_attention", 128),
            global_attn_every=hf.get("global_attn_every_n_layers", 3),
            rope_theta=hf.get("global_rope_theta", 160000.0),
            rope_local_theta=hf.get("local_rope_theta", 10000.0),
            norm_eps=hf.get("norm_eps", 1e-5),
            skip_first_attn_norm=True,
            embedding_norm=True,
            type_vocab_size=0,
        )
    if mt in ("gemma3_text", "gemma3", "gemma2"):
        layer_types = hf.get("layer_types")
        return EncoderConfig(
            causal=not hf.get("use_bidirectional_attention", False),
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            head_dim=hf.get("head_dim"),
            mlp_dim=hf["intermediate_size"],
            max_position_embeddings=hf.get("max_position_embeddings", 2048),
            position_type="rope",
            norm_type="rmsnorm",
            norm_eps=hf.get("rms_norm_eps", 1e-6),
            pre_norm=True,
            gemma_norms=True,
            qk_norm=True,
            # Gemma uses the tanh-approximate gelu ("gelu_pytorch_tanh")
            activation=(
                "geglu"
                if hf.get("hidden_activation", "gelu_pytorch_tanh") == "gelu"
                else "geglu_tanh"
            ),
            use_bias=hf.get("attention_bias", False),
            embedding_scale=True,
            embedding_norm=False,
            sliding_window=hf.get("sliding_window", 0) or 0,
            layer_types=tuple(layer_types) if layer_types else None,
            global_attn_every=hf.get("sliding_window_pattern", 6),
            rope_theta=hf.get("rope_theta", 1_000_000.0),
            rope_local_theta=hf.get("rope_local_base_freq", 10_000.0),
            query_scale=hf.get("query_pre_attn_scalar"),
            attn_logit_softcap=hf.get("attn_logit_softcapping") or 0.0,
        )
    raise ValueError(f"unsupported model_type {mt!r}")


# ---------------------------------------------------------------------------
# weight mapping
# ---------------------------------------------------------------------------


def _linear(w: np.ndarray, b: np.ndarray | None = None) -> dict:
    p = {"kernel": w.T.copy()}
    if b is not None:
        p["bias"] = b
    return p


def _attn_in(w: np.ndarray, heads: int, hd: int, b: np.ndarray | None) -> dict:
    # torch [heads*hd, in] -> flax DenseGeneral kernel [in, heads, hd]
    p = {"kernel": w.T.reshape(-1, heads, hd).copy()}
    if b is not None:
        p["bias"] = b.reshape(heads, hd)
    return p


def _attn_out(w: np.ndarray, heads: int, hd: int, b: np.ndarray | None) -> dict:
    # torch [out, heads*hd] -> flax DenseGeneral kernel [heads, hd, out]
    p = {"kernel": w.T.reshape(heads, hd, -1).copy()}
    if b is not None:
        p["bias"] = b
    return p


def _norm_params(weight, bias=None) -> dict:
    """LayerNorm params from already-resolved tensors (bias optional)."""
    p = {"scale": weight}
    if bias is not None:
        p["bias"] = bias
    return p


def _ln(state: dict, prefix: str, rms: bool = False) -> dict:
    w = state[f"{prefix}.weight"]
    if rms:
        return {"scale": w}
    p = {"scale": w}
    if f"{prefix}.bias" in state:
        p["bias"] = state[f"{prefix}.bias"]
    return p


class _Missing(KeyError):
    pass


def _get(state: dict, *names: str) -> np.ndarray:
    for n in names:
        if n in state:
            return state[n]
    raise _Missing(f"none of {names} in checkpoint")


def _maybe(state: dict, *names: str) -> np.ndarray | None:
    for n in names:
        if n in state:
            return state[n]
    return None


def map_bert(state: dict, cfg: EncoderConfig) -> dict:
    """BERT-family encoder params (prefix-agnostic: bert.* or bare)."""

    def g(*names):
        expanded = []
        for n in names:
            expanded += [n, f"bert.{n}"]
        return _get(state, *expanded)

    def m(*names):
        expanded = []
        for n in names:
            expanded += [n, f"bert.{n}"]
        return _maybe(state, *expanded)

    h, hd = cfg.num_heads, cfg.dims_per_head
    params: dict[str, Any] = {
        "tok_embed": {"embedding": g("embeddings.word_embeddings.weight")},
        "pos_embed": {"embedding": g("embeddings.position_embeddings.weight")},
        "embed_norm": {
            "scale": g("embeddings.LayerNorm.weight"),
            "bias": g("embeddings.LayerNorm.bias"),
        },
    }
    if cfg.type_vocab_size > 0:
        params["type_embed"] = {
            "embedding": g("embeddings.token_type_embeddings.weight")
        }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attn": {
                "q_proj": _attn_in(g(p + "attention.self.query.weight"), h, hd,
                                   m(p + "attention.self.query.bias")),
                "k_proj": _attn_in(g(p + "attention.self.key.weight"), h, hd,
                                   m(p + "attention.self.key.bias")),
                "v_proj": _attn_in(g(p + "attention.self.value.weight"), h, hd,
                                   m(p + "attention.self.value.bias")),
                "o_proj": _attn_out(g(p + "attention.output.dense.weight"), h, hd,
                                    m(p + "attention.output.dense.bias")),
            },
            "attn_norm": {
                "scale": g(p + "attention.output.LayerNorm.weight"),
                "bias": g(p + "attention.output.LayerNorm.bias"),
            },
            "mlp": {
                "up_proj": _linear(g(p + "intermediate.dense.weight"),
                                   m(p + "intermediate.dense.bias")),
                "down_proj": _linear(g(p + "output.dense.weight"),
                                     m(p + "output.dense.bias")),
            },
            "mlp_norm": {
                "scale": g(p + "output.LayerNorm.weight"),
                "bias": g(p + "output.LayerNorm.bias"),
            },
        }
    return params


def map_modernbert(state: dict, cfg: EncoderConfig) -> dict:
    def g(*names):
        expanded = []
        for n in names:
            expanded += [n, f"model.{n}", f"modernbert.{n}"]
        return _get(state, *expanded)

    def m(*names):
        expanded = []
        for n in names:
            expanded += [n, f"model.{n}", f"modernbert.{n}"]
        return _maybe(state, *expanded)

    h, hd = cfg.num_heads, cfg.dims_per_head
    hidden = cfg.hidden_size
    params: dict[str, Any] = {
        "tok_embed": {"embedding": g("embeddings.tok_embeddings.weight")},
        "embed_norm": {"scale": g("embeddings.norm.weight")},
        "final_norm": {"scale": g("final_norm.weight")},
    }
    if m("embeddings.norm.bias") is not None:
        params["embed_norm"]["bias"] = m("embeddings.norm.bias")
        params["final_norm"]["bias"] = m("final_norm.bias")
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        wqkv = g(p + "attn.Wqkv.weight")  # [3*hidden, hidden]
        bqkv = m(p + "attn.Wqkv.bias")
        wq, wk, wv = np.split(wqkv, 3, axis=0)
        bq = bk = bv = None
        if bqkv is not None:
            bq, bk, bv = np.split(bqkv, 3, axis=0)
        wi = g(p + "mlp.Wi.weight")  # [2*mlp, hidden]; chunk: (act, gate)
        bi = m(p + "mlp.Wi.bias")
        w_act, w_gate = np.split(wi, 2, axis=0)
        b_act = b_gate = None
        if bi is not None:
            b_act, b_gate = np.split(bi, 2, axis=0)
        layer = {
            "attn": {
                "q_proj": _attn_in(wq, h, hd, bq),
                "k_proj": _attn_in(wk, h, hd, bk),
                "v_proj": _attn_in(wv, h, hd, bv),
                "o_proj": _attn_out(g(p + "attn.Wo.weight"), h, hd,
                                    m(p + "attn.Wo.bias")),
            },
            # HF chunk order is (input, gate) with act applied to input
            # and gate as the multiplier; our geglu applies act to
            # gate_proj and multiplies by up_proj.
            "mlp": {
                "gate_proj": _linear(w_act, b_act),
                "up_proj": _linear(w_gate, b_gate),
                "down_proj": _linear(g(p + "mlp.Wo.weight"), m(p + "mlp.Wo.bias")),
            },
            "mlp_norm": _norm_params(
                g(p + "mlp_norm.weight"), m(p + "mlp_norm.bias")
            ),
        }
        if i > 0 or not cfg.skip_first_attn_norm:
            layer["attn_norm"] = _norm_params(
                g(p + "attn_norm.weight"), m(p + "attn_norm.bias")
            )
        params[f"layer_{i}"] = layer
    return params


def map_gemma3(state: dict, cfg: EncoderConfig) -> dict:
    def g(*names):
        expanded = []
        for n in names:
            expanded += [n, f"model.{n}"]
        return _get(state, *expanded)

    h, kvh, hd = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
    params: dict[str, Any] = {
        "tok_embed": {"embedding": g("embed_tokens.weight")},
        "final_norm": {"scale": g("norm.weight")},
    }
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        params[f"layer_{i}"] = {
            "attn": {
                "q_proj": _attn_in(g(p + "self_attn.q_proj.weight"), h, hd, None),
                "k_proj": _attn_in(g(p + "self_attn.k_proj.weight"), kvh, hd, None),
                "v_proj": _attn_in(g(p + "self_attn.v_proj.weight"), kvh, hd, None),
                "o_proj": _attn_out(g(p + "self_attn.o_proj.weight"), h, hd, None),
                "q_norm": {"scale": g(p + "self_attn.q_norm.weight")},
                "k_norm": {"scale": g(p + "self_attn.k_norm.weight")},
            },
            "attn_norm": {"scale": g(p + "input_layernorm.weight")},
            "post_attn_norm": {"scale": g(p + "post_attention_layernorm.weight")},
            "mlp_norm": {"scale": g(p + "pre_feedforward_layernorm.weight")},
            "post_mlp_norm": {"scale": g(p + "post_feedforward_layernorm.weight")},
            "mlp": {
                "gate_proj": _linear(g(p + "mlp.gate_proj.weight")),
                "up_proj": _linear(g(p + "mlp.up_proj.weight")),
                "down_proj": _linear(g(p + "mlp.down_proj.weight")),
            },
        }
    return params


_MAPPERS = {
    "bert": map_bert,
    "modernbert": map_modernbert,
    "gemma3_text": map_gemma3,
    "gemma3": map_gemma3,
    "gemma2": map_gemma3,
}


# ---------------------------------------------------------------------------
# sentence-transformers / PyLate head modules
# ---------------------------------------------------------------------------


def _st_dense_modules(path: Path) -> list[tuple[int, np.ndarray]]:
    """Collect Dense-module weights from ST-style subdirs (2_Dense/...).

    Returns [(out_dim, kernel [in, out])...] in module order.
    """
    out = []
    modules_file = path / "modules.json"
    dirs: list[Path] = []
    if modules_file.exists():
        for mod in json.loads(modules_file.read_text()):
            mt = mod.get("type", "")
            if "Dense" in mt:
                dirs.append(path / mod["path"])
    else:
        dirs = sorted(
            (d for d in path.iterdir() if d.is_dir() and "Dense" in d.name),
            key=lambda d: d.name,
        )
    for d in dirs:
        try:
            st = _load_safetensors(d)
        except FileNotFoundError:
            continue
        w = _maybe(st, "linear.weight", "weight")
        if w is None:
            continue
        # ST Dense defaults to bias=True — dropping a present bias
        # would silently offset every embedding
        b = _maybe(st, "linear.bias", "bias")
        out.append((w.shape[0], w.T.copy(), b))
    return out


def _st_pooling(path: Path, default: str = "mean") -> str:
    modules_file = path / "modules.json"
    pool_dirs = []
    if modules_file.exists():
        for mod in json.loads(modules_file.read_text()):
            if "Pooling" in mod.get("type", ""):
                pool_dirs.append(path / mod["path"])
    else:
        pool_dirs = [d for d in path.iterdir() if d.is_dir() and "Pooling" in d.name]
    for d in pool_dirs:
        cfg_file = d / "config.json"
        if cfg_file.exists():
            c = json.loads(cfg_file.read_text())
            if c.get("pooling_mode_mean_tokens"):
                return "mean"
            if c.get("pooling_mode_cls_token"):
                return "cls"
            if c.get("pooling_mode_max_tokens"):
                return "max"
            if c.get("pooling_mode_lasttoken"):
                return "lasttoken"
    return default


# ---------------------------------------------------------------------------
# top-level entry
# ---------------------------------------------------------------------------


def load_checkpoint(
    path: str | Path,
    kind: str,
    fallback_cfg: EncoderConfig,
    fallback_head,
    compute_dtype: str = "bfloat16",
):
    """Load (EncoderConfig, head config, params) from a checkpoint dir."""
    path = Path(path)
    hf = read_config(path)
    cfg = encoder_config_from_hf(hf).replace(dtype=compute_dtype)
    state = _load_safetensors(path)
    mt = hf.get("model_type", "bert").lower()
    mapper = _MAPPERS.get(mt)
    if mapper is None:
        raise ValueError(f"no weight mapper for model_type {mt!r}")
    encoder_params = mapper(state, cfg)
    params: dict[str, Any] = {"encoder": encoder_params}

    if kind == "bi":
        dense = _st_dense_modules(path)
        head = PoolingConfig(
            pooling=_st_pooling(path),
            projection_dims=tuple(d for d, _, _ in dense),
            projection_bias=tuple(b is not None for _, _, b in dense),
            normalize=True,
        )
        for i, (_, kernel, bias) in enumerate(dense):
            params[f"proj_{i}"] = (
                {"kernel": kernel, "bias": bias}
                if bias is not None else {"kernel": kernel}
            )
    elif kind == "colbert":
        if not fallback_head.project:
            # reference-faithful mode: score raw hidden states, skip the
            # checkpoint's projection entirely (stage2_use_projection)
            head = fallback_head
        else:
            dense = _st_dense_modules(path)
            if dense:
                out_dim, kernel, bias = dense[0]
                head = dataclasses.replace(
                    fallback_head, output_dim=out_dim,
                    project_bias=bias is not None,
                )
                params["colbert_proj"] = (
                    {"kernel": kernel, "bias": bias}
                    if bias is not None else {"kernel": kernel}
                )
            else:
                raise ValueError(
                    "ColBERT checkpoint missing Dense projection module"
                )
    elif kind == "cross":
        head = fallback_head
        cls_w = _maybe(state, "classifier.weight")
        cls_b = _maybe(state, "classifier.bias")
        if cls_w is None:
            raise ValueError("cross-encoder checkpoint missing classifier head")
        head = dataclasses.replace(head, num_labels=cls_w.shape[0])
        params["classifier"] = _linear(cls_w, cls_b)
        pool_w = _maybe(state, "bert.pooler.dense.weight", "pooler.dense.weight")
        if pool_w is not None:
            head = dataclasses.replace(head, pooler_tanh=True)
            params["pooler"] = _linear(
                pool_w, _maybe(state, "bert.pooler.dense.bias", "pooler.dense.bias")
            )
        else:
            head = dataclasses.replace(head, pooler_tanh=False)
    else:
        raise ValueError(f"unknown kind {kind!r}")

    return cfg, head, params

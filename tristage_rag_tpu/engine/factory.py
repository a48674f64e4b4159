"""Model construction: registry configs + checkpoint/tokenizer resolution.

Maps the reference's HF model names (src/stage{1,2,3}_*.py defaults) to
registry architecture configs, loads real weights when a checkpoint
directory exists under ``model_dir`` (models/hf_loader.py), and falls
back to deterministic random init + hash tokenizer otherwise — so the
whole engine runs end-to-end with zero downloaded assets (SURVEY.md §4).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

from jax.sharding import Mesh

from tristage_rag_tpu.models import registry
from tristage_rag_tpu.models.config import (
    ColBERTConfig,
    CrossEncoderConfig,
    PoolingConfig,
)
from tristage_rag_tpu.models.runtime import EncoderRuntime
from tristage_rag_tpu.models.tokenizer import BaseTokenizer, load_tokenizer

logger = logging.getLogger(__name__)

# Reference model name -> registry key
_NAME_MAP = {
    "google/embeddinggemma-300m": "embeddinggemma-300m",
    "lightonai/gte-moderncolbert-v1": "gte-moderncolbert",
    "cross-encoder/ms-marco-minilm-l6-v2": "minilm-l6-cross",
    "cross-encoder/ms-marco-minilm-l-6-v2": "minilm-l6-cross",
    "sentence-transformers/all-minilm-l6-v2": "minilm-l6-cross",
    # 2-layer distilled sibling (stage-3 student; train/distill.py)
    "cross-encoder/ms-marco-minilm-l2-v2": "minilm-l2-cross",
    "cross-encoder/ms-marco-minilm-l-2-v2": "minilm-l2-cross",
}

_TINY_BY_KIND = {"bi": "tiny-gemma", "colbert": "tiny-modernbert", "cross": "tiny-bert"}


def resolve_registry_key(model_name: str, kind: str, quiet: bool = False) -> str:
    low = model_name.lower()
    if low in _NAME_MAP:
        return _NAME_MAP[low]
    if low in registry.ENCODER_CONFIGS:
        return low
    if low.startswith("tiny"):
        return _TINY_BY_KIND[kind]
    if not quiet:
        logger.warning(
            "unknown model %r; using tiny %s architecture with random init",
            model_name,
            kind,
        )
    return _TINY_BY_KIND[kind]


def checkpoint_dir(model_dir: str, model_name: str) -> Optional[Path]:
    """Flattened local layout: <model_dir>/<basename(model_name)>.

    Mirrors the reference's ModelDownloader layout
    (benchmark/download_models.py:93-115).
    """
    base = Path(model_dir) / model_name.split("/")[-1]
    if base.is_dir() and any(base.glob("*.safetensors")):
        return base
    from tristage_rag_tpu.models.native_ckpt import is_native_dir

    if base.is_dir() and is_native_dir(base):
        return base
    return None


# sentence-transformers prompt parity (SURVEY.md §7 "ST semantic
# parity"): ST's encode() prepends the model's configured prompts;
# embeddinggemma ships query/document prompts that materially change
# embeddings. Read them from the checkpoint, else use the published
# defaults for known models.
_DEFAULT_PROMPTS = {
    "embeddinggemma-300m": {
        "query": "task: search result | query: ",
        "document": "title: none | text: ",
    },
}


def _load_prompts(ckpt, model_name: str, mode: str = "auto") -> dict:
    """Resolve the query/document prompt strings the runtime prepends.

    ``mode`` (PipelineConfig.stage1_prompt_mode):
    * "auto"       — the checkpoint's named query/document prompts
      (what ST's encode_query/encode_document apply; the quality-correct
      behavior for prompt-trained models like embeddinggemma).
    * "st-default" — exactly what plain ``model.encode(texts)`` does in
      sentence-transformers (and hence the reference,
      src/stage1_retriever.py:237-254): only a configured
      ``default_prompt_name`` prompt applies, to BOTH kinds.
    * "none"       — no prompts.
    """
    import json

    if mode == "none":
        return {"query": "", "document": ""}
    prompts: dict = {}
    default_name = None
    if ckpt is not None:
        st_cfg = Path(ckpt) / "config_sentence_transformers.json"
        if st_cfg.exists():
            try:
                data = json.loads(st_cfg.read_text())
                prompts = data.get("prompts") or {}
                default_name = data.get("default_prompt_name")
            except Exception:
                pass
    if mode == "st-default":
        p = prompts.get(default_name, "") if default_name else ""
        return {"query": p, "document": p}
    if prompts:
        return {
            "query": prompts.get("query", ""),
            "document": prompts.get("document", ""),
        }
    base = model_name.split("/")[-1].lower()
    return dict(_DEFAULT_PROMPTS.get(base, {"query": "", "document": ""}))


def act_int8_overrides(mode, knob: str = "act_int8") -> Optional[dict]:
    """Map a ``stage{1,2,3}_act_int8`` knob (False | "pallas" |
    "static-pallas") to EncoderConfig overrides.

    Both modes route every int8 projection through the fused
    quant/dot/dequant Pallas kernel (ops/pallas_qdense.py); "pallas"
    uses dynamic per-row scales computed in VMEM, "static-pallas" uses
    per-tensor scales calibrated abs-max on the first real batch. The
    plain-XLA modes (True/"dynamic"/"static") were REMOVED after
    measuring as in-context losses at every pipeline level
    (BENCH_NOTES round-3: dots 1.2-2.9x faster isolated, funnel
    10-25% slower; the "+35% indexing" reading did not survive
    re-measurement) — the XLA lowering survives only as the internal
    fallback for lane-misaligned shapes."""
    if not mode:
        return None
    if mode == "pallas":
        return {"int8_activations": True}
    if mode == "static-pallas":
        return {"int8_activations": True, "int8_act_static": True}
    if mode in (True, "true", "dynamic", "static"):
        raise ValueError(
            f"{knob}={mode!r} was removed: the plain-XLA int8 "
            f"activation modes measured as in-context LOSSES "
            f"(BENCH_NOTES round-3) and were pruned (VERDICT r3). Use "
            f"'pallas' / 'static-pallas' (fused kernel), or "
            f"stage*_weights_int8 for the weight-HBM-bound case."
        )
    raise ValueError(
        f"{knob} must be False, 'pallas' or 'static-pallas'; got {mode!r}"
    )


def encoder_perf_overrides(config, stage: str) -> Optional[dict]:
    """Merge the per-stage encoder performance knobs
    (``{stage}_act_int8``, ``{stage}_fused_mlp``,
    ``{stage}_flash_attention``) into one EncoderConfig override dict.
    fused_mlp only applies when int8 activations are off — the int8
    pallas modes already fuse the MLP block (models/layers.py::Mlp)."""
    ov = act_int8_overrides(
        getattr(config, f"{stage}_act_int8", False), f"{stage}_act_int8"
    ) or {}
    fm = getattr(config, f"{stage}_fused_mlp", False)
    if isinstance(fm, str) and fm != "auto":
        raise ValueError(
            f"{stage}_fused_mlp must be true, false, or \"auto\"; "
            f"got {fm!r}"
        )
    if fm == "auto":
        # Default-on where the Mosaic kernel actually runs: measured
        # -13% fused-funnel device time and +15-19% indexing docs/s,
        # quality-neutral on trained weights (BENCH_NOTES round-3).
        # CPU would run the kernel in Pallas interpret mode (orders of
        # magnitude slower), so auto keeps the module path there —
        # same policy as DenseIndex._resolved_cluster_kernel.
        import jax

        fm = jax.default_backend() != "cpu"
    if fm:
        ov["fused_mlp"] = True
    if getattr(config, f"{stage}_flash_attention", False):
        ov["flash_attention"] = True
    fa = getattr(config, f"{stage}_fused_attention", False)
    if isinstance(fa, str) and fa != "auto":
        raise ValueError(
            f"{stage}_fused_attention must be true, false, or "
            f"\"auto\"; got {fa!r}"
        )
    if fa == "auto":
        # Same policy as fused_mlp auto: the small-bucket attention
        # kernel only pays on real accelerators (CPU would run it in
        # Pallas interpret mode).
        import jax

        fa = jax.default_backend() != "cpu"
    if fa:
        ov["fused_attention"] = True
    return ov or None


def build_runtime(
    kind: str,
    model_name: str,
    model_dir: str,
    compute_dtype: str = "bfloat16",
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    head_overrides: Optional[dict] = None,
    prompt_mode: str = "auto",
    encoder_overrides: Optional[dict] = None,
    precast_kernels: bool = True,
) -> tuple[EncoderRuntime, BaseTokenizer]:
    """Build an (EncoderRuntime, tokenizer) pair for one stage.

    ``encoder_overrides`` are applied to the EncoderConfig AFTER a
    checkpoint (which carries its own architecture config) resolves —
    runtime knobs like ``int8_activations`` that are not architecture.
    """
    ckpt = checkpoint_dir(model_dir, model_name)
    # When a checkpoint exists, the registry entry is irrelevant (the
    # architecture comes from its config.json) — resolve quietly.
    key = resolve_registry_key(model_name, kind, quiet=ckpt is not None)
    enc_cfg = registry.encoder_config(key).replace(dtype=compute_dtype)
    if kind == "bi":
        head = registry.POOLING_CONFIGS.get(key, PoolingConfig())
    elif kind == "colbert":
        head = registry.COLBERT_CONFIGS.get(key, ColBERTConfig())
    else:
        head = registry.CROSS_CONFIGS.get(key, CrossEncoderConfig())
    if head_overrides:
        import dataclasses

        head = dataclasses.replace(head, **head_overrides)

    params = None
    native_prompts = None
    if ckpt is not None:
        from tristage_rag_tpu.models import hf_loader, native_ckpt

        try:
            if native_ckpt.is_native_dir(ckpt):
                saved_kind, n_cfg, n_head, n_params, n_prompts = (
                    native_ckpt.load_native(ckpt, compute_dtype)
                )
                if saved_kind != kind:
                    raise native_ckpt.CheckpointKindError(
                        f"checkpoint {ckpt} is a {saved_kind!r} model, "
                        f"requested kind {kind!r}"
                    )
                enc_cfg, head, params, native_prompts = (
                    n_cfg, n_head, n_params, n_prompts
                )
                if head_overrides:
                    import dataclasses

                    head = dataclasses.replace(head, **head_overrides)
                logger.info("loaded native %s checkpoint from %s", kind, ckpt)
            else:
                enc_cfg, head, params = hf_loader.load_checkpoint(
                    ckpt, kind, enc_cfg, head, compute_dtype
                )
                logger.info("loaded %s checkpoint from %s", kind, ckpt)
        except native_ckpt.CheckpointKindError:
            raise  # misconfig, not a load failure — fail loudly
        except Exception as e:  # fall back to random init, keep serving
            logger.warning("failed to load checkpoint %s (%s); random init", ckpt, e)
            params = None
            native_prompts = None

    if encoder_overrides:
        enc_cfg = enc_cfg.replace(**encoder_overrides)

    from tristage_rag_tpu.parallel.mesh import DATA_AXIS

    weights_loaded = params is not None
    runtime = EncoderRuntime(
        kind, enc_cfg, head, params=params, seed=seed, mesh=mesh,
        dp_axis=(
            DATA_AXIS
            if mesh is not None and DATA_AXIS in mesh.shape
            else "dp"
        ),
        precast_kernels=precast_kernels,
    )
    # Surfaced through get_stats/get_model_info/get_pipeline_info so an
    # eval run on random init can never masquerade as a real score
    # (run_benchmark.py refuses without --allow-random-weights).
    runtime.weights_loaded = weights_loaded
    if native_prompts is not None and prompt_mode != "none":
        # native checkpoints persist their (already mode-resolved)
        # prompts in the manifest; there is no ST config to re-read
        runtime.prompts = native_prompts
    else:
        runtime.prompts = _load_prompts(ckpt, model_name, prompt_mode)
    tokenizer = load_tokenizer(str(ckpt) if ckpt else None)
    if tokenizer.vocab_size > enc_cfg.vocab_size:
        # Hash tokenizer must stay within the embedding table.
        from tristage_rag_tpu.models.tokenizer import HashTokenizer

        tokenizer = HashTokenizer(vocab_size=enc_cfg.vocab_size)
    return runtime, tokenizer

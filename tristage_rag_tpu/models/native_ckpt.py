"""TPU-native checkpoint format: JSON config + npz params.

Closes the train -> serve loop: the HF loader (models/hf_loader.py)
only READS checkpoints, so until now params produced by
`run_train.py` (fine-tuned or distilled — train/distill.py) could
only be served by in-process injection. `save_native` writes a
directory the factory loads BY NAME exactly like an HF snapshot
(`build_runtime` probes for ``native_config.json`` first), following
the repo's persistence invariant: npz + JSON, never pickle
(CLAUDE.md; same class as index/dense.py's format).

Layout of an exported directory::

    <dir>/native_config.json   format/version/kind + encoder + head
                               dataclass fields + ST-style prompts
    <dir>/params.npz           flat param tree, "/"-joined keys
    <dir>/tokenizer.json ...   (optional) tokenizer files copied from
                               the teacher/base checkpoint so
                               load_tokenizer resolves the same vocab

Runtime-only knobs never persist: compute dtype comes from the
serving config, and int8-activation modes (``int8_activations`` /
``int8_act_static``) are per-deployment choices — their ``*_scale``
calibration leaves are stripped on save and re-grafted by
EncoderRuntime when a static-mode deployment loads the checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import numpy as np

from tristage_rag_tpu.models.config import (
    ColBERTConfig,
    CrossEncoderConfig,
    EncoderConfig,
    PoolingConfig,
)

FORMAT = "tristage-native"
VERSION = 1
MANIFEST = "native_config.json"


class CheckpointKindError(ValueError):
    """A checkpoint of one kind was pointed at a stage of another —
    a config error that must FAIL, not degrade to random-init serving
    (the degradation ladder is for load failures, not misconfig)."""

_HEAD_TYPES = {
    "bi": PoolingConfig,
    "colbert": ColBERTConfig,
    "cross": CrossEncoderConfig,
}
# Copied alongside the params so the exported dir tokenizes like its
# teacher/base checkpoint.
TOKENIZER_FILES = (
    "tokenizer.json",
    "tokenizer_config.json",
    "vocab.txt",
    "special_tokens_map.json",
)


def _jsonable(cfg) -> dict:
    """Dataclass -> JSON dict (tuples become lists; loader restores)."""

    def conv(v):
        if isinstance(v, tuple):
            return [conv(x) for x in v]
        return v

    return {
        f.name: conv(getattr(cfg, f.name))
        for f in dataclasses.fields(cfg)
        if not f.name.startswith("_")
    }


def _from_json(cls, data: dict):
    """JSON dict -> dataclass; lists return to tuples (no dataclass
    field here is legitimately a list)."""
    kw = {}
    names = {f.name for f in dataclasses.fields(cls)}
    for k, v in data.items():
        if k not in names:
            continue  # forward-compat: ignore fields this build lacks
        kw[k] = tuple(v) if isinstance(v, list) else v
    return cls(**kw)


def is_native_dir(path) -> bool:
    return (Path(path) / MANIFEST).is_file()


def save_native(
    path,
    kind: str,
    enc_cfg: EncoderConfig,
    head_cfg,
    params,
    prompts: Optional[dict] = None,
    tokenizer_src: Optional[Path] = None,
) -> Path:
    """Write a factory-loadable checkpoint. Returns the directory."""
    import jax
    from flax.traverse_util import flatten_dict

    if kind not in _HEAD_TYPES:
        raise ValueError(f"kind must be one of {sorted(_HEAD_TYPES)}; got {kind!r}")
    if not isinstance(head_cfg, _HEAD_TYPES[kind]):
        raise TypeError(
            f"head_cfg for kind={kind!r} must be "
            f"{_HEAD_TYPES[kind].__name__}, got {type(head_cfg).__name__}"
        )
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    flat = flatten_dict(jax.device_get(params), sep="/")
    arrays: dict[str, np.ndarray] = {}
    for key, leaf in flat.items():
        if key.endswith("_scale"):
            continue  # runtime calibration state, not weights
        a = np.asarray(leaf)
        if a.dtype == object:
            raise ValueError(
                f"param leaf {key!r} is not an array (weight-only int8 "
                f"trees must be dequantized before export)"
            )
        if a.dtype.name == "bfloat16":
            a = a.astype(np.float32)  # npz-portable; params are f32 math
        arrays[key] = a
    if any("/q8" in k for k in arrays):
        raise ValueError(
            "params contain weight-only int8 kernels (…/q8); export the "
            "pre-quantization tree (quantize_weights_int8 is a serving-"
            "time transform)"
        )

    # strip runtime-only encoder knobs
    enc_saved = enc_cfg.replace(int8_activations=False, int8_act_static=False)
    manifest = {
        "format": FORMAT,
        "version": VERSION,
        "kind": kind,
        "encoder": _jsonable(enc_saved),
        "head": _jsonable(head_cfg),
        "prompts": dict(prompts or {}),
    }
    (path / MANIFEST).write_text(json.dumps(manifest, indent=2))
    np.savez(path / "params.npz", **arrays)

    if tokenizer_src is not None:
        import shutil

        src = Path(tokenizer_src)
        for name in TOKENIZER_FILES:
            f = src / name
            if f.is_file():
                shutil.copy2(f, path / name)
    return path


def load_native(
    path, compute_dtype: str = "bfloat16"
) -> tuple[str, EncoderConfig, Any, dict, dict]:
    """Read a native checkpoint: (kind, enc_cfg, head_cfg, params,
    prompts). ``compute_dtype`` overrides the saved dtype (a runtime
    knob, like the HF loader's)."""
    from flax.traverse_util import unflatten_dict

    path = Path(path)
    manifest = json.loads((path / MANIFEST).read_text())
    if manifest.get("format") != FORMAT:
        raise ValueError(f"{path}: not a {FORMAT} checkpoint")
    if int(manifest.get("version", 0)) > VERSION:
        raise ValueError(
            f"{path}: version {manifest['version']} is newer than this "
            f"build supports ({VERSION})"
        )
    kind = manifest["kind"]
    enc_cfg = _from_json(EncoderConfig, manifest["encoder"]).replace(
        dtype=compute_dtype
    )
    head_cfg = _from_json(_HEAD_TYPES[kind], manifest["head"])
    with np.load(path / "params.npz") as z:
        flat = {k: z[k] for k in z.files}
    params = unflatten_dict(flat, sep="/")
    return kind, enc_cfg, head_cfg, params, dict(manifest.get("prompts") or {})

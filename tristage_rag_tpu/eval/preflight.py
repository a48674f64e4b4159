"""Real-checkpoint readiness preflight (VERDICT r3 next-2a).

Verifies every asset the real benchmark run needs — per-stage
checkpoint directories with parseable configs/weights/tokenizers
(manifest parity: benchmark/download_models.py:44-85), LIMIT dataset
JSONL files (download_limit_dataset.py:30-42) — and prints the exact
command sequence to run the moment the assets exist. Zero device
work: everything is host-side file/JSON/safetensors-header checks, so
the preflight runs in seconds on any machine.

Usage: ``python run_benchmark.py --preflight [--config ... --data-dir
... --variant ... --low-mem]``.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from pathlib import Path
from typing import Optional

# Tokenizer assets accepted per model family (any one suffices) —
# matches models/tokenizer.py::load_tokenizer's probe order.
_TOKENIZER_FILES = ("tokenizer.json", "tokenizer.model", "vocab.txt")

# Expected HF config model_type per registry family, so a wrong
# checkpoint unpacked into the right directory fails loudly here
# instead of at weight-mapping time.
_EXPECTED_MODEL_TYPE = {
    "embeddinggemma-300m": ("gemma3_text", "gemma3", "gemma"),
    "gte-moderncolbert": ("modernbert",),
    "minilm-l6-cross": ("bert",),
    "minilm-l2-cross": ("bert",),
}


@dataclasses.dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str = ""
    warn: bool = False  # ok=False + warn=True -> degraded, not fatal


def _safetensors_inventory(path: Path) -> tuple[int, int]:
    """(tensor_count, total_params) from safetensors headers only —
    no tensor data is read."""
    tensors = 0
    params = 0
    for f in sorted(path.glob("*.safetensors")):
        with open(f, "rb") as fh:
            (hdr_len,) = struct.unpack("<Q", fh.read(8))
            header = json.loads(fh.read(hdr_len))
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            tensors += 1
            n = 1
            for d in meta.get("shape", []):
                n *= d
            params += n
    return tensors, params


def check_stage_checkpoint(
    model_dir: str, model_name: str, stage: str
) -> list[CheckResult]:
    from tristage_rag_tpu.engine.factory import (
        checkpoint_dir, resolve_registry_key,
    )

    out: list[CheckResult] = []
    kind = {"stage1": "bi", "stage2": "colbert", "stage3": "cross"}[stage]
    key = resolve_registry_key(model_name, kind, quiet=True)
    if key.startswith("tiny") and not model_name.lower().startswith("tiny"):
        out.append(CheckResult(
            f"{stage}: model name", False,
            f"{model_name!r} is not a known model; would run the tiny "
            f"{kind} architecture with random weights",
        ))
        return out
    out.append(CheckResult(f"{stage}: model name", True, f"{model_name} -> {key}"))

    ckpt = checkpoint_dir(model_dir, model_name)
    base = Path(model_dir) / model_name.split("/")[-1]
    if ckpt is None:
        out.append(CheckResult(
            f"{stage}: checkpoint", False,
            f"no weights under {base} — would run RANDOM-INIT "
            f"(watermarked, quality meaningless)",
        ))
        return out

    # config.json: parseable + right family
    cfg_file = ckpt / "config.json"
    if not cfg_file.exists():
        # native-ckpt dirs carry their own manifest instead
        from tristage_rag_tpu.models.native_ckpt import is_native_dir

        if is_native_dir(ckpt):
            out.append(CheckResult(
                f"{stage}: checkpoint", True, f"native checkpoint at {ckpt}"
            ))
            return out
        out.append(CheckResult(
            f"{stage}: config.json", False, f"missing in {ckpt}"
        ))
        return out
    try:
        hf = json.loads(cfg_file.read_text())
    except Exception as e:
        out.append(CheckResult(
            f"{stage}: config.json", False, f"unparseable: {e}"
        ))
        return out
    expected = _EXPECTED_MODEL_TYPE.get(key)
    mt = hf.get("model_type", "?")
    if expected and mt not in expected:
        out.append(CheckResult(
            f"{stage}: architecture", False,
            f"config.json model_type={mt!r}, expected one of {expected} "
            f"for {key} — wrong checkpoint in {ckpt}?",
        ))
    else:
        out.append(CheckResult(
            f"{stage}: architecture", True,
            f"model_type={mt}, layers={hf.get('num_hidden_layers', '?')}, "
            f"hidden={hf.get('hidden_size', '?')}",
        ))

    # weights: header-parse every shard
    try:
        tensors, params = _safetensors_inventory(ckpt)
        out.append(CheckResult(
            f"{stage}: weights", tensors > 0,
            f"{tensors} tensors / {params / 1e6:.1f}M params",
        ))
    except Exception as e:
        out.append(CheckResult(f"{stage}: weights", False, f"bad safetensors: {e}"))

    # tokenizer assets
    tok = [f for f in _TOKENIZER_FILES if (ckpt / f).exists()]
    out.append(CheckResult(
        f"{stage}: tokenizer", bool(tok),
        f"found {tok}" if tok else
        f"none of {_TOKENIZER_FILES} in {ckpt} — would fall back to the "
        f"hash tokenizer (quality meaningless)",
    ))

    # stage-1 sentence-transformers sidecars (prompt + projection parity)
    if stage == "stage1" and key == "embeddinggemma-300m":
        for sidecar, why in (
            ("config_sentence_transformers.json",
             "named encode prompts (query/document)"),
            ("modules.json", "Pooling + 2_Dense/3_Dense module order"),
        ):
            present = (ckpt / sidecar).exists()
            out.append(CheckResult(
                f"{stage}: {sidecar}", present,
                why if present else
                f"missing — {why} will use built-in defaults", warn=True,
            ))
        dense_dirs = [d.name for d in ckpt.iterdir()
                      if d.is_dir() and "Dense" in d.name]
        out.append(CheckResult(
            f"{stage}: ST Dense modules", bool(dense_dirs),
            f"found {sorted(dense_dirs)}" if dense_dirs else
            "no 2_Dense/3_Dense dirs — projection head would be "
            "random-init", warn=not dense_dirs,
        ))
    return out


def check_dataset(data_dir: str, variant: str) -> list[CheckResult]:
    from tristage_rag_tpu.eval.limit import _candidate_dirs, _FILES

    out: list[CheckResult] = []
    found = None
    for cand in _candidate_dirs(data_dir, variant):
        if all((cand / f).exists() for f in _FILES):
            found = cand
            break
    if found is None:
        out.append(CheckResult(
            f"dataset: {variant}", False,
            f"queries/corpus/qrels JSONL not found under {data_dir}",
        ))
        return out
    schemas = {
        "queries.jsonl": ("_id",),
        "corpus.jsonl": ("_id",),
        "qrels.jsonl": ("query-id", "corpus-id"),
    }
    for fname, required in schemas.items():
        fpath = found / fname
        try:
            n = 0
            first: Optional[dict] = None
            with open(fpath, encoding="utf-8") as fh:
                for line in fh:
                    if line.strip():
                        if first is None:
                            first = json.loads(line)
                        n += 1
            missing = [k for k in required if first is not None and k not in first]
            if first is None:
                out.append(CheckResult(f"dataset: {fname}", False, "empty file"))
            elif missing:
                out.append(CheckResult(
                    f"dataset: {fname}", False,
                    f"first record missing keys {missing} (got "
                    f"{sorted(first)[:6]})",
                ))
            else:
                out.append(CheckResult(
                    f"dataset: {fname}", True, f"{n} records at {found}"
                ))
        except Exception as e:
            out.append(CheckResult(f"dataset: {fname}", False, str(e)))
    return out


def run_preflight(
    config, data_dir: str, variant: str, low_mem: bool = False,
    config_path: Optional[str] = None,
) -> int:
    """Print a readiness report + the exact command sequence. Returns
    0 when every blocking check passes, 1 otherwise."""
    from tristage_rag_tpu.eval.downloaders import LOW_MEMORY_ALTERNATES

    results: list[CheckResult] = []
    stage_models = {
        "stage1": config.stage1_model,
        "stage2": config.stage2_model,
        "stage3": config.stage3_model,
    }
    if low_mem:
        stage_models = {
            s: LOW_MEMORY_ALTERNATES.get(m, m)
            for s, m in stage_models.items()
        }
    for stage, model_name in stage_models.items():
        results += check_stage_checkpoint(config.model_dir, model_name, stage)
    results += check_dataset(data_dir, variant)

    print("=" * 72)
    print(f"PREFLIGHT  model_dir={config.model_dir}  data_dir={data_dir}  "
          f"variant={variant}{'  (low-mem)' if low_mem else ''}")
    print("=" * 72)
    blocking = 0
    for r in results:
        mark = "ok " if r.ok else ("WARN" if r.warn else "MISS")
        if not r.ok and not r.warn:
            blocking += 1
        print(f"  [{mark}] {r.name}: {r.detail}")

    print("-" * 72)
    if blocking:
        print(f"{blocking} blocking gap(s). To fix, run (in order):")
        print(f"  1. export HUGGING_FACE_HUB_TOKEN=...   # embeddinggemma is gated")
        print(f"  2. python -m tristage_rag_tpu.eval.downloaders ensure "
              f"--models-dir {config.model_dir}"
              + (" --low-mem" if low_mem else ""))
        print(f"  3. python run_benchmark.py --download --data-dir {data_dir} "
              f"--variant {variant}")
        print(f"  4. re-run this preflight, then:")
    else:
        print("ALL CHECKS PASSED — ready for the real run:")
    print(f"  python run_benchmark.py --data-dir {data_dir} "
          f"--variant {variant} --mteb"
          + (" --low-mem" if low_mem else "")
          + (f" --config {config_path}" if config_path else ""))
    print("Full egress-day checklist (downloads -> tests -> reference "
          "baseline -> parity table): docs/EGRESS_DAY.md")
    return 1 if blocking else 0

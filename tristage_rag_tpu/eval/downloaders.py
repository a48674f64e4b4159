"""Model asset management (HF checkpoints for the three stages).

Parity with benchmark/download_models.py: a required-model registry
with per-stage roles and low-memory alternates (:44-85), flattened
local layout ``<models_dir>/<basename>`` (:93-115), existence checks by
file manifest (:117-143), ``snapshot_download`` with token auth
(:145-198), ``ensure_models_available`` (:321-351), size reporting and
cleaning. Downloads are best-effort — this environment is zero-egress,
so the primary path is pre-placed checkpoints.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import shutil
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    repo_id: str
    stage: str
    required_files: tuple[str, ...] = ("config.json",)
    gated: bool = False


REQUIRED_MODELS: dict[str, ModelSpec] = {
    "google/embeddinggemma-300m": ModelSpec(
        "google/embeddinggemma-300m", "stage1", ("config.json",), gated=True
    ),
    "lightonai/GTE-ModernColBERT-v1": ModelSpec(
        "lightonai/GTE-ModernColBERT-v1", "stage2", ("config.json",)
    ),
    "cross-encoder/ms-marco-MiniLM-L6-v2": ModelSpec(
        "cross-encoder/ms-marco-MiniLM-L6-v2", "stage3", ("config.json",)
    ),
}

LOW_MEMORY_ALTERNATES: dict[str, str] = {
    "google/embeddinggemma-300m": "sentence-transformers/all-MiniLM-L6-v2",
    # the published 2-layer distillation sibling of the stage-3
    # reranker (registry "minilm-l2-cross"; or distill your own
    # in-domain with run_train --arch distill)
    "cross-encoder/ms-marco-MiniLM-L6-v2": "cross-encoder/ms-marco-MiniLM-L2-v2",
}


class ModelDownloader:
    def __init__(self, models_dir: str | Path = "./models", token: Optional[str] = None):
        self.models_dir = Path(models_dir)
        self.token = token or os.environ.get("HUGGING_FACE_HUB_TOKEN")

    def local_dir(self, repo_id: str) -> Path:
        return self.models_dir / repo_id.split("/")[-1]

    def is_available(self, repo_id: str) -> bool:
        d = self.local_dir(repo_id)
        if not d.is_dir():
            return False
        spec = REQUIRED_MODELS.get(repo_id)
        required = spec.required_files if spec else ("config.json",)
        has_weights = any(d.glob("*.safetensors")) or any(d.glob("*.bin"))
        return has_weights and all((d / f).exists() for f in required)

    def download(self, repo_id: str, force: bool = False) -> bool:
        if self.is_available(repo_id) and not force:
            logger.info("%s already present at %s", repo_id, self.local_dir(repo_id))
            return True
        try:
            from huggingface_hub import snapshot_download

            snapshot_download(
                repo_id,
                local_dir=self.local_dir(repo_id),
                token=self.token,
            )
            return self.is_available(repo_id)
        except Exception as e:
            spec = REQUIRED_MODELS.get(repo_id)
            if spec and spec.gated and "gated" in str(e).lower():
                logger.error(
                    "%s is gated: accept the license on huggingface.co and "
                    "set HUGGING_FACE_HUB_TOKEN", repo_id,
                )
            else:
                logger.warning("download of %s failed: %s", repo_id, e)
            return False

    def ensure_models_available(
        self, low_memory: bool = False
    ) -> dict[str, bool]:
        status: dict[str, bool] = {}
        for repo_id in REQUIRED_MODELS:
            target = (
                LOW_MEMORY_ALTERNATES.get(repo_id, repo_id)
                if low_memory
                else repo_id
            )
            status[target] = self.download(target)
        return status

    def size_report(self) -> dict[str, float]:
        out: dict[str, float] = {}
        if not self.models_dir.is_dir():
            return out
        for d in self.models_dir.iterdir():
            if d.is_dir():
                size = sum(f.stat().st_size for f in d.rglob("*") if f.is_file())
                out[d.name] = size / 1e9
        return out

    def clean_models(self) -> None:
        if self.models_dir.is_dir():
            shutil.rmtree(self.models_dir)


def main() -> int:
    """Model-management CLI (parity: benchmark/download_models.py:382-430)."""
    import argparse
    import json

    ap = argparse.ArgumentParser(description="manage HF model assets")
    ap.add_argument("command", choices=["ensure", "info", "clean", "download"])
    ap.add_argument("--models-dir", default="./models")
    ap.add_argument("--repo", help="repo id for 'download'")
    ap.add_argument("--low-mem", action="store_true")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    dl = ModelDownloader(args.models_dir)
    if args.command == "ensure":
        status = dl.ensure_models_available(low_memory=args.low_mem)
        print(json.dumps(status, indent=2))
        return 0 if all(status.values()) else 1
    if args.command == "download":
        if not args.repo:
            print("--repo required for download")
            return 2
        ok = dl.download(args.repo, force=args.force)
        print(f"{args.repo}: {'ok' if ok else 'FAILED'}")
        return 0 if ok else 1
    if args.command == "info":
        print(json.dumps({
            "models_dir": str(dl.models_dir),
            "available": {r: dl.is_available(r) for r in REQUIRED_MODELS},
            "sizes_gb": dl.size_report(),
        }, indent=2))
        return 0
    if args.command == "clean":
        dl.clean_models()
        print("cleaned")
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())

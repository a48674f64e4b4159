"""Benchmark configuration (parity: benchmark/config_loader.py).

YAML config with dot-notation ``get("a.b.c")`` (:58-69), required-key
validation (:44-56), repo-root path normalization (:75-106), and
low-memory-mode merge where low-mem defaults are overlaid by explicit
``pipeline_overrides`` (:136-151). Env overrides are deliberately NOT
supported — YAML is the single source of truth (:30-42).
"""

from __future__ import annotations

import copy
import logging
from pathlib import Path
from typing import Any, Optional

import yaml

logger = logging.getLogger(__name__)

REQUIRED_KEYS = ("benchmark.models_dir", "benchmark.datasets_dir")

DEFAULTS: dict[str, Any] = {
    "benchmark": {
        "models_dir": "./models",
        "datasets_dir": "./benchmark_data",
        "results_dir": "./results",
        "device": "auto",
        "evaluation": {
            "tasks": ["limit-small"],
            "top_k": 20,
            "max_queries": 0,
            "overwrite_results": True,
        },
        "pipeline": {
            "stage1": {"top_k": 500, "batch_size": 32},
            "stage2": {"top_k": 100, "batch_size": 16, "max_seq_length": 192},
            "stage3": {"top_k": 20, "batch_size": 32, "max_length": 256},
        },
        "encode_kwargs": {"batch_size": 64},
        "performance": {"enable_timing": True},
        "error_handling": {"fallback_to_cpu": True, "skip_on_error": False},
        "low_memory_mode": False,
        "low_memory": {
            "pipeline": {
                "stage1": {"batch_size": 8},
                "stage2": {"batch_size": 4, "max_seq_length": 128},
                "stage3": {"batch_size": 8, "max_length": 192},
            },
        },
        "pipeline_overrides": {},
    }
}


def _deep_merge(base: dict, overlay: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


class BenchmarkConfig:
    def __init__(
        self,
        config_path: Optional[str | Path] = None,
        root_dir: Optional[str | Path] = None,
    ):
        self.root_dir = Path(root_dir) if root_dir else Path.cwd()
        raw: dict[str, Any] = {}
        if config_path is not None:
            raw = yaml.safe_load(Path(config_path).read_text()) or {}
        self._cfg = _deep_merge(DEFAULTS, raw)
        self._apply_low_memory()
        self.validate()

    def _apply_low_memory(self) -> None:
        bench = self._cfg["benchmark"]
        if bench.get("low_memory_mode"):
            # low-mem defaults first, explicit overrides win on top
            merged = _deep_merge(
                bench.get("low_memory", {}), bench.get("pipeline_overrides", {})
            )
            bench["pipeline"] = _deep_merge(bench["pipeline"], merged.get("pipeline", merged))
        elif bench.get("pipeline_overrides"):
            bench["pipeline"] = _deep_merge(
                bench["pipeline"],
                bench["pipeline_overrides"].get(
                    "pipeline", bench["pipeline_overrides"]
                ),
            )

    # ---- access ----------------------------------------------------------

    def get(self, dotted: str, default: Any = None) -> Any:
        node: Any = self._cfg
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def validate(self) -> None:
        missing = [k for k in REQUIRED_KEYS if self.get(k) is None]
        if missing:
            raise ValueError(f"benchmark config missing required keys: {missing}")

    def abs_path(self, dotted: str) -> Path:
        """Resolve a configured path relative to the root dir."""
        value = self.get(dotted)
        if value is None:
            raise KeyError(dotted)
        p = Path(value)
        return p if p.is_absolute() else (self.root_dir / p).resolve()

    def as_dict(self) -> dict[str, Any]:
        return copy.deepcopy(self._cfg)

    def to_pipeline_config(self):
        """Project benchmark.pipeline.* onto a PipelineConfig."""
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig()
        cfg.model_dir = str(self.abs_path("benchmark.models_dir"))
        p = self.get("benchmark.pipeline", {})
        mapping = {
            ("stage1", "model"): "stage1_model",
            ("stage1", "top_k"): "stage1_top_k",
            ("stage1", "batch_size"): "stage1_batch_size",
            ("stage2", "model"): "stage2_model",
            ("stage2", "top_k"): "stage2_top_k",
            ("stage2", "batch_size"): "stage2_batch_size",
            ("stage2", "max_seq_length"): "stage2_max_seq_length",
            ("stage3", "model"): "stage3_model",
            ("stage3", "top_k"): "stage3_top_k",
            ("stage3", "batch_size"): "stage3_batch_size",
            ("stage3", "max_length"): "stage3_max_length",
        }
        for (stage, key), field in mapping.items():
            val = p.get(stage, {}).get(key)
            if val is not None:
                setattr(cfg, field, val)
        return cfg

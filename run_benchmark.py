#!/usr/bin/env python
"""One-shot evaluation workflow (parity: reference run_benchmark.py).

Flow: load config -> ensure LIMIT dataset (download if absent and the
network allows) -> ensure models (pre-placed checkpoints or tiny
fallbacks) -> build pipeline -> run the native evaluation harness ->
print the metric table. ``--mteb`` additionally runs through MTEB v2
when that package is installed.
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def _resolve_config(path):
    """--config YAML, else the shipped configs/default.yaml (which turns
    on the TPU-native device caches + fused search — without it the
    benchmark measures the reference-faithful per-query re-encode
    path), else library defaults."""
    from tristage_rag_tpu.engine.config import PipelineConfig

    if path:
        return PipelineConfig.from_yaml(path)
    shipped = Path(__file__).parent / "configs" / "default.yaml"
    if shipped.exists():
        return PipelineConfig.from_yaml(shipped)
    return PipelineConfig()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="pipeline YAML")
    ap.add_argument("--data-dir", default="./benchmark_data")
    ap.add_argument("--variant", default="limit-small", choices=["limit-small", "limit"])
    ap.add_argument("--max-queries", type=int, default=0, help="0 = all")
    ap.add_argument("--top-k", type=int, default=20)
    ap.add_argument("--stages", default="full", choices=["full", "stage12", "stage1"])
    ap.add_argument("--download", action="store_true", help="try to fetch LIMIT from github")
    ap.add_argument("--download-models", action="store_true")
    ap.add_argument("--low-mem", action="store_true")
    ap.add_argument("--output", default=None, help="write summary JSON here")
    ap.add_argument("--mteb", action="store_true", help="run via MTEB v2 if installed")
    ap.add_argument("--log-level", default="INFO")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the bucket-covering warmup (latency "
                         "numbers then include first-compile time)")
    ap.add_argument(
        "--allow-random-weights", action="store_true",
        help="run even when a stage has no checkpoint (scores will be "
        "meaningless; they are watermarked in the output)",
    )
    ap.add_argument(
        "--preflight", action="store_true",
        help="verify every asset the real run needs (checkpoints, "
        "tokenizers, dataset JSONL) and print the exact command "
        "sequence; no device work",
    )
    args = ap.parse_args()
    logging.basicConfig(level=getattr(logging, args.log_level.upper(), logging.INFO))

    if args.preflight:
        from tristage_rag_tpu.eval.preflight import run_preflight

        return run_preflight(
            _resolve_config(args.config), args.data_dir, args.variant,
            low_mem=args.low_mem, config_path=args.config,
        )

    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
    from tristage_rag_tpu.eval.limit import download_limit, load_limit
    from tristage_rag_tpu.eval.harness import run_evaluation

    if args.download:
        download_limit(args.data_dir, args.variant)
    if args.download_models:
        from tristage_rag_tpu.eval.downloaders import ModelDownloader

        cfg_tmp = _resolve_config(args.config)
        ModelDownloader(cfg_tmp.model_dir).ensure_models_available(args.low_mem)

    try:
        task = load_limit(args.data_dir, args.variant)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    config = _resolve_config(args.config)
    pipeline = RetrievalPipeline(config)

    # Refuse to print authoritative-looking quality numbers from
    # random-init stages (a missing/corrupt checkpoint must not
    # masquerade as a real NDCG score).
    pipeline.initialize_stages()
    random_weights = not pipeline.all_weights_loaded()
    if random_weights:
        banner = (
            "=" * 70 + "\n"
            "WARNING: at least one stage is serving RANDOM-INIT weights\n"
            "(no checkpoint found under model_dir). Quality metrics from\n"
            "this run are MEANINGLESS.\n" + "=" * 70
        )
        print(banner, file=sys.stderr)
        if not args.allow_random_weights:
            print(
                "refusing to run; pass --allow-random-weights to override",
                file=sys.stderr,
            )
            return 3

    if args.mteb:
        try:
            import mteb  # noqa: F401
        except ImportError:
            print("mteb not installed; falling back to native harness", file=sys.stderr)
            args.mteb = False
    if args.mteb:
        # run through the REAL MTEB evaluator (reference parity:
        # run_benchmark.py:188-201); fall back to the native harness on
        # any failure so the run still produces numbers
        from tristage_rag_tpu.eval.mteb_adapter import run_mteb

        try:
            _, main_scores = run_mteb(
                pipeline, args.data_dir, args.variant, top_k=args.top_k
            )
            print("\n=== MTEB v2 results ===")
            for name, score in main_scores.items():
                print(f"  {name}: ndcg_at_10 = {score:.4f}")
            if args.output:
                Path(args.output).write_text(json.dumps(
                    {"mteb": main_scores,
                     "weights_loaded": not random_weights},
                    indent=2,
                ))
            return 0
        except Exception as e:
            print(f"MTEB run failed ({e}); falling back to native harness",
                  file=sys.stderr)

    summary = run_evaluation(
        pipeline, task,
        top_k=args.top_k, max_queries=args.max_queries, stages=args.stages,
        warmup=not args.no_warmup,
    )
    m = summary["metrics"]
    summary["weights_loaded"] = not random_weights
    header = "" if not random_weights else " *** RANDOM WEIGHTS ***"
    print(f"\n=== {summary['task']} [{summary['stages']}] "
          f"({summary['num_queries']} queries, {summary['num_docs']} docs)"
          f"{header} ===")
    for k in ("ndcg_at_10", "recall_at_10", "map_at_10", "mrr_at_10",
              "recall_at_100", "main_score"):
        if k in m:
            print(f"  {k:>14}: {m[k]:.4f}")
    print(f"  {'qps':>14}: {summary['qps']:.2f}")
    print(f"  {'p50 latency':>14}: {summary['latency_p50_ms']:.1f} ms")
    if args.output:
        Path(args.output).write_text(json.dumps(summary, indent=2, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())

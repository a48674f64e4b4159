"""A/B harness: BM25 fusion off vs on.

Parity with non_mcp/ab_compare.py: builds two pipelines with isolated
index dirs under ``./ab_runs/`` (:48-63, :99-106), indexes the same
documents into both, runs the same queries, prints side-by-side
timings + top-1 results, and declares a winner by top-1 final score
(:131-150).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path
from typing import Any, Optional, Sequence

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline


def _final_score(r: dict[str, Any]) -> float:
    for key in ("stage3_score", "stage2_score", "stage1_score", "score"):
        if key in r and r[key] is not None:
            return float(r[key])
    return 0.0


def run_ab(
    base_config: PipelineConfig,
    documents: Sequence[str],
    queries: Sequence[str],
    runs_dir: str | Path = "./ab_runs",
) -> dict[str, Any]:
    runs_dir = Path(runs_dir)
    arms = {}
    for name, bm25 in (("bm25_off", False), ("bm25_on", True)):
        cfg = dataclasses.replace(
            base_config,
            stage1_enable_bm25=bm25,
            index_dir=str(runs_dir / name / "index"),
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(list(documents))
        arms[name] = p

    comparisons = []
    wins = {"bm25_off": 0, "bm25_on": 0}
    for q in queries:
        row: dict[str, Any] = {"query": q}
        for name, p in arms.items():
            out = p.search(q)
            top = out["results"][0] if out["results"] else None
            row[name] = {
                "total_time": out["timing"]["total_time"],
                "top1": top["document"][:80] if top else None,
                "top1_score": _final_score(top) if top else 0.0,
            }
        winner = max(arms, key=lambda n: row[n]["top1_score"])
        row["winner"] = winner
        wins[winner] += 1
        comparisons.append(row)
    overall = max(wins, key=wins.get)
    return {"comparisons": comparisons, "wins": wins, "overall_winner": overall}


def main(argv: Optional[list[str]] = None) -> int:
    ap = argparse.ArgumentParser(description="A/B compare BM25 fusion off vs on")
    ap.add_argument("--docs", required=True, help="JSON file: list of documents")
    ap.add_argument("--queries", required=True, nargs="+")
    ap.add_argument("--config", default=None)
    ap.add_argument("--runs-dir", default="./ab_runs")
    args = ap.parse_args(argv)
    docs = json.loads(Path(args.docs).read_text())
    if isinstance(docs, dict):
        docs = docs.get("documents", [])
    cfg = PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    out = run_ab(cfg, docs, args.queries, args.runs_dir)
    for row in out["comparisons"]:
        print(f"\n=== {row['query']} ===")
        for arm in ("bm25_off", "bm25_on"):
            a = row[arm]
            print(f"  {arm:9s} score={a['top1_score']:.4f} "
                  f"t={a['total_time'] * 1e3:.0f}ms :: {a['top1']}")
        print(f"  winner: {row['winner']}")
    print(f"\noverall winner: {out['overall_winner']} ({out['wins']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

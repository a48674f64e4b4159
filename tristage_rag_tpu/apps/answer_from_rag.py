"""Full-RAG CLI: retrieve top-k contexts, generate an answer.

Parity with non_mcp/answer_from_rag.py:44-93 — prints the generated
answer followed by the retrieved contexts with scores.
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import Optional

from tristage_rag_tpu.apps.generation import GenerationConfig, SimpleGenerator, answer_from_rag
from tristage_rag_tpu.apps.respond import ingest_directory
from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline


def main(argv: Optional[list[str]] = None) -> int:
    ap = argparse.ArgumentParser(description="retrieve contexts and generate an answer")
    ap.add_argument("question")
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--config", default=None)
    ap.add_argument("--docs-dir", help="ingest .txt/.md files first")
    ap.add_argument("--gen-model", default="google/flan-t5-small")
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.7)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.WARNING)

    cfg = PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    pipeline = RetrievalPipeline(cfg)
    if not pipeline.load_index() and not args.docs_dir:
        print("no index found; pass --docs-dir to ingest documents", file=sys.stderr)
    if args.docs_dir:
        n = ingest_directory(pipeline, args.docs_dir)
        print(f"ingested {n} documents", file=sys.stderr)

    gen = SimpleGenerator(GenerationConfig(
        model_name=args.gen_model,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
    ))
    out = answer_from_rag(pipeline, args.question, top_k=args.top_k, generator=gen)
    print(f"\n=== Answer ({out['backend']}) ===\n{out['answer']}\n")
    print("=== Contexts ===")
    for i, r in enumerate(out["contexts"], 1):
        print(f"[{i}] (s3={r.get('stage3_score', 0):.4f}) {r['document'][:200]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

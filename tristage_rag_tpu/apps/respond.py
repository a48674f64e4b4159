"""Minimal answer CLI: top stage-3 passage with a source footer.

Parity with non_mcp/respond_stage3.py: optional directory ingest of
.txt/.md files (metadata: source path + title from filename, :35-63),
full tri-stage search, answer = top-1 stage-3 passage +
``[source][stage3_score]`` footer (:66-116).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path
from typing import Any, Optional

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

logger = logging.getLogger(__name__)


def ingest_directory(pipeline: RetrievalPipeline, path: str | Path) -> int:
    docs, metas = [], []
    for f in sorted(Path(path).rglob("*")):
        if f.is_file() and f.suffix.lower() in (".txt", ".md"):
            text = f.read_text(encoding="utf-8", errors="replace").strip()
            if text:
                docs.append(text)
                metas.append({"source": str(f), "title": f.stem})
    if docs:
        pipeline.add_documents(docs, metas)
    return len(docs)


def respond(pipeline: RetrievalPipeline, query: str) -> dict[str, Any]:
    out = pipeline.search(query, top_k=1)
    if not out["results"]:
        return {"answer": "No relevant passages found.", "result": None}
    top = out["results"][0]
    source = top.get("metadata", {}).get("source", "unknown")
    footer = f"[{source}][stage3_score={top.get('stage3_score', 0.0):.4f}]"
    return {"answer": f"{top['document']}\n{footer}", "result": top}


def main(argv: Optional[list[str]] = None) -> int:
    ap = argparse.ArgumentParser(description="answer from top stage-3 passage")
    ap.add_argument("query")
    ap.add_argument("--docs-dir", help="ingest .txt/.md files first")
    ap.add_argument("--config", default=None)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.WARNING)
    cfg = PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    pipeline = RetrievalPipeline(cfg)
    if not pipeline.load_index() and not args.docs_dir:
        print("no index found; pass --docs-dir to ingest documents", file=sys.stderr)
    if args.docs_dir:
        n = ingest_directory(pipeline, args.docs_dir)
        print(f"ingested {n} documents", file=sys.stderr)
    print(respond(pipeline, args.query)["answer"])
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Batch embed + interactive query CLI.

Parity with non_mcp/embed_and_query.py: multi-format extraction and
chunking with max-files/max-chunks budgets (:84-115), then a query loop
printing per-stage timings and per-result s1/s2/s3 scores (:190-203).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path
from typing import Optional

from tristage_rag_tpu.apps.chunker import chunk_text, extract_text
from tristage_rag_tpu.apps.cli import RetrievalApp, _print_results
from tristage_rag_tpu.engine.config import PipelineConfig

logger = logging.getLogger(__name__)

SUPPORTED = (".txt", ".md", ".markdown", ".json", ".pdf", ".docx")


def embed_path(
    app: RetrievalApp,
    path: str | Path,
    chunk_size: int = 1000,
    overlap: int = 200,
    max_files: int = 0,
    max_chunks: int = 0,
) -> dict[str, int]:
    path = Path(path)
    files = (
        [path]
        if path.is_file()
        else [f for f in sorted(path.rglob("*"))
              if f.is_file() and f.suffix.lower() in SUPPORTED]
    )
    if max_files > 0:
        files = files[:max_files]
    n_files = n_chunks = 0
    for f in files:
        try:
            text = extract_text(f)
        except Exception as e:
            logger.warning("skipping %s: %s", f, e)
            continue
        chunks = chunk_text(text, chunk_size, overlap)
        if max_chunks > 0:
            chunks = chunks[: max(max_chunks - n_chunks, 0)]
        if not chunks:
            continue
        added = app.add_documents(chunks, source=str(f))
        n_files += 1
        n_chunks += added
        if max_chunks > 0 and n_chunks >= max_chunks:
            break
    return {"files": n_files, "chunks": n_chunks}


def main(argv: Optional[list[str]] = None) -> int:
    ap = argparse.ArgumentParser(description="batch embed files, then query")
    ap.add_argument("path", help="file or directory to embed")
    ap.add_argument("--config", default=None)
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--chunk-size", type=int, default=1000)
    ap.add_argument("--overlap", type=int, default=200)
    ap.add_argument("--max-files", type=int, default=0)
    ap.add_argument("--max-chunks", type=int, default=0)
    ap.add_argument("--query", help="one-shot query (skip the loop)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.WARNING)
    cfg = PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    app = RetrievalApp(cfg, data_dir=args.data_dir)
    app.startup()
    stats = embed_path(
        app, args.path, args.chunk_size, args.overlap,
        args.max_files, args.max_chunks,
    )
    print(f"embedded {stats['chunks']} chunks from {stats['files']} files")
    if args.query:
        _print_results(app.search(args.query))
        return 0
    while True:
        try:
            q = input("\nquery> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q or q in ("exit", "quit"):
            break
        _print_results(app.search(q))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Standalone CLI app (interactive menu + one-shot modes).

Parity with non_mcp/main.py: document manager persistence, interactive
menu (add/load/view/search/batch/info/export/clear), ``--query``
one-shot, ``--load`` file ingest, ``--config`` YAML, ``--webui`` to
launch the web UI. One deliberate divergence (SURVEY.md §1): this app
drives the SAME RetrievalPipeline orchestrator as every other
front-end instead of re-implementing the funnel with different top-ks.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Optional

from tristage_rag_tpu.apps.chunker import extract_documents
from tristage_rag_tpu.apps.docmanager import DocumentManager
from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

logger = logging.getLogger(__name__)


class RetrievalApp:
    """Pipeline + document store + persisted index, as one unit."""

    def __init__(self, config: PipelineConfig, data_dir: str = "./data"):
        self.config = config
        self.pipeline = RetrievalPipeline(config)
        self.docs = DocumentManager(data_dir)
        self.search_history: list[dict[str, Any]] = []
        self._index_loaded = False

    def startup(self) -> None:
        """Load persisted index, else re-index the stored documents
        (re-applying deletion tombstones so deleted docs don't
        resurrect from the raw store)."""
        if self.pipeline.load_index():
            self._index_loaded = True
            logger.info("loaded persisted index")
        elif self.docs.documents:
            self.pipeline.add_documents(self.docs.documents, self.docs.metadata)
            deleted = self.docs.deleted_indices
            if deleted:
                self.pipeline.delete_documents(deleted)
            self.pipeline.save_index()

    def add_documents(
        self, documents: list[str], source: str = "manual",
        metadata: Optional[list[dict]] = None,
    ) -> int:
        new_docs = self.docs.add(documents, source=source, metadata=metadata)
        if new_docs:
            self.pipeline.add_documents(
                new_docs, [{"source": source} for _ in new_docs]
            )
            self.pipeline.save_index()
        return len(new_docs)

    def load_file(self, path: str | Path) -> int:
        docs = extract_documents(path)
        return self.add_documents(docs, source=str(path))

    def load_directory(self, path: str | Path) -> int:
        total = 0
        for f in sorted(Path(path).rglob("*")):
            if f.is_file() and f.suffix.lower() in (".txt", ".md", ".json"):
                try:
                    total += self.load_file(f)
                except Exception as e:
                    logger.warning("skipping %s: %s", f, e)
        return total

    def search(self, query: str, top_k: Optional[int] = None) -> dict[str, Any]:
        out = self.pipeline.search(query, top_k)
        self.search_history.append(
            {"query": query, "timestamp": time.time(),
             "num_results": len(out["results"]), "timing": out["timing"]}
        )
        if len(self.search_history) > 100:
            self.search_history = self.search_history[-100:]
        return out

    def delete_documents(self, doc_ids) -> int:
        """Tombstone documents by pipeline doc_id — in the index AND
        the raw doc store, so a rebuild-from-store can't resurrect
        them."""
        out = self.pipeline.delete_documents(doc_ids)
        if self.pipeline.stage1 is not None:
            self.docs.mark_deleted(
                set(int(i) for i in doc_ids)
                & self.pipeline.stage1.deleted_ids
            )
        self.pipeline.save_index()
        return out["documents_deleted"]

    def clear_all_data(self) -> None:
        self.docs.clear()
        self.pipeline.clear_index()
        self.pipeline.save_index()

    def info(self) -> dict[str, Any]:
        return {
            "documents": self.docs.stats(),
            "pipeline": self.pipeline.get_pipeline_info(),
        }

    def export_history(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.search_history, indent=2, default=str))


def _print_results(out: dict[str, Any]) -> None:
    t = out["timing"]
    times = " ".join(
        f"{k.split('_')[0]}={t[k] * 1e3:.0f}ms" for k in
        ("stage1_time", "stage2_time", "stage3_time", "total_time")
        if t.get(k) is not None
    )
    print(f"\n{len(out['results'])} results ({times})")
    for rank, r in enumerate(out["results"], 1):
        scores = " ".join(
            f"{k[:-6]}={r[k]:.4f}" for k in ("stage1_score", "stage2_score", "stage3_score")
            if k in r
        )
        doc = r["document"][:160].replace("\n", " ")
        print(f"{rank:>3}. [{r['doc_id']}] {scores}\n     {doc}")


_MENU = """
=== TriStage-TPU Retrieval ===
1. Add documents (manual entry)
2. Load documents from file
3. Load documents from directory
4. View documents
5. Search
6. Batch search
7. System info
8. Export search history
9. Clear all data
d. Delete documents by id
0. Exit
"""


def interactive_loop(app: RetrievalApp) -> None:
    while True:
        print(_MENU)
        try:
            choice = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        try:
            if choice == "0":
                break
            elif choice == "1":
                print("Enter documents, one per line; blank line to finish:")
                docs = []
                while True:
                    line = input()
                    if not line.strip():
                        break
                    docs.append(line.strip())
                n = app.add_documents(docs)
                print(f"added {n} new documents")
            elif choice == "2":
                n = app.load_file(input("file path: ").strip())
                print(f"added {n} new documents")
            elif choice == "3":
                n = app.load_directory(input("directory path: ").strip())
                print(f"added {n} new documents")
            elif choice == "4":
                for i, d in enumerate(app.docs.documents[:50]):
                    print(f"[{i}] {d[:100]}")
                if len(app.docs.documents) > 50:
                    print(f"... and {len(app.docs.documents) - 50} more")
            elif choice == "5":
                _print_results(app.search(input("query: ").strip()))
            elif choice == "6":
                print("Enter queries, one per line; blank line to finish:")
                queries = []
                while True:
                    line = input()
                    if not line.strip():
                        break
                    queries.append(line.strip())
                for q in queries:
                    print(f"\n=== {q} ===")
                    _print_results(app.search(q))
            elif choice == "7":
                print(json.dumps(app.info(), indent=2, default=str))
            elif choice == "8":
                path = input("export path [search_history.json]: ").strip() or "search_history.json"
                app.export_history(path)
                print(f"exported to {path}")
            elif choice == "9":
                if input("clear ALL data? (yes/no): ").strip() == "yes":
                    app.clear_all_data()
                    print("cleared")
            elif choice.lower() == "d":
                raw = input("doc ids (space-separated): ").strip()
                ids = [int(x) for x in raw.split() if x.lstrip("-").isdigit()]
                print(f"deleted {app.delete_documents(ids)} documents")
            else:
                print("unknown option")
        except Exception as e:
            print(f"error: {e}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tristage-tpu", description="TPU-native 3-stage retrieval"
    )
    p.add_argument("--config", help="pipeline YAML config path")
    p.add_argument("--query", help="one-shot search query")
    p.add_argument("--load", help="ingest a file before running")
    p.add_argument("--load-dir", help="ingest a directory before running")
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--data-dir", default="./data")
    p.add_argument("--webui", action="store_true", help="start the web UI")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--log-level", default="INFO")
    return p


def main(argv: Optional[list[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=getattr(logging, args.log_level.upper(), logging.INFO))
    config = (
        PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    )
    app = RetrievalApp(config, data_dir=args.data_dir)
    app.startup()
    if args.load:
        print(f"loaded {app.load_file(args.load)} documents from {args.load}")
    if args.load_dir:
        print(f"loaded {app.load_directory(args.load_dir)} documents from {args.load_dir}")
    if args.webui:
        from tristage_rag_tpu.apps.webui import serve

        serve(app, host=args.host, port=args.port)
        return 0
    if args.query:
        _print_results(app.search(args.query, args.top_k))
        return 0
    interactive_loop(app)
    return 0


if __name__ == "__main__":
    sys.exit(main())

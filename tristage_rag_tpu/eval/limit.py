"""LIMIT dataset loading + download (google-deepmind/limit).

Parity with benchmark/limit_mteb_tasks.py:56-170 (JSONL loading of
queries/corpus/qrels with ``_id`` / ``query-id`` / ``corpus-id`` keys)
and benchmark/download_limit_dataset.py:30-128 (github-raw download
with skip-if-exists and JSONL validation). Download is gated on network
availability — this environment is zero-egress, so local files are the
primary path.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path

logger = logging.getLogger(__name__)

_BASE_URL = "https://raw.githubusercontent.com/google-deepmind/limit/main/data"
_FILES = ("queries.jsonl", "corpus.jsonl", "qrels.jsonl")
VARIANTS = ("limit-small", "limit")


@dataclasses.dataclass
class RetrievalTask:
    """A BEIR/MTEB-shaped retrieval task."""

    name: str
    corpus: dict[str, dict[str, str]]  # id -> {text, title}
    queries: dict[str, str]  # id -> text
    qrels: dict[str, dict[str, int]]  # qid -> {did -> score}
    main_score: str = "ndcg_at_10"

    def subsample(self, max_queries: int) -> "RetrievalTask":
        if max_queries <= 0 or max_queries >= len(self.queries):
            return self
        keep = dict(list(sorted(self.queries.items()))[:max_queries])
        qrels = {q: dict(self.qrels.get(q, {})) for q in keep}
        return dataclasses.replace(self, queries=keep, qrels=qrels)


def _candidate_dirs(data_dir: str | Path, variant: str) -> list[Path]:
    base = Path(data_dir)
    return [
        base / variant,
        base / "limit" / variant,
        base / "datasets" / variant,
        base,
    ]


def load_limit(
    data_dir: str | Path, variant: str = "limit-small"
) -> RetrievalTask:
    """Load a LIMIT variant from local JSONL files."""
    if variant not in VARIANTS:
        raise ValueError(f"unknown LIMIT variant {variant!r}")
    path = None
    for cand in _candidate_dirs(data_dir, variant):
        if all((cand / f).exists() for f in _FILES):
            path = cand
            break
    if path is None:
        raise FileNotFoundError(
            f"LIMIT {variant} not found under {data_dir}; expected "
            f"queries.jsonl/corpus.jsonl/qrels.jsonl (run "
            f"tristage_rag_tpu.eval.limit.download_limit or place files "
            f"manually)"
        )
    queries: dict[str, str] = {}
    with open(path / "queries.jsonl", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                d = json.loads(line)
                queries[str(d["_id"])] = d.get("text", "")
    corpus: dict[str, dict[str, str]] = {}
    with open(path / "corpus.jsonl", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                d = json.loads(line)
                corpus[str(d["_id"])] = {
                    "text": d.get("text", ""),
                    "title": d.get("title", ""),
                }
    qrels: dict[str, dict[str, int]] = {}
    with open(path / "qrels.jsonl", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                d = json.loads(line)
                qrels.setdefault(str(d["query-id"]), {})[str(d["corpus-id"])] = int(
                    d.get("score", 1)
                )
    logger.info(
        "loaded LIMIT %s: %d queries, %d docs, %d qrels",
        variant, len(queries), len(corpus), len(qrels),
    )
    return RetrievalTask(name=variant, corpus=corpus, queries=queries, qrels=qrels)


def download_limit(
    data_dir: str | Path,
    variant: str = "limit-small",
    force: bool = False,
    timeout: float = 30.0,
) -> bool:
    """Fetch the LIMIT JSONL files from github raw (skip-if-exists)."""
    import urllib.request

    dest = Path(data_dir) / variant
    dest.mkdir(parents=True, exist_ok=True)
    ok = True
    for fname in _FILES:
        target = dest / fname
        if target.exists() and not force:
            logger.info("%s exists, skipping", target)
            continue
        url = f"{_BASE_URL}/{variant}/{fname}"
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r:
                data = r.read()
            # validate JSONL before writing
            for line in data.decode("utf-8").splitlines():
                if line.strip():
                    json.loads(line)
            target.write_bytes(data)
            logger.info("downloaded %s (%d bytes)", target, len(data))
        except Exception as e:
            logger.warning("failed to download %s: %s", url, e)
            ok = False
    return ok

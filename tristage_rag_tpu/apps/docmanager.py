"""Raw-document persistence with dedup and source counters.

Parity with non_mcp/main.py:53-129 (DocumentManager): stores raw docs +
metadata with exact-string dedup and per-source counts — but as JSON,
never pickle (SURVEY.md §5.4). Also maintains the web UI's ingest
manifest: a SHA-256 text-hash set recording what has been embedded,
for resume/dedup of ingestion (webui/app.py:71-109).
"""

from __future__ import annotations

import hashlib
import json
import logging
from pathlib import Path
from typing import Any, Optional

logger = logging.getLogger(__name__)


def text_hash(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


class DocumentManager:
    def __init__(self, data_dir: str | Path = "./data"):
        self.data_dir = Path(data_dir)
        self.docs_file = self.data_dir / "documents.json"
        self.manifest_file = self.data_dir / "embedded_manifest.json"
        self.documents: list[str] = []
        self.metadata: list[dict[str, Any]] = []
        self._seen: set[str] = set()
        self.source_counts: dict[str, int] = {}
        self._manifest_cache: Optional[set[str]] = None
        self._load()

    def _load(self) -> None:
        if self.docs_file.exists():
            try:
                payload = json.loads(self.docs_file.read_text())
                self.documents = payload.get("documents", [])
                self.metadata = payload.get("metadata", [])
                self.source_counts = payload.get("source_counts", {})
                self._seen = {text_hash(d) for d in self.documents}
                logger.info("loaded %d documents from %s", len(self.documents), self.docs_file)
            except Exception as e:
                logger.warning("failed to load document store: %s", e)

    def save(self) -> None:
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.docs_file.write_text(
            json.dumps(
                {
                    "documents": self.documents,
                    "metadata": self.metadata,
                    "source_counts": self.source_counts,
                }
            )
        )

    def add(
        self,
        documents: list[str],
        source: str = "manual",
        metadata: Optional[list[dict[str, Any]]] = None,
    ) -> list[str]:
        """Add docs, skipping exact duplicates. Returns the NEW docs."""
        if metadata is None:
            metadata = [{} for _ in documents]
        new_docs = []
        for doc, meta in zip(documents, metadata):
            h = text_hash(doc)
            if h in self._seen or not doc.strip():
                continue
            self._seen.add(h)
            self.documents.append(doc)
            m = dict(meta)
            m.setdefault("source", source)
            self.metadata.append(m)
            self.source_counts[source] = self.source_counts.get(source, 0) + 1
            new_docs.append(doc)
        if new_docs:
            self.save()
        return new_docs

    def clear(self) -> None:
        self.documents = []
        self.metadata = []
        self._seen = set()
        self.source_counts = {}
        self._manifest_cache = None
        for f in (self.docs_file, self.manifest_file):
            if f.exists():
                f.unlink()

    def stats(self) -> dict[str, Any]:
        deleted = len(self.deleted_indices)
        return {
            "total_documents": len(self.documents) - deleted,
            "deleted_documents": deleted,
            "sources": dict(self.source_counts),
        }

    # ---- deletion tombstones ---------------------------------------------

    def mark_deleted(self, indices) -> int:
        """Flag documents deleted WITHOUT removing them: positions must
        stay aligned with pipeline doc ids, and a rebuild-from-store
        (RetrievalApp.startup when index files are missing) re-applies
        these tombstones instead of resurrecting deleted docs."""
        n = 0
        for i in indices:
            i = int(i)
            if 0 <= i < len(self.metadata) and not self.metadata[i].get("deleted"):
                self.metadata[i]["deleted"] = True
                n += 1
        if n:
            self.save()
        return n

    @property
    def deleted_indices(self) -> list[int]:
        return [i for i, m in enumerate(self.metadata) if m.get("deleted")]

    # ---- embed manifest (webui/app.py:71-109) ---------------------------

    def _manifest_hashes(self) -> set[str]:
        """In-memory manifest cache — is_embedded runs per chunk on the
        ingest hot path; re-reading the JSON file each time made ingest
        I/O quadratic."""
        if getattr(self, "_manifest_cache", None) is None:
            hashes: set[str] = set()
            if self.manifest_file.exists():
                try:
                    hashes = set(
                        json.loads(self.manifest_file.read_text())["hashes"]
                    )
                except Exception:
                    pass
            self._manifest_cache = hashes
        return self._manifest_cache

    def is_embedded(self, text: str) -> bool:
        return text_hash(text) in self._manifest_hashes()

    def mark_embedded(self, texts: list[str]) -> None:
        hashes = self._manifest_hashes()
        hashes.update(text_hash(t) for t in texts)
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.manifest_file.write_text(json.dumps({"hashes": sorted(hashes)}))

    def embedded_count(self) -> int:
        return len(self._manifest_hashes())

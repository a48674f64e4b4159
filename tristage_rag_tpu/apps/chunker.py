"""Document chunking + multi-format text extraction for ingestion.

Parity with the reference web UI's chunker (non_mcp/webui/app.py:110-133,
duplicated at non_mcp/embed_and_query.py:31-53): fixed-size character
chunks (default 1000) with overlap (default 200) and sentence-boundary
snapping — if a sentence end ('. ', '! ', '? ', newline) occurs in the
last 40% of the window, the chunk snaps to it.

Extraction (webui/app.py:135-202): .txt/.md read as utf-8; .json as a
list of strings or {"documents": [...]}; .pdf via pypdf and .docx via
python-docx when installed (gated imports — optional deps).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

logger = logging.getLogger(__name__)

_SENTENCE_ENDS = (". ", "! ", "? ", "\n")


def chunk_text(
    text: str, chunk_size: int = 1000, overlap: int = 200
) -> list[str]:
    """Split text into overlapping chunks, snapping to sentence ends."""
    text = text.strip()
    if not text:
        return []
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    overlap = max(0, min(overlap, chunk_size - 1))
    chunks: list[str] = []
    start = 0
    n = len(text)
    while start < n:
        end = min(start + chunk_size, n)
        if end < n:
            window = text[start:end]
            best = -1
            for sep in _SENTENCE_ENDS:
                pos = window.rfind(sep)
                if pos > best:
                    best = pos + len(sep)
            # snap only if the boundary falls in the last 40% of the window
            if best >= int(chunk_size * 0.6):
                end = start + best
        piece = text[start:end].strip()
        if piece:
            chunks.append(piece)
        if end >= n:
            break
        start = max(end - overlap, start + 1)
    return chunks


def extract_text(path: str | Path) -> str:
    """Extract plain text from txt/md/json/pdf/docx files."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".txt", ".md", ".markdown", ""):
        return path.read_text(encoding="utf-8", errors="replace")
    if suffix == ".json":
        data = json.loads(path.read_text(encoding="utf-8"))
        if isinstance(data, dict) and "documents" in data:
            data = data["documents"]
        if isinstance(data, list):
            return "\n\n".join(str(d) for d in data)
        return str(data)
    if suffix == ".pdf":
        try:
            from pypdf import PdfReader
        except ImportError as e:
            raise RuntimeError("pypdf not installed; cannot read PDFs") from e
        reader = PdfReader(str(path))
        return "\n".join(page.extract_text() or "" for page in reader.pages)
    if suffix == ".docx":
        try:
            import docx
        except ImportError as e:
            raise RuntimeError("python-docx not installed; cannot read .docx") from e
        d = docx.Document(str(path))
        return "\n".join(p.text for p in d.paragraphs)
    raise ValueError(f"unsupported file type: {suffix}")


def extract_documents(path: str | Path) -> list[str]:
    """Extract a file into a list of documents (JSON lists stay lists;
    .txt splits on blank lines, matching non_mcp/main.py's loader)."""
    path = Path(path)
    if path.suffix.lower() == ".json":
        data = json.loads(path.read_text(encoding="utf-8"))
        if isinstance(data, dict) and "documents" in data:
            data = data["documents"]
        if isinstance(data, list):
            return [str(d) for d in data if str(d).strip()]
        return [str(data)]
    text = extract_text(path)
    parts = [p.strip() for p in text.split("\n\n")]
    return [p for p in parts if p]

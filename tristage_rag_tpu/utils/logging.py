"""Logging setup shared by the entry points.

The reference calls ``logging.basicConfig`` with ad-hoc file+console
handlers in every runner (SURVEY.md §5.5); this is the one shared
helper. Plain-text by default; ``structured=True`` emits one JSON
object per line (what the reference's declared-but-unused structlog
dependency was presumably for).
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Optional


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "ts": self.formatTime(record),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
        }
        if record.exc_info:
            payload["exc"] = self.formatException(record.exc_info)
        return json.dumps(payload)


def setup_logging(
    level: str = "INFO",
    log_file: Optional[str] = None,
    structured: bool = False,
) -> None:
    root = logging.getLogger()
    root.setLevel(getattr(logging, level.upper(), logging.INFO))
    fmt: logging.Formatter = (
        JsonFormatter()
        if structured
        else logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(fmt)
    root.handlers = [console]
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        root.addHandler(fh)

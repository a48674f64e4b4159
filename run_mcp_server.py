#!/usr/bin/env python
"""Run the MCP stdio server (parity: reference run_mcp_server.py /
run_mcp_server_config.py — one runner, optional --config)."""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def load_dotenv(path: str = ".env") -> None:
    p = Path(path)
    if not p.exists():
        return
    for line in p.read_text().splitlines():
        line = line.strip()
        if line and not line.startswith("#") and "=" in line:
            k, v = line.split("=", 1)
            v = v.strip()
            # the common dotenv convention quotes values; the quotes
            # are not part of the value
            if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
                v = v[1:-1]
            os.environ.setdefault(k.strip(), v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="pipeline YAML (e.g. configs/default.yaml)")
    args = ap.parse_args()
    # Resolve user-relative paths BEFORE chdir-ing to the repo root:
    # a relative --config and the invocation dir's .env refer to the
    # user's cwd, not the script's directory.
    config = str(Path(args.config).resolve()) if args.config else None
    load_dotenv()  # user's cwd .env first...
    os.chdir(Path(__file__).parent)
    load_dotenv()  # ...then the repo's (setdefault keeps cwd values)
    from tristage_rag_tpu.serve.mcp_server import main as serve_main

    serve_main(config)


if __name__ == "__main__":
    main()

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
            os.environ.setdefault(k.strip(), v.strip())


def main() -> None:
    os.chdir(Path(__file__).parent)
    load_dotenv()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="pipeline YAML (e.g. configs/default.yaml)")
    args = ap.parse_args()
    from tristage_rag_tpu.serve.mcp_server import main as serve_main

    serve_main(args.config)


if __name__ == "__main__":
    main()

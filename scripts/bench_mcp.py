"""MCP server under concurrent load with incremental index adds.

The last BASELINE.md §4 benchmark config: drive the stdio MCP server
(serve/mcp_server.py) with C concurrent clients issuing search
tool-calls while add_documents calls interleave, and measure search
QPS + latency percentiles end-to-end THROUGH the JSON-RPC layer (so
micro-batching, the single pipeline worker thread, and response
serialization are all inside the measured path).

Timing is honest by construction on every backend: a response is only
written after the pipeline really produced results, so each latency
sample spans request-write -> response-read.

Usage:
  python scripts/bench_mcp.py                 # tiny models (CPU ok)
  python scripts/bench_mcp.py --full          # full-size architectures
  python scripts/bench_mcp.py --clients 16 --queries 200 --add-every 25
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import asyncio
import json
import time


class _QueueWriter:
    """Writer end of the server's stdio transport: parses each response
    line and hands it to the bench as soon as the server writes it."""

    def __init__(self):
        self.queue: asyncio.Queue = asyncio.Queue()
        self._buf = b""

    def write(self, data: bytes):
        self._buf += data
        while b"\n" in self._buf:
            line, self._buf = self._buf.split(b"\n", 1)
            if line.strip():
                self.queue.put_nowait(json.loads(line))

    async def drain(self):
        pass


def _seed_docs(n: int) -> list[str]:
    themes = [
        "sparse lexical retrieval with inverted indexes",
        "dense embedding search over HBM resident matrices",
        "late interaction scoring with per token embeddings",
        "cross encoder reranking of query document pairs",
        "reciprocal rank fusion of candidate lists",
        "systolic array matrix multiplication in bfloat16",
    ]
    return [
        f"Document {i}: {themes[i % len(themes)]} variant {i}."
        for i in range(n)
    ]


async def _bench(args) -> dict:
    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
    from tristage_rag_tpu.serve.mcp_server import RetrievalMCPServer

    cache_kw = dict(enable_result_cache=bool(args.result_cache))
    if args.config:
        # bench any YAML profile (e.g. configs/scale.yaml) end-to-end
        # through the serving stack
        cfg = PipelineConfig.from_yaml(args.config)
        if args.no_result_cache:
            cfg.enable_result_cache = False  # A/B: force OFF over YAML
        else:
            cfg.enable_result_cache = (
                cfg.enable_result_cache or bool(args.result_cache)
            )
    elif args.full:
        cfg = PipelineConfig(stage2_cache_doc_embeddings=True, **cache_kw)
    else:
        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=20, stage2_top_k=10,
            stage3_top_k=5, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            mesh_data_parallel=1, stage2_cache_doc_embeddings=True,
            **cache_kw,
        )
    if args.pipelined:
        cfg.serve_pipelined = True
    pipeline = RetrievalPipeline(cfg)
    pipeline.add_documents(_seed_docs(args.docs))
    pipeline.warmup()
    server = RetrievalMCPServer(pipeline)

    reader = asyncio.StreamReader()
    writer = _QueueWriter()
    server_task = asyncio.create_task(server.run(reader, writer))

    def send(mid: int, name: str, arguments: dict):
        reader.feed_data((json.dumps({
            "jsonrpc": "2.0", "id": mid, "method": "tools/call",
            "params": {"name": name, "arguments": arguments},
        }) + "\n").encode())

    base_queries = [
        "dense embedding search", "token level late interaction",
        "rank fusion of lists", "bfloat16 matrix tiles",
        "inverted index lexical scoring", "rerank pairs with cross encoder",
    ]
    if args.zipf > 0:
        # Skewed serving workload (VERDICT r2 next-7): a pool of
        # distinct queries drawn Zipf(s) — the regime where the result
        # cache pays. rank-k probability ∝ 1/k^s.
        import numpy as np

        pool = [
            f"{base_queries[i % len(base_queries)]} variant {i}"
            for i in range(args.query_pool)
        ]
        w = 1.0 / np.arange(1, len(pool) + 1, dtype=np.float64) ** args.zipf
        w /= w.sum()
        rng = np.random.default_rng(0)
        draw = rng.choice(len(pool), size=8192, p=w)
        queries = [pool[i] for i in draw]
    else:
        queries = base_queries

    sent: dict[int, tuple[str, float]] = {}
    search_lat: list[float] = []
    add_lat: list[float] = []
    errors = 0
    add_errors = 0
    next_id = 0
    completed_searches = 0
    adds_sent = 0

    def issue_search():
        nonlocal next_id
        q = queries[next_id % len(queries)]
        sent[next_id] = ("search", time.perf_counter())
        send(next_id, "search", {"query": q, "top_k": 5})
        next_id += 1

    def issue_add():
        nonlocal next_id, adds_sent
        sent[next_id] = ("add", time.perf_counter())
        send(next_id, "add_documents", {"documents": [
            f"Fresh document {adds_sent}: incremental corpus growth "
            f"under live search load."
        ]})
        next_id += 1
        adds_sent += 1

    # Untimed warmup: cover the coalesced-batch buckets (1..clients) and
    # the add path, so bucket compiles stay out of the measured window —
    # same rule as scripts/bench_indexing.py's bucket-covering warmup.
    for round_size in (args.clients, max(args.clients // 2, 1), 1):
        for _ in range(round_size):
            issue_search()
        issue_add()
        done = 0
        while done < round_size + 1:
            resp = await asyncio.wait_for(writer.queue.get(), timeout=600)
            if resp.get("id") in sent:
                sent.pop(resp["id"])
                done += 1
    adds_sent = 0

    t0 = time.perf_counter()
    for _ in range(min(args.clients, args.queries)):
        issue_search()

    total_searches = args.queries
    while completed_searches + errors < total_searches or any(
        kind == "add" for kind, _ in sent.values()
    ):
        resp = await asyncio.wait_for(writer.queue.get(), timeout=300)
        rid = resp.get("id")
        if rid is None or rid not in sent:
            continue
        kind, t_sent = sent.pop(rid)
        lat = time.perf_counter() - t_sent
        if "error" in resp or resp.get("result", {}).get("isError"):
            # count errors per kind: an add error must not be folded
            # into the search total (it would end the bench one search
            # early and skew QPS)
            if kind == "search":
                errors += 1
            else:
                add_errors += 1
        elif kind == "search":
            search_lat.append(lat)
            completed_searches += 1
        else:
            add_lat.append(lat)
        if kind == "search":
            issued = completed_searches + errors + len(
                [1 for k, _ in sent.values() if k == "search"]
            )
            if issued < total_searches:
                issue_search()
            if (
                args.add_every
                and completed_searches % args.add_every == 0
                and completed_searches > 0
                and adds_sent < completed_searches // args.add_every
            ):
                issue_add()
    wall = time.perf_counter() - t0

    reader.feed_eof()
    await asyncio.wait_for(server_task, timeout=30)

    def pct(xs, p):
        if not xs:
            return 0.0
        xs = sorted(xs)
        return xs[min(int(len(xs) * p), len(xs) - 1)]

    return {
        "clients": args.clients,
        "searches": completed_searches,
        "adds": adds_sent,
        "errors": errors,
        "add_errors": add_errors,
        "wall_s": round(wall, 2),
        "search_qps": round(completed_searches / wall, 1),
        "p50_ms": round(pct(search_lat, 0.5) * 1e3, 1),
        "p95_ms": round(pct(search_lat, 0.95) * 1e3, 1),
        "add_p50_ms": round(pct(add_lat, 0.5) * 1e3, 1),
        "final_doc_count": pipeline.get_document_count(),
        "zipf": args.zipf,
        "result_cache": bool(cfg.enable_result_cache),
        "pipelined": bool(getattr(cfg, "serve_pipelined", False)),
        "cache_stats": dict(pipeline.result_cache_stats),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="bench a YAML pipeline profile "
                         "(e.g. configs/scale.yaml) instead of the "
                         "built-in full/tiny configs")
    ap.add_argument("--full", action="store_true",
                    help="full-size architectures (default: tiny)")
    ap.add_argument("--docs", type=int, default=256)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--queries", type=int, default=120)
    ap.add_argument("--add-every", type=int, default=20,
                    help="issue one add_documents per N completed searches")
    ap.add_argument("--zipf", type=float, default=0.0,
                    help="draw queries Zipf(s) from --query-pool distinct "
                         "queries (0 = round-robin over 6)")
    ap.add_argument("--query-pool", type=int, default=64)
    ap.add_argument("--pipelined", action="store_true",
                    help="two-phase serving: overlap the next batch's "
                         "dispatch with this batch's fetch round-trip")
    ap.add_argument("--no-result-cache", action="store_true",
                    help="force the result cache OFF even if the "
                         "--config YAML enables it (cache A/B legs)")
    ap.add_argument("--result-cache", action="store_true",
                    help="enable the pipeline result cache")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (dev smokes; the axon "
                         "sitecustomize makes env vars too late)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(asyncio.run(_bench(args))), flush=True)


if __name__ == "__main__":
    main()

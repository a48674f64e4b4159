"""MCP stdio server exposing the retrieval pipeline.

Parity surface with src/mcp_retrieval_server.py: the same 7 tools
(search, add_documents, batch_search, get_pipeline_status, clear_index,
health_check, get_document_count — :43-111) and 3 resources
(pipeline://info|config|status — :113-145), with the same TextContent
JSON payload shapes.

TPU-native differences (SURVEY.md §3.3, §7 "serving concurrency"):

* the protocol layer is a self-contained stdio JSON-RPC implementation
  (serve/jsonrpc.py) — no SDK dependency;
* pipeline work runs in a single worker thread off the event loop, so
  the loop never blocks (the reference calls the pipeline synchronously
  inside async handlers, serializing everything);
* concurrent search calls are micro-batched: requests arriving while a
  batch is in flight coalesce into the next batch and share encoder
  forwards (serve/batcher.py).
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
from typing import Any, Optional

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
from tristage_rag_tpu.serve.batcher import MicroBatcher
from tristage_rag_tpu.serve.jsonrpc import JsonRpcError, StdioJsonRpcServer

logger = logging.getLogger(__name__)

PROTOCOL_VERSION = "2024-11-05"
SUPPORTED_PROTOCOL_VERSIONS = (PROTOCOL_VERSION,)
# MCP-defined JSON-RPC error code (2024-11-05 resources spec):
RESOURCE_NOT_FOUND = -32002
from tristage_rag_tpu.version import __version__

SERVER_INFO = {"name": "tristage-rag-tpu", "version": __version__}

TOOLS = [
    {
        "name": "search",
        "description": "Perform 3-stage retrieval search for relevant documents",
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {"type": "string", "description": "Search query text"},
                "top_k": {
                    "type": "integer",
                    "description": "Number of results to return (default: 20)",
                },
            },
            "required": ["query"],
        },
    },
    {
        "name": "add_documents",
        "description": "Add documents to the retrieval pipeline index",
        "inputSchema": {
            "type": "object",
            "properties": {
                "documents": {
                    "type": "array",
                    "items": {"type": "string"},
                    "description": "List of documents to add",
                },
                "metadata": {
                    "type": "array",
                    "items": {"type": "object"},
                    "description": "Optional per-document metadata",
                },
            },
            "required": ["documents"],
        },
    },
    {
        "name": "batch_search",
        "description": "Perform multiple search queries efficiently",
        "inputSchema": {
            "type": "object",
            "properties": {
                "queries": {"type": "array", "items": {"type": "string"}},
                "top_k": {"type": "integer"},
            },
            "required": ["queries"],
        },
    },
    {
        "name": "get_pipeline_status",
        "description": "Get current status and information about the retrieval pipeline",
        "inputSchema": {
            "type": "object",
            "properties": {"detailed": {"type": "boolean"}},
        },
    },
    {
        "name": "delete_documents",
        "description": "Delete documents from the index by doc_id (tombstoned; ids stay stable)",
        "inputSchema": {
            "type": "object",
            "properties": {
                "doc_ids": {
                    "type": "array",
                    "items": {"type": "integer"},
                    "description": "Document ids to delete",
                }
            },
            "required": ["doc_ids"],
        },
    },
    {
        "name": "clear_index",
        "description": "Clear all documents from the retrieval pipeline index",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "health_check",
        "description": "Check the health status of the retrieval pipeline",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "get_document_count",
        "description": "Get the number of documents currently indexed",
        "inputSchema": {"type": "object", "properties": {}},
    },
]

RESOURCES = [
    {
        "uri": "pipeline://info",
        "name": "Pipeline Information",
        "description": "3-stage retrieval pipeline specifications and capabilities",
        "mimeType": "application/json",
    },
    {
        "uri": "pipeline://config",
        "name": "Pipeline Configuration",
        "description": "Current pipeline configuration parameters",
        "mimeType": "application/json",
    },
    {
        "uri": "pipeline://status",
        "name": "Pipeline Status",
        "description": "Current pipeline status and performance metrics",
        "mimeType": "application/json",
    },
]


def _text(payload: Any) -> dict[str, Any]:
    return {
        "content": [
            {"type": "text", "text": json.dumps(payload, indent=2, default=str)}
        ]
    }


class RetrievalMCPServer:
    def __init__(self, pipeline: Optional[RetrievalPipeline] = None):
        self.pipeline = pipeline or RetrievalPipeline()
        self.rpc = StdioJsonRpcServer()
        # One worker thread for ALL pipeline work: off the event loop
        # (handlers stay responsive) but serialized against itself —
        # the pipeline is not thread-safe and there is one TPU queue.
        # Submission order is preserved, so add -> count sequences from
        # a single client behave as written.
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="pipeline"
        )
        if getattr(self.pipeline.config, "serve_pipelined", False):
            # Two-phase serving: dispatch on the worker thread, fetch on
            # the batcher's dedicated fetch thread — the next micro-
            # batch's dispatch overlaps this batch's device time + fetch
            # round-trip. The pipeline's result cache / stats are lock-
            # guarded and cache seeding is epoch-guarded against
            # mutations racing the in-flight fetch.
            self.batcher = MicroBatcher(
                dispatch_fn=self._batched_search_dispatch,
                executor=self._executor,
            )
        else:
            self.batcher = MicroBatcher(
                self._batched_search, executor=self._executor
            )
        self._start_time = time.time()
        self._setup()

    async def _run(self, fn, *args):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(self._executor, fn, *args)

    def _batched_search(
        self, requests: list[tuple[str, Optional[int]]]
    ) -> list[Any]:
        """Serve one coalesced micro-batch. Requests sharing a top_k
        (the common case) go through batch_search together — on the
        fused path that is ONE device dispatch for the whole batch.

        Never raises: one bad request must not poison the other
        requests coalesced into the same window, so failures degrade
        group -> per-request, and a slot that still fails carries its
        OWN exception (re-raised for that caller alone)."""
        if len(requests) == 1:
            q, k = requests[0]
            return [self._search_one_isolated(q, k)]
        by_k: dict[Optional[int], list[int]] = {}
        for i, (_, k) in enumerate(requests):
            by_k.setdefault(k, []).append(i)
        out: list[Any] = [None] * len(requests)
        for k, idxs in by_k.items():
            try:
                responses = self.pipeline.batch_search(
                    [requests[i][0] for i in idxs], k
                )
            except Exception:
                logger.exception(
                    "grouped batch_search failed; retrying per request"
                )
                responses = [
                    self._search_one_isolated(requests[i][0], k) for i in idxs
                ]
            for i, resp in zip(idxs, responses):
                out[i] = resp
        return out

    def _search_one_isolated(self, q: str, k: Optional[int]):
        try:
            return self.pipeline.search(q, k)
        except Exception as e:  # noqa: BLE001 — isolated per request
            return e

    def _batched_search_dispatch(
        self, requests: list[tuple[str, Optional[int]]]
    ):
        """Pipelined counterpart of _batched_search: phase 1 (this
        call, worker thread) fires one fused dispatch per top_k group
        and returns a closure; phase 2 (the closure, the batcher's
        fetch thread) blocks on the fetches and formats. Same error
        contract: a failing group degrades to per-request, a slot that
        still fails carries its own exception."""
        by_k: dict[Optional[int], list[int]] = {}
        for i, (_, k) in enumerate(requests):
            by_k.setdefault(k, []).append(i)
        groups: list[tuple[Optional[int], list[int], Any]] = []
        for k, idxs in by_k.items():
            try:
                fin = self.pipeline.batch_search_dispatch(
                    [requests[i][0] for i in idxs], k
                )
            except Exception:
                logger.exception("pipelined group dispatch failed")
                fin = None
            groups.append((k, idxs, fin))

        def finalize() -> list[Any]:
            out: list[Any] = [None] * len(requests)
            for k, idxs, fin in groups:
                responses = None
                if fin is not None:
                    try:
                        responses = fin()
                    except Exception:
                        logger.exception(
                            "pipelined group finalize failed; "
                            "retrying per request"
                        )
                if responses is None:
                    responses = [
                        self._search_one_isolated(requests[i][0], k)
                        for i in idxs
                    ]
                for i, resp in zip(idxs, responses):
                    out[i] = resp
            return out

        return finalize

    # ---- protocol handlers ----------------------------------------------

    def _setup(self) -> None:
        rpc = self.rpc

        @rpc.method("initialize")
        async def initialize(params):
            # 2024-11-05 lifecycle: respond with the client's requested
            # version iff the server supports it; otherwise with the
            # latest version the server DOES support (echoing an
            # arbitrary unsupported version back would falsely claim
            # support for it).
            requested = params.get("protocolVersion")
            return {
                "protocolVersion": (
                    requested
                    if requested in SUPPORTED_PROTOCOL_VERSIONS
                    else PROTOCOL_VERSION
                ),
                "capabilities": {"tools": {}, "resources": {}},
                "serverInfo": SERVER_INFO,
            }

        @rpc.method("notifications/initialized")
        async def initialized(params):
            return None

        @rpc.method("ping")
        async def ping(params):
            return {}

        @rpc.method("tools/list")
        async def tools_list(params):
            return {"tools": TOOLS}

        @rpc.method("resources/list")
        async def resources_list(params):
            return {"resources": RESOURCES}

        @rpc.method("resources/read")
        async def resources_read(params):
            uri = params.get("uri", "")
            payload = await self._read_resource(uri)
            return {
                "contents": [
                    {
                        "uri": uri,
                        "mimeType": "application/json",
                        "text": json.dumps(payload, indent=2, default=str),
                    }
                ]
            }

        @rpc.method("tools/call")
        async def tools_call(params):
            name = params.get("name")
            args = params.get("arguments") or {}
            try:
                return await self._call_tool(name, args)
            except JsonRpcError:
                raise
            except Exception as e:
                logger.exception("tool %s failed", name)
                return {
                    "content": [{"type": "text", "text": f"Error: {e}"}],
                    "isError": True,
                }

    async def _call_tool(self, name: str, args: dict[str, Any]) -> dict[str, Any]:
        if name == "search":
            query = args.get("query")
            if not isinstance(query, str) or not query:
                raise JsonRpcError(-32602, "search requires a 'query' string")
            result = await self.batcher.submit((query, args.get("top_k", 20)))
            if isinstance(result, Exception):
                raise result  # this request's own failure, not its batch's
            return _text(
                {
                    "query": result["query"],
                    "results": result["results"],
                    "timing": result["timing"],
                }
            )
        if name == "add_documents":
            docs = args.get("documents")
            if not isinstance(docs, list) or not all(
                isinstance(d, str) for d in docs
            ):
                raise JsonRpcError(-32602, "add_documents requires a string list")
            out = await self._run(
                self.pipeline.add_documents, docs, args.get("metadata")
            )
            return _text(out)
        if name == "batch_search":
            queries = args.get("queries")
            if not isinstance(queries, list) or not all(
                isinstance(q, str) for q in queries
            ):
                raise JsonRpcError(
                    -32602, "batch_search requires a list of query strings"
                )
            top_k = args.get("top_k", 20)
            results = await asyncio.gather(
                *(self.batcher.submit((q, top_k)) for q in queries)
            )
            for r in results:
                if isinstance(r, Exception):
                    raise r
            return _text(
                [
                    {"query": r["query"], "results": r["results"], "timing": r["timing"]}
                    for r in results
                ]
            )
        if name == "get_pipeline_status":
            info = await self._run(self.pipeline.get_pipeline_info)
            if not args.get("detailed", False):
                info = {
                    "initialized": info["initialized"],
                    "device": info["device"],
                    "documents": self.pipeline.get_document_count(),
                    "total_queries": info["performance_stats"]["total_queries"],
                }
            return _text(info)
        if name == "delete_documents":
            doc_ids = args.get("doc_ids")
            if not isinstance(doc_ids, list) or not all(
                isinstance(i, int) for i in doc_ids
            ):
                raise JsonRpcError(-32602, "delete_documents requires integer 'doc_ids'")
            out = await self._run(self.pipeline.delete_documents, doc_ids)
            return _text(out)
        if name == "clear_index":
            await self._run(self.pipeline.clear_index)
            return _text({"status": "cleared", "documents": 0})
        if name == "health_check":
            docs = await self._run(self.pipeline.get_document_count)
            return _text(
                {
                    "status": "healthy",
                    "uptime_s": time.time() - self._start_time,
                    "initialized": self.pipeline.stage1 is not None,
                    "documents": docs,
                    "pending_requests": self.batcher.pending,
                }
            )
        if name == "get_document_count":
            count = await self._run(self.pipeline.get_document_count)
            return _text({"document_count": count})
        raise JsonRpcError(-32602, f"Unknown tool: {name}")

    async def _read_resource(self, uri: str) -> Any:
        if uri == "pipeline://info":
            return {
                "name": SERVER_INFO["name"],
                "version": SERVER_INFO["version"],
                "stages": {
                    "stage1": "dense bi-encoder + BM25 fusion (Pallas/XLA top-k)",
                    "stage2": "ColBERT MaxSim late interaction (batched XLA)",
                    "stage3": "cross-encoder reranking (batched XLA)",
                },
                "funnel": [
                    self.pipeline.config.stage1_top_k,
                    self.pipeline.config.stage2_top_k,
                    self.pipeline.config.stage3_top_k,
                ],
            }
        if uri == "pipeline://config":
            return self.pipeline.config.as_dict()
        if uri == "pipeline://status":
            return await self._run(self.pipeline.get_pipeline_info)
        # MCP resources spec: unknown resource is -32002 "Resource not
        # found" with the uri in error.data (not generic invalid-params)
        raise JsonRpcError(
            RESOURCE_NOT_FOUND, "Resource not found", data={"uri": uri}
        )

    async def run(self, reader=None, writer=None) -> None:
        await self.batcher.start()
        try:
            await self.rpc.serve(reader, writer)
        finally:
            await self.batcher.stop()


def main(config_path: Optional[str] = None) -> None:
    logging.basicConfig(level=logging.INFO)
    config = PipelineConfig.from_yaml(config_path) if config_path else None
    pipeline = RetrievalPipeline(config)
    # Serve warm: load any persisted index and pay the XLA compiles now
    # rather than on the first client request.
    try:
        if pipeline.load_index():
            pipeline.warmup()
    except Exception:
        logger.exception("startup index load/warmup failed; serving cold")
    server = RetrievalMCPServer(pipeline)
    asyncio.run(server.run())


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)

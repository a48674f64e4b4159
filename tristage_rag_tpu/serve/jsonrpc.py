"""Minimal async JSON-RPC 2.0 over stdio (MCP transport).

The MCP python SDK is an optional dependency; this module implements
the stdio transport natively — newline-delimited JSON-RPC messages on
stdin/stdout, as the MCP stdio spec requires — so the server
(serve/mcp_server.py) runs with zero extra deps. Handlers execute on
the event loop; blocking work must be pushed to an executor by the
handler (the reference blocks its loop, src/mcp_retrieval_server.py:
148-155 — SURVEY.md §3.3 calls this out as a must-fix).
"""

from __future__ import annotations

import asyncio
import json
import logging
import sys
from typing import Any, Awaitable, Callable, Optional

logger = logging.getLogger(__name__)

Handler = Callable[[dict[str, Any]], Awaitable[Any]]

PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INTERNAL_ERROR = -32603


class JsonRpcError(Exception):
    def __init__(self, code: int, message: str, data: Any = None):
        super().__init__(message)
        self.code = code
        self.data = data


class StdioJsonRpcServer:
    """Newline-delimited JSON-RPC server on stdin/stdout."""

    def __init__(self):
        self._methods: dict[str, Handler] = {}
        self._write_lock: Optional[asyncio.Lock] = None
        self._writer = None

    def method(self, name: str):
        def deco(fn: Handler) -> Handler:
            self._methods[name] = fn
            return fn

        return deco

    def register(self, name: str, fn: Handler) -> None:
        self._methods[name] = fn

    async def _send(self, payload: dict[str, Any]) -> None:
        line = json.dumps(payload, separators=(",", ":")) + "\n"
        async with self._write_lock:
            self._writer.write(line.encode())
            await self._writer.drain()

    async def send_notification(self, method: str, params: dict[str, Any]) -> None:
        await self._send({"jsonrpc": "2.0", "method": method, "params": params})

    async def _dispatch(self, msg: dict[str, Any]) -> None:
        msg_id = msg.get("id")
        method = msg.get("method")
        if method is None:
            return  # response to a server->client request; ignore
        handler = self._methods.get(method)
        is_notification = msg_id is None
        if handler is None:
            if not is_notification:
                await self._send(
                    {
                        "jsonrpc": "2.0",
                        "id": msg_id,
                        "error": {
                            "code": METHOD_NOT_FOUND,
                            "message": f"method not found: {method}",
                        },
                    }
                )
            return
        try:
            result = await handler(msg.get("params") or {})
            if not is_notification:
                await self._send({"jsonrpc": "2.0", "id": msg_id, "result": result})
        except JsonRpcError as e:
            if not is_notification:
                err: dict[str, Any] = {"code": e.code, "message": str(e)}
                if e.data is not None:  # JSON-RPC 2.0: data MAY be omitted
                    err["data"] = e.data
                await self._send(
                    {"jsonrpc": "2.0", "id": msg_id, "error": err}
                )
        except Exception as e:
            logger.exception("handler %s failed", method)
            if not is_notification:
                await self._send(
                    {
                        "jsonrpc": "2.0",
                        "id": msg_id,
                        "error": {"code": INTERNAL_ERROR, "message": str(e)},
                    }
                )

    async def serve(self, reader=None, writer=None) -> None:
        """Run until stdin EOF. Requests dispatch concurrently."""
        loop = asyncio.get_running_loop()
        self._write_lock = asyncio.Lock()
        if reader is None or writer is None:
            reader = asyncio.StreamReader()
            await loop.connect_read_pipe(
                lambda: asyncio.StreamReaderProtocol(reader), sys.stdin
            )
            transport, protocol = await loop.connect_write_pipe(
                asyncio.streams.FlowControlMixin, sys.stdout
            )
            writer = asyncio.StreamWriter(transport, protocol, None, loop)
        self._writer = writer
        pending: set[asyncio.Task] = set()
        while True:
            line = await reader.readline()
            if not line:
                break
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                await self._send(
                    {
                        "jsonrpc": "2.0",
                        "id": None,
                        "error": {"code": PARSE_ERROR, "message": "parse error"},
                    }
                )
                continue
            if not isinstance(msg, dict):
                # valid JSON but not a request object (e.g. a batch
                # array, which this server doesn't support) — answer
                # with INVALID_REQUEST instead of crashing the dispatch
                # task and leaving the client waiting forever
                await self._send(
                    {
                        "jsonrpc": "2.0",
                        "id": None,
                        "error": {
                            "code": INVALID_REQUEST,
                            "message": "request must be a JSON object",
                        },
                    }
                )
                continue
            task = loop.create_task(self._dispatch(msg))
            pending.add(task)
            task.add_done_callback(pending.discard)
        if pending:
            await asyncio.gather(*pending, return_exceptions=True)

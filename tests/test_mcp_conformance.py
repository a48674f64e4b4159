"""MCP wire-format conformance against golden transcripts (VERDICT r3
next-4).

The reference serves MCP through the official SDK
(/root/reference/src/mcp_retrieval_server.py:382-398); this rebuild
hand-rolls the stdio JSON-RPC layer (serve/jsonrpc.py). These tests pin
the wire format to the 2024-11-05 MCP revision with a golden
transcript (tests/fixtures/mcp_session_2024-11-05.txt) modeled on a
real client's opening exchange — initialize/initialized handshake,
ping, tools/list, tools/call (success, invalid-params error, unknown
tool), resources/list/read (success + -32002 resource-not-found),
unknown-method -32601, notification silence, parse/-32700 and
invalid-request/-32600 shapes, and version negotiation for an
unsupported protocol version.

Replay is BYTE-level and strictly sequential: each client line is fed
alone and the server's next output line must match the golden bytes
exactly (after substituting the {{VERSION}} placeholder). Client lines
are stored verbatim as the python MCP SDK serializes them (compact,
no params key when absent).

Regenerate after a deliberate surface change:
    python -m tests.test_mcp_conformance record
then diff the fixture and review every changed line against the spec.
"""

from __future__ import annotations

import asyncio
import json
import os

import pytest

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures", "mcp_session_2024-11-05.txt",
)

# A real client's opening exchange (python MCP SDK shapes) followed by
# one probe per protocol surface. "C" lines are sent verbatim; each is
# followed by zero (notification / silence expected) or one "S" golden
# response line.
CLIENT_LINES = [
    # -- lifecycle: initialize -> initialized notification
    '{"jsonrpc":"2.0","id":0,"method":"initialize","params":{'
    '"protocolVersion":"2024-11-05","capabilities":{"roots":'
    '{"listChanged":true},"sampling":{}},"clientInfo":{"name":'
    '"conformance-client","version":"1.0.0"}}}',
    '{"jsonrpc":"2.0","method":"notifications/initialized"}',
    '{"jsonrpc":"2.0","id":1,"method":"ping"}',
    # -- discovery
    '{"jsonrpc":"2.0","id":2,"method":"tools/list"}',
    '{"jsonrpc":"2.0","id":3,"method":"resources/list"}',
    # -- tools/call: success (deterministic on an empty pipeline)
    '{"jsonrpc":"2.0","id":4,"method":"tools/call","params":{"name":'
    '"get_document_count","arguments":{}}}',
    # -- tools/call: invalid params -> protocol error -32602
    '{"jsonrpc":"2.0","id":5,"method":"tools/call","params":{"name":'
    '"search","arguments":{}}}',
    # -- tools/call: unknown tool -> protocol error -32602
    '{"jsonrpc":"2.0","id":6,"method":"tools/call","params":{"name":'
    '"no_such_tool","arguments":{}}}',
    # -- resources/read: deterministic resource
    '{"jsonrpc":"2.0","id":7,"method":"resources/read","params":{"uri":'
    '"pipeline://info"}}',
    # -- resources/read: unknown -> MCP -32002 Resource not found
    '{"jsonrpc":"2.0","id":8,"method":"resources/read","params":{"uri":'
    '"file:///nonexistent.txt"}}',
    # -- unknown method -> -32601
    '{"jsonrpc":"2.0","id":9,"method":"prompts/list"}',
    # -- unknown NOTIFICATION: must produce no response at all
    '{"jsonrpc":"2.0","method":"notifications/cancelled","params":{'
    '"requestId":4,"reason":"client timeout"}}',
    # -- valid JSON, not an object -> -32600 invalid request, id null
    '[]',
    # -- parse error -> -32700, id null
    '{"jsonrpc":"2.0","id":10,"method":"ping"',
    # -- version negotiation: unsupported requested version -> server
    #    replies with the latest version it supports
    '{"jsonrpc":"2.0","id":11,"method":"initialize","params":{'
    '"protocolVersion":"2199-01-01","capabilities":{},"clientInfo":{'
    '"name":"future-client","version":"9.9.9"}}}',
]

# Indices of CLIENT_LINES that are notifications / non-requests the
# server must stay SILENT on (verified by the next request's response
# arriving as the immediate next output line).
SILENT = {1, 11}


def _make_server():
    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.serve.mcp_server import RetrievalMCPServer
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    cfg = PipelineConfig(
        stage1_model="tiny-gemma",
        stage2_model="tiny-modernbert",
        stage3_model="tiny-bert",
        stage1_top_k=20, stage2_top_k=10, stage3_top_k=5,
        stage1_bm25_top_k=20,
    )
    return RetrievalMCPServer(RetrievalPipeline(cfg))


class _LineWriter:
    """Async-signalling byte collector standing in for the stdout
    StreamWriter."""

    def __init__(self):
        self.buf = b""
        self.lines: asyncio.Queue[bytes] = asyncio.Queue()

    def write(self, data: bytes):
        self.buf += data
        while b"\n" in self.buf:
            line, self.buf = self.buf.split(b"\n", 1)
            self.lines.put_nowait(line)

    async def drain(self):
        pass


async def _replay(client_lines: list[str]) -> list[tuple[int, bytes]]:
    """Feed each client line sequentially; return (client_idx,
    response_bytes) for every response the server emits."""
    server = _make_server()
    reader = asyncio.StreamReader()
    writer = _LineWriter()
    run = asyncio.ensure_future(server.run(reader, writer))
    out: list[tuple[int, bytes]] = []
    try:
        for i, line in enumerate(client_lines):
            reader.feed_data(line.encode() + b"\n")
            if i in SILENT:
                continue
            resp = await asyncio.wait_for(writer.lines.get(), timeout=30)
            out.append((i, resp))
        reader.feed_eof()
        await asyncio.wait_for(run, timeout=30)
        # anything still queued arrived unsolicited (a notification
        # answered, or double responses) — conformance failure
        assert writer.lines.empty(), (
            f"unexpected extra server output: {writer.lines.get_nowait()}"
        )
    finally:
        if not run.done():
            run.cancel()
    return out


def _version() -> str:
    from tristage_rag_tpu.version import __version__

    return __version__


def _golden_lines() -> list[tuple[int, bytes]]:
    out = []
    with open(FIXTURE, encoding="utf-8") as fh:
        for raw in fh:
            raw = raw.rstrip("\n")
            if not raw or raw.startswith("#"):
                continue
            tag, _, rest = raw.partition(" ")
            if tag == "S":
                idx, _, payload = rest.partition(" ")
                payload = payload.replace("{{VERSION}}", _version())
                out.append((int(idx), payload.encode()))
    return out


def record() -> None:
    """Regenerate the golden fixture from a live session (review the
    diff against the 2024-11-05 spec before committing)."""
    responses = asyncio.run(_replay(CLIENT_LINES))
    ver = _version()
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w", encoding="utf-8") as fh:
        fh.write(
            "# Golden MCP 2024-11-05 wire transcript — byte-exact server\n"
            "# responses to tests/test_mcp_conformance.py::CLIENT_LINES.\n"
            "# Format: 'S <client_line_idx> <exact response bytes>'.\n"
            "# {{VERSION}} substitutes the package version at replay.\n"
        )
        for idx, resp in responses:
            text = resp.decode().replace(ver, "{{VERSION}}")
            fh.write(f"S {idx} {text}\n")
    print(f"wrote {FIXTURE} ({len(responses)} responses)")


class TestGoldenTranscript:
    def test_byte_level_replay(self):
        golden = _golden_lines()
        assert golden, f"empty/missing fixture {FIXTURE}"
        actual = asyncio.run(_replay(CLIENT_LINES))
        assert len(actual) == len(golden)
        for (gi, gbytes), (ai, abytes) in zip(golden, actual):
            assert gi == ai, f"response order drifted: golden {gi}, got {ai}"
            assert abytes == gbytes, (
                f"wire bytes drifted for client line {gi}:\n"
                f"  client: {CLIENT_LINES[gi]}\n"
                f"  golden: {gbytes.decode()}\n"
                f"  actual: {abytes.decode()}"
            )


class TestSpecShapes:
    """Spec assertions that must hold INDEPENDENT of the golden bytes,
    so a bad re-record cannot silently bless a regression."""

    @pytest.fixture(scope="class")
    def responses(self):
        actual = asyncio.run(_replay(CLIENT_LINES))
        return {i: json.loads(b) for i, b in actual}

    def test_initialize_result(self, responses):
        r = responses[0]
        assert r["id"] == 0 and r["jsonrpc"] == "2.0"
        res = r["result"]
        assert res["protocolVersion"] == "2024-11-05"
        assert "tools" in res["capabilities"]
        assert "resources" in res["capabilities"]
        assert set(res["serverInfo"]) >= {"name", "version"}

    def test_version_negotiation_unsupported(self, responses):
        # server must answer with a version it supports, never echo an
        # unsupported one
        assert responses[14]["result"]["protocolVersion"] == "2024-11-05"

    def test_ping_empty_result(self, responses):
        assert responses[2]["result"] == {}

    def test_tools_list_schema(self, responses):
        tools = responses[3]["result"]["tools"]
        names = {t["name"] for t in tools}
        # the reference's 7 tools (src/mcp_retrieval_server.py:43-111)
        # + delete_documents
        assert names == {
            "search", "add_documents", "batch_search",
            "get_pipeline_status", "clear_index", "health_check",
            "get_document_count", "delete_documents",
        }
        for t in tools:
            assert set(t) >= {"name", "description", "inputSchema"}
            assert t["inputSchema"]["type"] == "object"

    def test_resources_list(self, responses):
        uris = {r["uri"] for r in responses[4]["result"]["resources"]}
        assert uris == {
            "pipeline://info", "pipeline://config", "pipeline://status"
        }

    def test_tool_call_result_shape(self, responses):
        content = responses[5]["result"]["content"]
        assert content[0]["type"] == "text"
        assert json.loads(content[0]["text"]) == {"document_count": 0}

    def test_invalid_params_error(self, responses):
        assert responses[6]["error"]["code"] == -32602
        assert responses[7]["error"]["code"] == -32602

    def test_resource_read_contents(self, responses):
        c = responses[8]["result"]["contents"][0]
        assert c["uri"] == "pipeline://info"
        assert c["mimeType"] == "application/json"
        assert json.loads(c["text"])["funnel"] == [20, 10, 5]

    def test_resource_not_found_is_32002(self, responses):
        err = responses[9]["error"]
        assert err["code"] == -32002
        assert err["data"]["uri"] == "file:///nonexistent.txt"

    def test_unknown_method_is_32601(self, responses):
        assert responses[10]["error"]["code"] == -32601

    def test_invalid_request_and_parse_error(self, responses):
        assert responses[12]["error"]["code"] == -32600
        assert responses[12]["id"] is None
        assert responses[13]["error"]["code"] == -32700
        assert responses[13]["id"] is None


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "record":
        record()
    else:
        print(__doc__)

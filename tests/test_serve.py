import asyncio
import json

import pytest

from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
from tristage_rag_tpu.serve.batcher import MicroBatcher
from tristage_rag_tpu.serve.mcp_server import RetrievalMCPServer


class _CollectWriter:
    def __init__(self):
        self.chunks: list[bytes] = []

    def write(self, data: bytes):
        self.chunks.append(data)

    async def drain(self):
        pass

    def lines(self):
        return [
            json.loads(line)
            for line in b"".join(self.chunks).decode().splitlines()
            if line.strip()
        ]


def _run_session(server: RetrievalMCPServer, messages: list[dict]) -> list[dict]:
    async def go():
        reader = asyncio.StreamReader()
        writer = _CollectWriter()
        for m in messages:
            reader.feed_data((json.dumps(m) + "\n").encode())
        reader.feed_eof()
        await server.run(reader, writer)
        return writer.lines()

    return asyncio.run(go())


def _tool_call(mid, name, arguments=None):
    return {
        "jsonrpc": "2.0",
        "id": mid,
        "method": "tools/call",
        "params": {"name": name, "arguments": arguments or {}},
    }


def _by_id(responses):
    return {r["id"]: r for r in responses if "id" in r and r["id"] is not None}


@pytest.fixture(scope="module")
def server(request):
    from tristage_rag_tpu.engine.config import PipelineConfig

    cfg = PipelineConfig(
        stage1_model="tiny-gemma",
        stage2_model="tiny-modernbert",
        stage3_model="tiny-bert",
        stage1_top_k=8,
        stage2_top_k=6,
        stage3_top_k=3,
        stage1_max_text_length=32,
        stage2_max_seq_length=32,
        stage3_max_length=48,
        compute_dtype="float32",
        mesh_data_parallel=1,
    )
    return RetrievalMCPServer(RetrievalPipeline(cfg))


class TestMCPServer:
    def test_initialize_and_list(self, server):
        out = _by_id(
            _run_session(
                server,
                [
                    {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
                    {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
                    {"jsonrpc": "2.0", "id": 3, "method": "resources/list"},
                ],
            )
        )
        assert out[1]["result"]["serverInfo"]["name"] == "tristage-rag-tpu"
        names = {t["name"] for t in out[2]["result"]["tools"]}
        assert names == {
            "search", "add_documents", "batch_search", "get_pipeline_status",
            "delete_documents", "clear_index", "health_check",
            "get_document_count",
        }
        uris = {r["uri"] for r in out[3]["result"]["resources"]}
        assert uris == {"pipeline://info", "pipeline://config", "pipeline://status"}

    def test_add_and_search_flow(self, server):
        out = _by_id(
            _run_session(
                server,
                [
                    _tool_call(1, "add_documents", {
                        "documents": ["alpha beta gamma", "delta epsilon zeta"],
                    }),
                    _tool_call(2, "get_document_count"),
                    _tool_call(3, "search", {"query": "alpha beta", "top_k": 2}),
                    _tool_call(4, "health_check"),
                ],
            )
        )
        added = json.loads(out[1]["result"]["content"][0]["text"])
        assert added["documents_added"] == 2
        count = json.loads(out[2]["result"]["content"][0]["text"])
        assert count["document_count"] == 2
        search = json.loads(out[3]["result"]["content"][0]["text"])
        assert search["query"] == "alpha beta"
        assert len(search["results"]) <= 2
        assert {"doc_id", "document", "stage3_score"} <= set(search["results"][0])
        health = json.loads(out[4]["result"]["content"][0]["text"])
        assert health["status"] == "healthy"

    def test_batch_search_and_resources(self, server):
        out = _by_id(
            _run_session(
                server,
                [
                    _tool_call(1, "add_documents", {"documents": ["x y z"]}),
                    _tool_call(2, "batch_search", {"queries": ["x", "y"], "top_k": 1}),
                    {"jsonrpc": "2.0", "id": 3, "method": "resources/read",
                     "params": {"uri": "pipeline://config"}},
                ],
            )
        )
        batch = json.loads(out[2]["result"]["content"][0]["text"])
        assert len(batch) == 2
        cfg = json.loads(out[3]["result"]["contents"][0]["text"])
        assert cfg["stage1_top_k"] == 8

    def test_errors(self, server):
        out = _by_id(
            _run_session(
                server,
                [
                    _tool_call(1, "search", {}),  # missing query
                    _tool_call(2, "no_such_tool"),
                    {"jsonrpc": "2.0", "id": 3, "method": "bogus/method"},
                ],
            )
        )
        assert out[1]["error"]["code"] == -32602
        assert out[2]["error"]["code"] == -32602
        assert out[3]["error"]["code"] == -32601

    def test_delete_documents_tool(self, server):
        out = _by_id(
            _run_session(
                server,
                [
                    _tool_call(1, "clear_index"),
                    _tool_call(2, "add_documents", {"documents": ["keep me", "drop me"]}),
                    _tool_call(3, "delete_documents", {"doc_ids": [1]}),
                    _tool_call(4, "search", {"query": "drop me", "top_k": 2}),
                    _tool_call(5, "delete_documents", {"doc_ids": "bad"}),
                ],
            )
        )
        deleted = json.loads(out[3]["result"]["content"][0]["text"])
        assert deleted["documents_deleted"] == 1
        search = json.loads(out[4]["result"]["content"][0]["text"])
        assert all(r["doc_id"] != 1 for r in search["results"])
        assert out[5]["error"]["code"] == -32602

    def test_clear_index(self, server):
        out = _by_id(
            _run_session(
                server,
                [
                    _tool_call(1, "add_documents", {"documents": ["to clear"]}),
                    _tool_call(2, "clear_index"),
                    _tool_call(3, "get_document_count"),
                ],
            )
        )
        count = json.loads(out[3]["result"]["content"][0]["text"])
        assert count["document_count"] == 0

    def test_parse_error(self, server):
        async def go():
            reader = asyncio.StreamReader()
            writer = _CollectWriter()
            reader.feed_data(b"this is not json\n")
            reader.feed_eof()
            await server.run(reader, writer)
            return writer.lines()

        out = asyncio.run(go())
        assert out[0]["error"]["code"] == -32700


class TestMicroBatcher:
    def test_coalesces_concurrent_requests(self):
        calls: list[list[int]] = []

        def batch_fn(reqs):
            calls.append(list(reqs))
            import time

            time.sleep(0.01)
            return [r * 2 for r in reqs]

        async def go():
            b = MicroBatcher(batch_fn, max_batch=16, max_wait_ms=20.0)
            await b.start()
            results = await asyncio.gather(*(b.submit(i) for i in range(10)))
            await b.stop()
            return results, b.batches_run

        results, batches = asyncio.run(go())
        assert results == [i * 2 for i in range(10)]
        assert batches < 10  # requests actually coalesced

    def test_propagates_errors(self):
        def bad(reqs):
            raise RuntimeError("boom")

        async def go():
            b = MicroBatcher(bad, max_wait_ms=1.0)
            await b.start()
            try:
                with pytest.raises(RuntimeError, match="boom"):
                    await b.submit(1)
            finally:
                await b.stop()

        asyncio.run(go())

    def test_sequential_submits(self):
        def fn(reqs):
            return [r + 1 for r in reqs]

        async def go():
            b = MicroBatcher(fn, max_wait_ms=0.5)
            await b.start()
            out = [await b.submit(i) for i in range(3)]
            await b.stop()
            return out

        assert asyncio.run(go()) == [1, 2, 3]


class TestBatchErrorIsolation:
    def test_bad_request_does_not_poison_the_batch(self):
        """A failing request coalesced into a micro-batch must error
        alone; its batchmates still get results (code-review r2)."""
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=4, stage2_top_k=3,
            stage3_top_k=2, stage1_max_text_length=32,
            stage2_max_seq_length=32, stage3_max_length=48,
            compute_dtype="float32", mesh_data_parallel=1,
        )
        srv = RetrievalMCPServer(RetrievalPipeline(cfg))
        srv.pipeline.add_documents(["doc one aa", "doc two bb"])

        async def go():
            # an int query raises inside the pipeline; the str query
            # shares the same coalescing window
            good = srv._call_tool("search", {"query": "doc aa", "top_k": 1})
            bad = srv._call_tool("search", {"query": 123, "top_k": 1})
            return await asyncio.gather(good, bad, return_exceptions=True)

        good, bad = asyncio.run(go())
        assert not isinstance(good, Exception)
        assert json.loads(good["content"][0]["text"])["results"]
        assert isinstance(bad, Exception)  # -32602 validation

    def test_mixed_failures_within_grouped_dispatch(self, server):
        # craft a request batch where the pipeline itself fails for one
        # item: monkeypatch search to fail on a sentinel query
        server.pipeline.add_documents(["grouped dispatch doc qq"])
        orig_search = server.pipeline.search
        orig_batch = server.pipeline.batch_search

        def flaky(q, k=None):
            if q == "__boom__":
                raise RuntimeError("injected")
            return orig_search(q, k)

        def broken_batch(qs, k=None):
            raise RuntimeError("whole group failed")

        server.pipeline.search = flaky
        server.pipeline.batch_search = broken_batch
        try:
            # grouped dispatch fails -> per-request retry isolates the
            # one genuinely bad query
            out = server._batched_search([("x", 1), ("__boom__", 1)])
        finally:
            server.pipeline.search = orig_search
            server.pipeline.batch_search = orig_batch
        assert not isinstance(out[0], Exception)
        assert isinstance(out[1], Exception)

"""Two-phase (dispatch/fetch) pipelined serving.

``pipeline.batch_search_dispatch`` splits a batched search into the
host-prep + device dispatch (phase 1) and the blocking fetch + host
formatting (phase 2, a returned closure) so a serving loop can overlap
the next batch's dispatch with this batch's device time and
device->host round-trip. The MicroBatcher's pipelined mode and the MCP
server's ``serve_pipelined`` knob drive it end-to-end.

Guarantees under test: result identity with ``batch_search``, the
epoch guard (an index mutation between dispatch and fetch voids cache
seeding but not the in-flight results), the staged inline fallback,
per-request error isolation, and response ordering under concurrency.
"""

from __future__ import annotations

import asyncio
import dataclasses
import json

import pytest


@pytest.fixture()
def pipelined_pipeline(tiny_config):
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    cfg = dataclasses.replace(
        tiny_config, enable_result_cache=True, result_cache_size=16,
        serve_pipelined=True, stage2_cache_doc_embeddings=True,
    )
    p = RetrievalPipeline(cfg)
    p.add_documents([
        f"document {i} about topic {i % 3} fox river" for i in range(12)
    ])
    return p


class TestBatchSearchDispatch:
    def test_matches_batch_search(self, pipelined_pipeline):
        p = pipelined_pipeline
        qs = ["fox topic 0", "river topic 1", "document 5"]
        expected = p.batch_search(qs, top_k=3)
        p._invalidate_result_cache()  # remove the seeding from above
        assert p._fused is not None and p._fused.ready(), (
            "fixture must exercise the real two-phase fused path, "
            "not the inline fallback"
        )
        fin = p.batch_search_dispatch(qs, top_k=3)
        got = fin()
        assert len(got) == len(expected)
        assert all(a["timing"].get("fused") for a in got)
        for a, b in zip(got, expected):
            assert [r["doc_id"] for r in a["results"]] == [
                r["doc_id"] for r in b["results"]
            ]
            assert a["query"] == b["query"]

    def test_dedupes_and_seeds_cache(self, pipelined_pipeline):
        p = pipelined_pipeline
        qs = ["fox topic 0", "fox topic 1", "fox topic 0"]
        fin = p.batch_search_dispatch(qs, top_k=3)
        out = fin()
        assert [r["doc_id"] for r in out[0]["results"]] == [
            r["doc_id"] for r in out[2]["results"]
        ]
        # second dispatch: all three resolve from the cache in phase 1
        before = p.result_cache_stats["hits"]
        fin2 = p.batch_search_dispatch(qs, top_k=3)
        out2 = fin2()
        assert all(o["timing"].get("cached") for o in out2)
        assert p.result_cache_stats["hits"] == before + 3

    def test_epoch_guard_voids_cache_seed_on_racing_mutation(
        self, pipelined_pipeline
    ):
        p = pipelined_pipeline
        q = "fox topic 2"
        fin = p.batch_search_dispatch([q], top_k=3)
        # an index mutation lands between dispatch and fetch
        p.add_documents(["a brand new fox topic 2 document"])
        out = fin()
        # the in-flight result still returns (computed on the
        # pre-mutation index) ...
        assert out[0]["results"]
        # ... but must NOT have seeded the cache: the next search is a
        # miss against the mutated index
        res = p.search(q, top_k=3)
        assert "cached" not in res["timing"]

    def test_clear_between_dispatch_and_fetch_degrades_cleanly(
        self, pipelined_pipeline
    ):
        """clear_index empties the doc store the fetch-phase formatter
        reads; the finalize must degrade to a re-run on the new index,
        not crash — and must not trip the fused circuit breaker."""
        p = pipelined_pipeline
        fin = p.batch_search_dispatch(["fox topic 0"], top_k=3)
        p.clear_index()
        p.add_documents(["rebuilt corpus fox"])
        out = fin()
        assert len(out) == 1  # re-ran on the new index, whatever it holds
        assert p._fused_failures == 0

    def test_inline_fallback_without_fused(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = dataclasses.replace(tiny_config, enable_fused_search=False)
        p = RetrievalPipeline(cfg)
        p.add_documents(["one fox document", "a river document"])
        fin = p.batch_search_dispatch(["fox"], top_k=1)
        out = fin()
        assert out[0]["results"][0]["document"] == "one fox document"

    def test_empty_batch(self, pipelined_pipeline):
        assert pipelined_pipeline.batch_search_dispatch([])() == []


class TestMicroBatcherPipelined:
    def _mk(self, dispatch_fn, **kw):
        from tristage_rag_tpu.serve.batcher import MicroBatcher

        return MicroBatcher(dispatch_fn=dispatch_fn, **kw)

    def test_requires_exactly_one_mode(self):
        from tristage_rag_tpu.serve.batcher import MicroBatcher

        with pytest.raises(ValueError):
            MicroBatcher()
        with pytest.raises(ValueError):
            MicroBatcher(batch_fn=lambda r: r, dispatch_fn=lambda r: r)

    def test_results_and_overlap(self):
        """Dispatches may start before earlier finalizes complete
        (that IS the pipelining), results still route correctly."""
        import threading

        dispatched, finalized = [], []
        release = threading.Event()

        def dispatch(reqs):
            dispatched.append(list(reqs))

            def finalize():
                release.wait(timeout=10)
                finalized.append(list(reqs))
                return [r * 10 for r in reqs]

            return finalize

        async def go():
            b = self._mk(dispatch, max_wait_ms=1.0, max_inflight=2)
            await b.start()
            subs = [asyncio.create_task(b.submit(i)) for i in range(6)]
            # let batches form and dispatch while finalizes are blocked
            for _ in range(50):
                await asyncio.sleep(0.01)
                if dispatched and not finalized:
                    break
            assert dispatched and not finalized  # dispatch ran ahead
            release.set()
            res = await asyncio.gather(*subs)
            await b.stop()
            return res

        res = asyncio.run(go())
        assert res == [i * 10 for i in range(6)]

    def test_max_inflight_bounds_unfetched_batches(self):
        import threading

        release = threading.Event()
        dispatched = []

        def dispatch(reqs):
            dispatched.append(list(reqs))

            def finalize():
                release.wait(timeout=10)
                return list(reqs)

            return finalize

        async def go():
            # max_batch=1 so every submit is its own batch
            b = self._mk(dispatch, max_batch=1, max_wait_ms=0.1,
                         max_inflight=2)
            await b.start()
            subs = [asyncio.create_task(b.submit(i)) for i in range(5)]
            await asyncio.sleep(0.3)
            # 2 in flight + at most 1 more dispatched while awaiting
            assert len(dispatched) <= 3
            release.set()
            res = await asyncio.gather(*subs)
            await b.stop()
            return res

        res = asyncio.run(go())
        assert res == list(range(5))

    def test_dispatch_exception_fails_only_that_batch(self):
        calls = []

        def dispatch(reqs):
            calls.append(list(reqs))
            if reqs == [0]:
                raise RuntimeError("boom")
            return lambda: [r + 1 for r in reqs]

        async def go():
            b = self._mk(dispatch, max_batch=1, max_wait_ms=0.1)
            await b.start()
            with pytest.raises(RuntimeError):
                await b.submit(0)
            ok = await b.submit(5)
            await b.stop()
            return ok

        assert asyncio.run(go()) == 6

    def test_finalize_exception_fails_only_that_batch(self):
        def dispatch(reqs):
            if reqs == [0]:
                def bad():
                    raise RuntimeError("fetch boom")
                return bad
            return lambda: [r + 1 for r in reqs]

        async def go():
            b = self._mk(dispatch, max_batch=1, max_wait_ms=0.1)
            await b.start()
            with pytest.raises(RuntimeError):
                await b.submit(0)
            ok = await b.submit(5)
            await b.stop()
            return ok

        assert asyncio.run(go()) == 6


class TestMCPServerPipelined:
    def _server(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.serve.mcp_server import RetrievalMCPServer

        cfg = dataclasses.replace(
            tiny_config, serve_pipelined=True, enable_result_cache=True,
            stage2_cache_doc_embeddings=True,
        )
        p = RetrievalPipeline(cfg)
        p.add_documents([
            f"document {i} about topic {i % 3} fox river" for i in range(8)
        ])
        return RetrievalMCPServer(p)

    def test_pipelined_batcher_selected(self, tiny_config):
        server = self._server(tiny_config)
        assert server.batcher.dispatch_fn is not None
        assert server.batcher.batch_fn is None

    def test_search_over_pipelined_batcher(self, tiny_config):
        server = self._server(tiny_config)

        async def go():
            await server.batcher.start()
            results = await asyncio.gather(*(
                server.batcher.submit((f"fox topic {i % 3}", 3))
                for i in range(6)
            ))
            await server.batcher.stop()
            return results

        results = asyncio.run(go())
        assert len(results) == 6
        for i, r in enumerate(results):
            assert not isinstance(r, Exception)
            assert r["query"] == f"fox topic {i % 3}"
            assert r["results"]

    def test_mixed_top_k_groups(self, tiny_config):
        server = self._server(tiny_config)

        async def go():
            await server.batcher.start()
            results = await asyncio.gather(
                server.batcher.submit(("fox topic 0", 2)),
                server.batcher.submit(("fox topic 1", 4)),
                server.batcher.submit(("fox topic 0", 2)),
            )
            await server.batcher.stop()
            return results

        r = asyncio.run(go())
        assert len(r[0]["results"]) <= 2
        assert len(r[1]["results"]) <= 4
        assert [x["doc_id"] for x in r[0]["results"]] == [
            x["doc_id"] for x in r[2]["results"]
        ]

    def test_end_to_end_jsonrpc(self, tiny_config):
        """Full stdio JSON-RPC session over the pipelined batcher:
        search + add + search again must behave exactly as the simple
        batcher (submission ordering preserved within one client)."""
        server = self._server(tiny_config)

        class _CollectWriter:
            def __init__(self):
                self.chunks: list[bytes] = []

            def write(self, data: bytes):
                self.chunks.append(data)

            async def drain(self):
                pass

        def call(mid, name, arguments):
            return {
                "jsonrpc": "2.0", "id": mid, "method": "tools/call",
                "params": {"name": name, "arguments": arguments},
            }

        async def go():
            reader = asyncio.StreamReader()
            writer = _CollectWriter()
            for m in [
                call(1, "search", {"query": "fox topic 0", "top_k": 3}),
                call(2, "add_documents",
                     {"documents": ["a brand new pipelined fox doc"]}),
                call(3, "search",
                     {"query": "brand new pipelined fox", "top_k": 3}),
            ]:
                reader.feed_data((json.dumps(m) + "\n").encode())
            reader.feed_eof()
            await server.run(reader, writer)
            return [
                json.loads(line)
                for line in b"".join(writer.chunks).decode().splitlines()
                if line.strip()
            ]

        out = {r["id"]: r for r in asyncio.run(go()) if r.get("id")}
        r1 = json.loads(out[1]["result"]["content"][0]["text"])
        assert r1["results"]
        r3 = json.loads(out[3]["result"]["content"][0]["text"])
        docs = [x["document"] for x in r3["results"]]
        assert "a brand new pipelined fox doc" in docs

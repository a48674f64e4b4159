"""Multi-chip fused serving: the shard-mapped funnel (engine/fused.py
``_build_fn_sharded``) must be ranking-identical to both the staged
mesh path and the single-device fused path, with all device caches
genuinely row-sharded over the mesh.

Runs on the 8-device virtual CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

DOCS = [
    f"Document {i}: topic {'alpha beta gamma delta'.split()[i % 4]} "
    f"content body with shared words number {i}."
    for i in range(24)
]

KW = dict(
    stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
    stage3_model="tiny-bert", stage1_top_k=16, stage1_bm25_top_k=16,
    stage2_top_k=8, stage3_top_k=4, stage2_max_seq_length=32,
    stage3_max_length=64, stage1_max_text_length=64,
    compute_dtype="float32", stage2_cache_doc_embeddings=True,
)

QUERIES = [
    "topic alpha shared words",
    "content body number 7",
    "gamma delta",
]


def _ids(out):
    return [r["doc_id"] for r in out["results"]]


def _scores(out, key):
    return [r[key] for r in out["results"]]


@pytest.fixture(scope="module")
def tri():
    """(sharded-fused, staged-mesh, single-fused) over the same corpus."""
    sharded = RetrievalPipeline(PipelineConfig(
        enable_fused_search=True, mesh_data_parallel=0, **KW))
    staged = RetrievalPipeline(PipelineConfig(
        enable_fused_search=False, mesh_data_parallel=0, **KW))
    single = RetrievalPipeline(PipelineConfig(
        enable_fused_search=True, mesh_data_parallel=1, **KW))
    for p in (sharded, staged, single):
        p.add_documents(DOCS)
    return sharded, staged, single


class TestShardedFused:
    def test_active_on_mesh(self, tri):
        sharded, _, _ = tri
        assert sharded.mesh is not None and sharded.mesh.size == 8
        assert sharded._fused is not None and sharded._fused.ready()
        out = sharded.search(QUERIES[0])
        assert out["timing"].get("fused") is True

    def test_caches_row_sharded(self, tri):
        sharded, _, _ = tri
        s2 = sharded.stage2._cache
        spec = s2._buf.sharding.spec
        assert spec[0] == "data", spec
        d3 = sharded._fused.doc_tokens
        assert d3._buf.sharding.spec[0] == "data"
        # per-device rows = capacity / n_shards
        shard_shape = s2._buf.sharding.shard_shape(s2._buf.shape)
        assert shard_shape[0] * 8 == s2._buf.shape[0]

    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_staged_and_single(self, tri, query):
        sharded, staged, single = tri
        o_sh = sharded.search(query, top_k=4)
        o_st = staged.search(query, top_k=4)
        o_si = single.search(query, top_k=4)
        assert _ids(o_sh) == _ids(o_st) == _ids(o_si)
        np.testing.assert_allclose(
            _scores(o_sh, "stage3_score"), _scores(o_st, "stage3_score"),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            _scores(o_sh, "stage2_score"), _scores(o_si, "stage2_score"),
            rtol=1e-4, atol=1e-5,
        )

    def test_batch_matches_individual(self, tri):
        sharded, _, _ = tri
        outs = sharded.batch_search(QUERIES, top_k=4)
        for q, out in zip(QUERIES, outs):
            assert _ids(out) == _ids(sharded.search(q, top_k=4))

    def test_incremental_add_keeps_sharding_and_parity(self, tri):
        sharded, staged, _ = tri
        extra = [f"Fresh sharded doc {i} about epsilon zeta." for i in range(3)]
        sharded.add_documents(extra)
        staged.add_documents(extra)
        assert sharded.stage2._cache._buf.sharding.spec[0] == "data"
        assert sharded._fused.doc_tokens._buf.sharding.spec[0] == "data"
        o_sh = sharded.search("epsilon zeta fresh", top_k=4)
        o_st = staged.search("epsilon zeta fresh", top_k=4)
        assert o_sh["timing"].get("fused") is True
        assert _ids(o_sh) == _ids(o_st)

    def test_delete_respected(self, tri):
        sharded, staged, _ = tri
        q = QUERIES[0]
        victim = _ids(sharded.search(q, top_k=4))[0]
        sharded.delete_documents([victim])
        staged.delete_documents([victim])
        o_sh = sharded.search(q, top_k=4)
        assert victim not in _ids(o_sh)
        assert _ids(o_sh) == _ids(staged.search(q, top_k=4))


class TestShardedServing:
    def test_mcp_server_over_mesh_pipeline(self):
        """The serving layer is mesh-agnostic: a JSON-RPC search against
        a mesh pipeline rides the shard-mapped fused funnel."""
        import asyncio
        import json

        from tristage_rag_tpu.serve.mcp_server import RetrievalMCPServer

        p = RetrievalPipeline(PipelineConfig(
            enable_fused_search=True, mesh_data_parallel=0, **KW))
        p.add_documents(DOCS)
        server = RetrievalMCPServer(p)

        class W:
            def __init__(self):
                self.chunks = []

            def write(self, data):
                self.chunks.append(data)

            async def drain(self):
                pass

        async def go():
            reader = asyncio.StreamReader()
            writer = W()
            reader.feed_data((json.dumps({
                "jsonrpc": "2.0", "id": 1, "method": "tools/call",
                "params": {"name": "search",
                           "arguments": {"query": QUERIES[0], "top_k": 3}},
            }) + "\n").encode())
            reader.feed_eof()
            await server.run(reader, writer)
            return [
                json.loads(l) for l in
                b"".join(writer.chunks).decode().splitlines() if l.strip()
            ]

        responses = asyncio.run(go())
        ok = [r for r in responses if r.get("id") == 1]
        assert ok and "result" in ok[0]
        payload = json.loads(ok[0]["result"]["content"][0]["text"])
        got = [r["doc_id"] for r in payload["results"]]
        assert got == _ids(p.search(QUERIES[0], top_k=3))
        # the SERVED request itself must have ridden the fused funnel —
        # a silent staged fallback would rank identically
        assert payload["timing"].get("fused") is True, payload["timing"]


class TestShardedApproxParity:
    def test_fused_matches_staged_with_approx_impl(self):
        """With impl=approx both mesh paths run the same per-shard
        approx_max_k (index/dense.py::_sharded_topk), so rankings stay
        identical between fused and staged."""
        sharded = RetrievalPipeline(PipelineConfig(
            enable_fused_search=True, mesh_data_parallel=0, **KW))
        staged = RetrievalPipeline(PipelineConfig(
            enable_fused_search=False, mesh_data_parallel=0, **KW))
        sharded.add_documents(DOCS)
        staged.add_documents(DOCS)
        sharded.stage1.index.search_impl = "approx"
        staged.stage1.index.search_impl = "approx"
        for q in QUERIES[:2]:
            o_sh = sharded.search(q, top_k=4)
            o_st = staged.search(q, top_k=4)
            assert o_sh["timing"].get("fused") is True
            assert _ids(o_sh) == _ids(o_st)


class TestShardedReload:
    def test_fused_ready_after_reload_on_mesh(self, tmp_path):
        kw = dict(KW)
        kw["index_dir"] = str(tmp_path / "idx")
        saver = RetrievalPipeline(PipelineConfig(
            enable_fused_search=True, mesh_data_parallel=0, **kw))
        saver.add_documents(DOCS[:12])
        ref = _ids(saver.search(QUERIES[0], top_k=4))
        saver.save_index()

        loader = RetrievalPipeline(PipelineConfig(
            enable_fused_search=True, mesh_data_parallel=0, **kw))
        assert loader.load_index()
        assert loader._fused is not None and loader._fused.ready()
        assert loader.stage2._cache._buf.sharding.spec[0] == "data"
        out = loader.search(QUERIES[0], top_k=4)
        assert out["timing"].get("fused") is True
        assert _ids(out) == ref


class TestShardedFusedVariants:
    @pytest.mark.parametrize("overrides", [
        {"stage2_cache_int8": True},
        {"stage2_top_k": 6},          # k2 not divisible by 8 devices
        {"stage1_enable_bm25": False},
        {"stage2_scoring_method": "colbert"},
        # weight-only int8 cross-encoder: the DequantModule adapter must
        # survive shard_map with replicated quantized params
        {"stage3_weights_int8": True},
        # pallas act-int8 knob over a mesh: tiny dims fall back to the
        # XLA int8 path inside _int8_dense, but the knob must plumb
        # through the sharded fused program end-to-end
        {"stage3_act_int8": "pallas"},
        # weight-int8 query encoders: replicated q8 dicts (and their
        # in-trace dequant at tiny misaligned dims) under shard_map
        {"stage1_weights_int8": True, "stage2_weights_int8": True},
        # the kernel keep-path over the mesh: aligned dims + forced
        # fused-MLP means the MLP q8 dicts reach the Pallas kernel
        # (interpret mode on CPU) inside the sharded fused program
        {"stage1_model": "tiny-gemma-aligned",
         "stage2_model": "tiny-modernbert-aligned",
         "stage3_model": "tiny-bert-aligned",
         "stage1_weights_int8": True, "stage2_weights_int8": True,
         "stage3_weights_int8": True,
         "stage1_fused_mlp": True, "stage2_fused_mlp": True,
         "stage3_fused_mlp": True},
    ])
    def test_parity_with_staged_mesh(self, overrides):
        kw = dict(KW)
        kw.update(overrides)
        sharded = RetrievalPipeline(PipelineConfig(
            enable_fused_search=True, mesh_data_parallel=0, **kw))
        staged = RetrievalPipeline(PipelineConfig(
            enable_fused_search=False, mesh_data_parallel=0, **kw))
        sharded.add_documents(DOCS)
        staged.add_documents(DOCS)
        for q in QUERIES[:2]:
            o_sh = sharded.search(q, top_k=4)
            o_st = staged.search(q, top_k=4)
            assert o_sh["timing"].get("fused") is True, overrides
            assert _ids(o_sh) == _ids(o_st), overrides
            np.testing.assert_allclose(
                _scores(o_sh, "stage3_score"), _scores(o_st, "stage3_score"),
                rtol=1e-4, atol=1e-5,
            )

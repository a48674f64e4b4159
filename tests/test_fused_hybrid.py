"""Multi-slice/DCN layout (SURVEY.md §5.8): the fused funnel over a
2-D ("dcn", "data") hybrid mesh — corpus and device caches row-sharded
over "data" (ICI within a slice), query batches sharded over "dcn"
(across slices), and every collective in the funnel naming only
"data" so nothing crosses the slow inter-slice links.

The 8-device virtual CPU mesh (tests/conftest.py) splits into
dcn=2 x data=4 pseudo-slices; interconnect distinction is moot on CPU
but the sharding semantics — which is what can break — are identical
to real multi-slice.
"""

import numpy as np
import pytest

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
from tristage_rag_tpu.parallel.mesh import (
    create_hybrid_mesh,
    create_mesh,
    dcn_groups,
)

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
    "number 11 beta",
    "shared alpha 3",
]


def _ids(out):
    return [r["doc_id"] for r in out["results"]]


class TestHybridMeshHelpers:
    def test_pseudo_slice_partition(self):
        mesh = create_hybrid_mesh(2, 4)
        assert mesh.axis_names == ("dcn", "data")
        assert dict(mesh.shape) == {"dcn": 2, "data": 4}
        assert dcn_groups(mesh) == 2

    def test_data_inferred(self):
        mesh = create_hybrid_mesh(4)
        assert dict(mesh.shape) == {"dcn": 4, "data": 2}

    def test_degrades_to_flat(self):
        mesh = create_hybrid_mesh(1, 4)
        assert mesh.axis_names == ("data",)
        assert dcn_groups(mesh) == 1
        assert dcn_groups(None) == 1
        assert dcn_groups(create_mesh(0)) == 1

    def test_overcommit_refused(self):
        with pytest.raises(ValueError):
            create_hybrid_mesh(4, 4)  # 16 > 8 virtual devices
        with pytest.raises(ValueError):
            create_hybrid_mesh(3)  # 8 devices don't split into 3


@pytest.fixture(scope="module")
def tri():
    """(hybrid-fused, flat-mesh-fused, single-device-fused), same corpus."""
    hybrid = RetrievalPipeline(PipelineConfig(
        enable_fused_search=True, mesh_dcn_parallel=2,
        mesh_data_parallel=4, **KW))
    flat = RetrievalPipeline(PipelineConfig(
        enable_fused_search=True, mesh_data_parallel=0, **KW))
    single = RetrievalPipeline(PipelineConfig(
        enable_fused_search=True, mesh_data_parallel=1, **KW))
    for p in (hybrid, flat, single):
        p.add_documents(DOCS)
    return hybrid, flat, single


class TestHybridFused:
    def test_mesh_shape_and_ready(self, tri):
        hybrid, _, _ = tri
        assert dict(hybrid.mesh.shape) == {"dcn": 2, "data": 4}
        assert hybrid._fused is not None and hybrid._fused.ready()
        assert hybrid._fused.ndcn == 2

    def test_caches_row_sharded_within_slice(self, tri):
        hybrid, _, _ = tri
        s2 = hybrid.stage2._cache
        assert s2._buf.sharding.spec[0] == "data"
        # 4-way over "data", replicated over "dcn": per-device rows are
        # capacity / 4, NOT capacity / 8
        shard_shape = s2._buf.sharding.shard_shape(s2._buf.shape)
        assert shard_shape[0] * 4 == s2._buf.shape[0]
        d3 = hybrid._fused.doc_tokens
        assert d3._buf.sharding.shard_shape(d3._buf.shape)[0] * 4 \
            == d3._buf.shape[0]

    @pytest.mark.parametrize("query", QUERIES[:3])
    def test_single_query_matches_flat_and_single(self, tri, query):
        hybrid, flat, single = tri
        o_h = hybrid.search(query, top_k=4)
        assert o_h["timing"].get("fused") is True
        o_f = flat.search(query, top_k=4)
        o_s = single.search(query, top_k=4)
        assert _ids(o_h) == _ids(o_f) == _ids(o_s)
        np.testing.assert_allclose(
            [r["stage3_score"] for r in o_h["results"]],
            [r["stage3_score"] for r in o_s["results"]],
            rtol=1e-4, atol=1e-5,
        )

    def test_batch_sharded_over_dcn_matches_individual(self, tri):
        """The load-bearing hybrid case: the batch program shards the
        query axis over "dcn" — every query's result must equal its
        own single-query search (queries land on different slices)."""
        hybrid, _, _ = tri
        outs = hybrid.batch_search(QUERIES, top_k=4)
        for q, out in zip(QUERIES, outs):
            assert _ids(out) == _ids(hybrid.search(q, top_k=4)), q

    def test_batch_odd_sizes(self, tri):
        """Batches that don't divide ndcn get padded up, never dropped."""
        hybrid, flat, _ = tri
        for n in (1, 3):
            outs_h = hybrid.batch_search(QUERIES[:n], top_k=4)
            outs_f = flat.batch_search(QUERIES[:n], top_k=4)
            assert len(outs_h) == n
            for oh, of in zip(outs_h, outs_f):
                assert _ids(oh) == _ids(of)

    def test_incremental_add_and_delete(self, tri):
        hybrid, flat, _ = tri
        extra = [f"Hybrid fresh doc {i} about epsilon zeta." for i in range(3)]
        hybrid.add_documents(extra)
        flat.add_documents(extra)
        q = "epsilon zeta fresh"
        o_h = hybrid.search(q, top_k=4)
        assert o_h["timing"].get("fused") is True
        assert _ids(o_h) == _ids(flat.search(q, top_k=4))
        victim = _ids(o_h)[0]
        hybrid.delete_documents([victim])
        flat.delete_documents([victim])
        o_h2 = hybrid.search(q, top_k=4)
        assert victim not in _ids(o_h2)
        assert _ids(o_h2) == _ids(flat.search(q, top_k=4))

    def test_staged_path_on_hybrid_mesh(self):
        """The staged fallback (shard-mapped stage-1 + mesh stage-2/3)
        also runs on the hybrid mesh, ranking-identical to fused."""
        staged = RetrievalPipeline(PipelineConfig(
            enable_fused_search=False, mesh_dcn_parallel=2,
            mesh_data_parallel=4, **KW))
        fused = RetrievalPipeline(PipelineConfig(
            enable_fused_search=True, mesh_dcn_parallel=2,
            mesh_data_parallel=4, **KW))
        staged.add_documents(DOCS)
        fused.add_documents(DOCS)
        for q in QUERIES[:2]:
            o_st = staged.search(q, top_k=4)
            o_fu = fused.search(q, top_k=4)
            assert o_fu["timing"].get("fused") is True
            assert _ids(o_st) == _ids(o_fu)


class TestHybridConfigRoundTrip:
    def test_yaml_round_trip(self, tmp_path):
        cfg = PipelineConfig(mesh_dcn_parallel=2, mesh_data_parallel=4)
        p = tmp_path / "cfg.yaml"
        cfg.export(p)
        back = PipelineConfig.from_yaml(p)
        assert back.mesh_dcn_parallel == 2
        assert back.mesh_data_parallel == 4

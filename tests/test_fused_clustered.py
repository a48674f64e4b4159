"""Clustered (IVF-equivalent) stage-1 INSIDE the fused funnel.

The clustered probe (ops/blockskip.py — the reference's FAISS
nlist/nprobe counterpart, src/stage1_retriever.py:256-283) measured
21-33x the scan paths at 1M docs (BENCH_NOTES), but previously only
served the two-step index.search(); the single-dispatch funnel always
fell back to the full scan. These tests pin the integration contract:

* fused == staged on a clustered index — single query, batch, after
  deletes, and after a stale-view rebuild (adds since the last build);
* ineligibility (small corpus, sharded mesh, k over a full probe)
  leaves the funnel on the scan path rather than breaking it.
"""

import numpy as np
import pytest

from tristage_rag_tpu.index.dense import DenseIndex, MIN_CLUSTER_BLOCKS


def _docs(n=64, seed=0):
    words = [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
    ]
    rng = np.random.default_rng(seed)
    return [
        " ".join(rng.choice(words, size=8)) + f" topic{i % 7}"
        for i in range(n)
    ]


def _pipelines(tmp_path_factory=None, **overrides):
    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    kw = dict(
        stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
        stage3_model="tiny-bert", stage1_top_k=12, stage2_top_k=8,
        stage3_top_k=4, stage1_max_text_length=64,
        stage2_max_seq_length=32, stage3_max_length=64,
        mesh_data_parallel=1, compute_dtype="float32",
        stage2_cache_doc_embeddings=True,
        index_search_impl="clustered",
        index_cluster_block_size=8, index_cluster_n_probe=4,
    )
    kw.update(overrides)
    fused = RetrievalPipeline(PipelineConfig(enable_fused_search=True, **kw))
    staged = RetrievalPipeline(PipelineConfig(enable_fused_search=False, **kw))
    return fused, staged


def _ids(out):
    return [r["doc_id"] for r in out["results"]]


@pytest.fixture(scope="module")
def clustered_pair():
    fused, staged = _pipelines()
    docs = _docs()
    fused.add_documents(docs)
    staged.add_documents(docs)
    return fused, staged, docs


class TestFusedClusteredParity:
    QUERIES = [
        "alpha beta topic3",
        "gamma delta topic1",
        "kappa mu topic5",
    ]

    def test_probe_actually_engaged(self, clustered_pair):
        fused, _, _ = clustered_pair
        idx = fused.stage1.index
        assert idx._impl() == "clustered"
        st = idx.fused_cluster_state(12)
        assert st is not None
        assert st["n_probe"] < st["row_ids"].shape[0]  # genuinely skips
        out = fused.search("alpha beta topic3")
        assert out["timing"].get("fused") is True

    @pytest.mark.parametrize("query", QUERIES)
    def test_single_query_matches_staged(self, clustered_pair, query):
        fused, staged, _ = clustered_pair
        of, os_ = fused.search(query), staged.search(query)
        assert of["timing"].get("fused") is True
        assert _ids(of) == _ids(os_)
        for rf, rs in zip(of["results"], os_["results"]):
            assert rf["stage1_score"] == pytest.approx(
                rs["stage1_score"], rel=1e-5, abs=1e-6
            )
            assert rf["stage3_score"] == pytest.approx(
                rs["stage3_score"], rel=1e-4, abs=1e-5
            )

    def test_batch_matches_staged_batch(self, clustered_pair):
        # both paths probe the whole batch in one blockskip call, so
        # tile-shared probe sets match exactly
        fused, staged, _ = clustered_pair
        bf = fused.batch_search(self.QUERIES)
        bs = staged.batch_search(self.QUERIES)
        for a, b in zip(bf, bs):
            assert a["timing"].get("fused") is True
            assert _ids(a) == _ids(b)

    def test_bucket_pad_queries_cannot_steer_probe_tiles(self):
        """search_batch_dispatch pads batches to a power-of-two bucket
        with "" queries whose REAL encoder embeddings would otherwise
        enter the tile max-pool and steer the shared probe set away
        from the staged (unpadded) batch's blocks. The real-query mask
        must neutralize them: a 3-query batch (padded to 4) must rank
        identically to the staged path (code-review finding, session
        12 — reproduced as a ranking divergence before the fix)."""
        fused, staged = _pipelines(
            index_cluster_block_size=8, index_cluster_n_probe=2,
            stage1_top_k=8, stage2_top_k=6, stage3_top_k=4,
        )
        docs = _docs(n=128, seed=0)
        fused.add_documents(docs)
        staged.add_documents(docs)
        # this (corpus, query) pair measurably diverges when the ""
        # pad's embedding enters the probe max-pool (verified by
        # re-running with the mask disabled)
        qs = ["beta delta topic1"] * 3  # pads to bucket 4
        bf = fused.batch_search(qs)
        bs = staged.batch_search(qs)
        for a, b in zip(bf, bs):
            assert a["timing"].get("fused") is True
            assert _ids(a) == _ids(b)
        # mixed batch at a non-bucket size too
        qs2 = ["alpha beta topic1", "mu nu topic5", "xi omicron topic2"]
        for a, b in zip(fused.batch_search(qs2), staged.batch_search(qs2)):
            assert _ids(a) == _ids(b)

    def test_delete_respected(self, clustered_pair):
        fused, staged, _ = clustered_pair
        q = "alpha beta topic3"
        victim = _ids(fused.search(q))[0]
        fused.delete_documents([victim])
        staged.delete_documents([victim])
        of, os_ = fused.search(q), staged.search(q)
        assert victim not in _ids(of)
        assert _ids(of) == _ids(os_)

    def test_add_rebuilds_stale_view(self, clustered_pair):
        fused, staged, _ = clustered_pair
        doc = "fresh document about alpha beta topic3 unique"
        fused.add_documents([doc])
        staged.add_documents([doc])
        of = fused.search("fresh unique alpha")
        os_ = staged.search("fresh unique alpha")
        assert of["timing"].get("fused") is True
        assert _ids(of) == _ids(os_)
        idx = fused.stage1.index
        assert idx._cluster is not None
        assert idx._cluster.built_count == idx.count


class TestFusedClusteredEligibility:
    def test_small_corpus_stays_on_scan(self):
        fused, staged = _pipelines()
        docs = _docs(n=16)  # below MIN_CLUSTER_BLOCKS * block_size
        fused.add_documents(docs)
        staged.add_documents(docs)
        idx = fused.stage1.index
        assert idx._impl() == "exact"
        assert idx.fused_cluster_state(8) is None
        of = fused.search("alpha beta")
        assert of["timing"].get("fused") is True  # funnel still serves
        assert _ids(of) == _ids(staged.search("alpha beta"))

    def test_sharded_mesh_returns_per_shard_budget(self):
        from tristage_rag_tpu.parallel.mesh import create_mesh

        rng = np.random.default_rng(40)
        rows = rng.standard_normal((1024, 16)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        idx = DenseIndex(
            dim=16, mesh=create_mesh(8), search_impl="clustered",
            cluster_block_size=32, cluster_n_probe=32,
        )
        idx.add(rows)
        assert idx._impl() == "clustered"
        st = idx.fused_cluster_state(10)
        assert st is not None
        # per-shard budget: ceil(global n_probe / shards), same split
        # as the staged _clustered_search_sharded
        assert st["n_probe"] == 4
        assert st["blocked"].sharding.spec[0] == "data"
        # a k no shard's probed pool can serve refuses
        assert idx.fused_cluster_state(10_000) is None

    def test_k_exceeding_full_probe_returns_none(self):
        rng = np.random.default_rng(41)
        rows = rng.standard_normal((MIN_CLUSTER_BLOCKS * 8, 16)).astype(
            np.float32
        )
        idx = DenseIndex(
            dim=16, search_impl="clustered", cluster_block_size=8,
            cluster_n_probe=2,
        )
        idx.add(rows)
        assert idx._impl() == "clustered"
        assert idx.fused_cluster_state(rows.shape[0] + 1) is None
        st = idx.fused_cluster_state(8)
        assert st is not None
        # probe floor grows so k always fits the probed pool
        assert st["n_probe"] * 8 >= 8

    def test_sharded_funnel_probes_and_matches_staged(self):
        """Distributed-IVF inside the shard-mapped funnel: per-shard
        probe + all-gather merge must match the staged sharded path
        (same pool split via _sharded_blockskip) exactly."""
        fused, staged = _pipelines(
            mesh_data_parallel=0,
            index_cluster_block_size=4, index_cluster_n_probe=16,
            stage1_top_k=12,
        )
        docs = _docs(n=256, seed=7)
        fused.add_documents(docs)
        staged.add_documents(docs)
        idx = fused.stage1.index
        assert idx._impl() == "clustered"
        st = idx.fused_cluster_state(12)
        assert st is not None
        nbl = st["row_ids"].shape[0] // 8
        assert st["n_probe"] < nbl  # probing genuinely skips per shard
        for q in ("alpha beta topic3", "kappa mu topic5"):
            of, os_ = fused.search(q), staged.search(q)
            assert of["timing"].get("fused") is True
            assert _ids(of) == _ids(os_)
        bf = fused.batch_search(["alpha beta topic3", "gamma topic1"])
        bs = staged.batch_search(["alpha beta topic3", "gamma topic1"])
        for a, b in zip(bf, bs):
            assert _ids(a) == _ids(b)
        # deletes tombstone the sharded view through the funnel too
        victim = _ids(fused.search("alpha beta topic3"))[0]
        fused.delete_documents([victim])
        staged.delete_documents([victim])
        of2 = fused.search("alpha beta topic3")
        assert victim not in _ids(of2)
        assert _ids(of2) == _ids(staged.search("alpha beta topic3"))

    def test_save_load_roundtrip_keeps_probe_and_ranking(self, tmp_path):
        """load_index restores the persisted cluster ORDER (no k-means
        re-run) and the reloaded fused funnel probes identically."""
        fused, _ = _pipelines(index_dir=str(tmp_path / "idx"))
        docs = _docs(seed=5)
        fused.add_documents(docs)
        q = "alpha beta topic3"
        ref = _ids(fused.search(q))  # also builds the view
        fused.save_index()
        fresh, _ = _pipelines(index_dir=str(tmp_path / "idx"))
        assert fresh.load_index()
        idx = fresh.stage1.index
        # the view restored from the saved order — already built
        assert idx._cluster is not None
        assert idx._cluster.built_count == idx.count
        out = fresh.search(q)
        assert out["timing"].get("fused") is True
        assert _ids(out) == ref

    def test_int8_corpus_probes_with_scales(self):
        fused, staged = _pipelines(index_dtype="int8")
        docs = _docs(seed=3)
        fused.add_documents(docs)
        staged.add_documents(docs)
        st = fused.stage1.index.fused_cluster_state(12)
        assert st is not None and st["scales"] is not None
        q = "gamma delta topic1"
        of, os_ = fused.search(q), staged.search(q)
        assert of["timing"].get("fused") is True
        assert _ids(of) == _ids(os_)

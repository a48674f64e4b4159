import numpy as np


def test_warmup(tiny_config, sample_docs):
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    p = RetrievalPipeline(tiny_config)
    assert p.warmup() is False  # empty index -> no-op
    p.add_documents(sample_docs[:3])
    assert p.warmup() is True
    # warmup must not pollute performance stats
    assert p.performance_stats["total_queries"] == 0
    out = p.search("BM25 lexical", top_k=2)
    assert out["results"] and p.performance_stats["total_queries"] == 1
import pytest

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline


@pytest.fixture(scope="module")
def pipeline(tiny_config_module, docs_module):
    p = RetrievalPipeline(tiny_config_module)
    p.add_documents(docs_module, [{"source": f"doc{i}"} for i in range(len(docs_module))])
    return p


@pytest.fixture(scope="module")
def tiny_config_module():
    return PipelineConfig(
        stage1_model="tiny-gemma",
        stage2_model="tiny-modernbert",
        stage3_model="tiny-bert",
        stage1_top_k=8,
        stage1_bm25_top_k=8,
        stage2_top_k=6,
        stage3_top_k=3,
        stage1_max_text_length=64,
        stage2_max_seq_length=32,
        stage3_max_length=64,
        compute_dtype="float32",
        mesh_data_parallel=1,
        save_intermediate_results=True,
    )


@pytest.fixture(scope="module")
def docs_module():
    return [
        "JAX is a library for composable function transformations in Python.",
        "The TPU matrix unit multiplies tiles in bfloat16 precision.",
        "Reciprocal rank fusion combines multiple ranked retrieval lists.",
        "BM25 is a classic lexical scoring function used in search engines.",
        "ColBERT performs late interaction with per-token embeddings.",
        "Cross-encoders jointly encode a query and a document pair.",
        "The quick brown fox jumps over the lazy dog.",
        "High bandwidth memory feeds the vector units on chip.",
    ]


class TestPipeline:
    def test_search_result_contract(self, pipeline):
        out = pipeline.search("lexical scoring BM25 search", top_k=3)
        assert out["query"] == "lexical scoring BM25 search"
        assert 1 <= len(out["results"]) <= 3
        r = out["results"][0]
        for key in ("doc_id", "document", "score", "stage1_score",
                    "stage2_score", "stage3_score", "metadata", "stage"):
            assert key in r, key
        assert r["stage"] == "stage3"
        assert isinstance(r["metadata"], dict) and "source" in r["metadata"]

    def test_funnel_sizes(self, pipeline):
        out = pipeline.search("fox jumps")
        assert len(out["stage1_results"]) <= 8
        assert len(out["stage2_results"]) <= 6
        assert len(out["results"]) <= 3
        assert all(r["stage"] == "stage1" for r in out["stage1_results"])
        assert all(r["stage"] == "stage2" for r in out["stage2_results"])

    def test_timing_shape(self, pipeline):
        out = pipeline.search("memory bandwidth")
        t = out["timing"]
        for key in ("stage1_time", "stage2_time", "stage3_time", "total_time"):
            assert t[key] is not None and t[key] >= 0

    def test_performance_stats_accumulate(self, pipeline):
        before = pipeline.performance_stats["total_queries"]
        pipeline.search("anything at all")
        stats = pipeline.performance_stats
        assert stats["total_queries"] == before + 1
        assert stats["avg_total_time"] > 0
        assert len(stats["search_history"]) >= 1

    def test_bm25_relevance_on_exact_terms(self, pipeline):
        # hash-embedding model is random, but BM25 fusion must still
        # surface the exact-term doc into stage-1 candidates
        out = pipeline.search("quick brown fox lazy dog", top_k=3)
        docs = [r["document"] for r in out["stage1_results"]]
        assert any("quick brown fox" in d for d in docs)

    def test_batch_search(self, pipeline):
        outs = pipeline.batch_search(["fox", "bm25"], top_k=2)
        assert len(outs) == 2
        assert all(len(o["results"]) <= 2 for o in outs)

    def test_get_pipeline_info(self, pipeline):
        info = pipeline.get_pipeline_info()
        assert info["initialized"]
        assert info["stage1"]["num_documents"] == 8
        assert "stage2" in info and "stage3" in info

    def test_index_persistence_roundtrip(self, pipeline, tmp_path, tiny_config_module, docs_module):
        pipeline.save_index(str(tmp_path))
        import dataclasses

        cfg = dataclasses.replace(tiny_config_module, index_dir=str(tmp_path))
        p2 = RetrievalPipeline(cfg)
        assert p2.load_index(str(tmp_path))
        out = pipeline.search("late interaction colbert", top_k=3)
        out2 = p2.search("late interaction colbert", top_k=3)
        assert [r["doc_id"] for r in out["results"]] == [
            r["doc_id"] for r in out2["results"]
        ]

    def test_clear_index(self, tiny_config_module, docs_module):
        p = RetrievalPipeline(tiny_config_module)
        p.add_documents(docs_module[:3])
        assert p.get_document_count() == 3
        p.clear_index()
        assert p.get_document_count() == 0
        with pytest.raises(ValueError):
            p.search("anything")

    def test_empty_query_no_crash(self, pipeline):
        out = pipeline.search("", top_k=2)
        assert isinstance(out["results"], list)


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = PipelineConfig(stage1_top_k=123, stage2_scoring_method="colbert")
        path = tmp_path / "cfg.yaml"
        cfg.export(path)
        loaded = PipelineConfig.from_yaml(path)
        assert loaded.stage1_top_k == 123
        assert loaded.stage2_scoring_method == "colbert"
        assert loaded.as_dict() == cfg.as_dict()

    def test_partial_yaml_defaults(self, tmp_path):
        path = tmp_path / "partial.yaml"
        path.write_text("pipeline:\n  stage1:\n    top_k: 42\n")
        cfg = PipelineConfig.from_yaml(path)
        assert cfg.stage1_top_k == 42
        assert cfg.stage3_top_k == 20  # default preserved


class TestMeshPipeline:
    def test_sharded_pipeline_matches_single_device(self, docs_module):
        import jax
        import pytest as _pytest

        if len(jax.devices()) < 8:
            _pytest.skip("needs 8 devices")
        base = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
            stage3_top_k=3, stage1_max_text_length=32,
            stage2_max_seq_length=32, stage3_max_length=48,
            compute_dtype="float32", mesh_data_parallel=1,
        )
        import dataclasses

        sharded_cfg = dataclasses.replace(base, mesh_data_parallel=0)
        single = RetrievalPipeline(base)
        single.add_documents(docs_module)
        sharded = RetrievalPipeline(sharded_cfg)
        assert sharded.mesh is not None and sharded.mesh.size == 8
        sharded.add_documents(docs_module)
        q = "lexical scoring BM25"
        a = single.search(q, top_k=3)["results"]
        b = sharded.search(q, top_k=3)["results"]
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


class TestScaleProfile:
    def test_scale_yaml_all_accelerators_active(self, tmp_path):
        """configs/scale.yaml (the capacity profile; named perf.yaml
        through round 4) turns on every opt-in accelerator; loading
        it (with tiny models substituted) must yield a pipeline where
        each knob is really active — not just parsed."""
        import dataclasses
        from pathlib import Path

        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = PipelineConfig.from_yaml(
            Path(__file__).parent.parent / "configs" / "scale.yaml"
        )
        assert cfg.index_dtype == "int8"
        assert cfg.index_search_impl == "approx"
        assert cfg.stage2_cache_int8 and cfg.stage3_weights_int8
        # the result cache is deliberately OFF since the round-4
        # Zipf-1.5 A/B/A (-38% QPS for -35% p50: a latency knob, not a
        # throughput knob — BENCH_NOTES round 4)
        assert not cfg.enable_result_cache
        assert cfg.result_cache_size == 4096
        assert cfg.compilation_cache_dir  # restart story, compile half
        cfg = dataclasses.replace(
            cfg, stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
            stage3_top_k=3, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            mesh_data_parallel=1, compute_dtype="float32",
            index_dir=str(tmp_path),
            compilation_cache_dir=str(tmp_path / "xla_cache"),
        )
        p = RetrievalPipeline(cfg)
        p.add_documents([f"doc {i} fox topic {i % 3}" for i in range(12)])
        assert p.stage1.index.quantized
        assert p.stage1.index.search_impl == "approx"
        assert p.stage2._cache is not None and p.stage2._cache.quantized
        out = p.search("fox topic 1", top_k=3)
        assert out["results"]
        # scale.yaml ships the result cache OFF (round-4 Zipf A/B/A:
        # throughput loss); a repeat query must NOT be served host-side
        hit = p.search("fox topic 1", top_k=3)
        assert hit["timing"].get("cached") is not True
        assert [r["doc_id"] for r in hit["results"]] == [
            r["doc_id"] for r in out["results"]
        ]

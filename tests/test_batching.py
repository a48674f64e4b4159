"""Batched multi-query paths vs the single-query reference path."""

import numpy as np
import pytest

from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline


@pytest.fixture(scope="module")
def pipeline():
    cfg = PipelineConfig(
        stage1_model="tiny-gemma",
        stage2_model="tiny-modernbert",
        stage3_model="tiny-bert",
        stage1_top_k=10, stage2_top_k=6, stage3_top_k=4,
        stage1_max_text_length=32, stage2_max_seq_length=32,
        stage3_max_length=48, compute_dtype="float32",
        mesh_data_parallel=1, save_intermediate_results=True,
    )
    p = RetrievalPipeline(cfg)
    docs = [
        f"document number {i} about {topic}"
        for i, topic in enumerate(
            ["foxes and dogs", "bm25 scoring", "tpu matmuls", "jax tracing",
             "colbert tokens", "cross encoders", "sharded meshes",
             "vector search", "rank fusion", "beam search"]
        )
    ]
    p.add_documents(docs)
    return p


class TestBatchedSearchEquivalence:
    QUERIES = ["bm25 scoring", "tpu matmuls", "colbert tokens"]

    def test_same_results_as_sequential(self, pipeline):
        batched = pipeline.batch_search(self.QUERIES, top_k=4)
        for q, b in zip(self.QUERIES, batched):
            single = pipeline.search(q, top_k=4)
            assert [r["doc_id"] for r in b["results"]] == [
                r["doc_id"] for r in single["results"]
            ], q
            np.testing.assert_allclose(
                [r["stage2_score"] for r in b["results"]],
                [r["stage2_score"] for r in single["results"]],
                rtol=1e-5,
            )

    def test_batched_stage3_scores_match(self, pipeline):
        batched = pipeline.batch_search(self.QUERIES, top_k=4)
        for q, b in zip(self.QUERIES, batched):
            single = pipeline.search(q, top_k=4)
            np.testing.assert_allclose(
                [r["stage3_score"] for r in b["results"]],
                [r["stage3_score"] for r in single["results"]],
                atol=1e-5,
            )

    def test_empty_batch(self, pipeline):
        assert pipeline.batch_search([]) == []

    def test_batch_with_empty_query(self, pipeline):
        outs = pipeline.batch_search(["bm25", ""], top_k=2)
        assert len(outs) == 2
        assert all("timing" in o for o in outs)

    def test_stage2_union_encoding_shares_work(self, pipeline):
        # same candidates across queries must produce per-query scores
        outs = pipeline.batch_search(["vector search", "vector search"], top_k=3)
        a, b = outs
        assert [r["doc_id"] for r in a["results"]] == [
            r["doc_id"] for r in b["results"]
        ]

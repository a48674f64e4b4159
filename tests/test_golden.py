"""Golden-file e2e regression (SURVEY.md §4's strategy).

The tiny models are deterministic (seeded init + stable FNV-1a hash
tokenizer), so end-to-end rankings over the bundled fixture corpus are
reproducible bit-for-bit on CPU. Any change to tokenization, encoder
numerics, fusion, funnel plumbing, or score activations that alters
these rankings must be deliberate — update the goldens in that case.
"""

import pytest

from tristage_rag_tpu.apps.chunker import extract_documents
from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

GOLDEN = {
    "bm25 term frequency ranking": [0, 1, 2],
    "systolic array bfloat16": [0, 2, 1],
    "reciprocal rank fusion": [2, 0, 1],
}


@pytest.fixture(scope="module")
def golden_pipeline():
    docs = extract_documents("examples/test_docs.json")
    cfg = PipelineConfig(
        stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
        stage3_model="tiny-bert", stage1_top_k=5, stage2_top_k=4,
        stage3_top_k=3, stage1_max_text_length=64,
        stage2_max_seq_length=32, stage3_max_length=64,
        compute_dtype="float32", mesh_data_parallel=1, seed=0,
    )
    p = RetrievalPipeline(cfg)
    p.add_documents(docs)
    return p


@pytest.mark.parametrize("query", sorted(GOLDEN))
def test_golden_ranking(golden_pipeline, query):
    out = golden_pipeline.search(query, top_k=3)
    assert [r["doc_id"] for r in out["results"]] == GOLDEN[query]


def test_golden_batch_matches(golden_pipeline):
    outs = golden_pipeline.batch_search(sorted(GOLDEN), top_k=3)
    for q, o in zip(sorted(GOLDEN), outs):
        assert [r["doc_id"] for r in o["results"]] == GOLDEN[q]

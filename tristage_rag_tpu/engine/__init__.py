from tristage_rag_tpu.engine.config import PipelineConfig
from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
from tristage_rag_tpu.engine.stage1 import Stage1Retriever
from tristage_rag_tpu.engine.stage2 import ColBERTScorer
from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

__all__ = [
    "PipelineConfig",
    "RetrievalPipeline",
    "Stage1Retriever",
    "ColBERTScorer",
    "CrossEncoderReranker",
]

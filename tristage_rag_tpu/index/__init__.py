from tristage_rag_tpu.index.dense import DenseIndex
from tristage_rag_tpu.index.bm25 import BM25Index, bm25_tokenize

__all__ = ["DenseIndex", "BM25Index", "bm25_tokenize"]

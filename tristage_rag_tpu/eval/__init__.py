from tristage_rag_tpu.eval.harness import run_evaluation, index_task_corpus
from tristage_rag_tpu.eval.limit import (
    RetrievalTask,
    download_limit,
    load_limit,
)
from tristage_rag_tpu.eval.metrics import evaluate_retrieval
from tristage_rag_tpu.eval.downloaders import ModelDownloader

__all__ = [
    "RetrievalTask",
    "run_evaluation",
    "index_task_corpus",
    "load_limit",
    "download_limit",
    "evaluate_retrieval",
    "ModelDownloader",
]

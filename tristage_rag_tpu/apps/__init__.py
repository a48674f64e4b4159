from tristage_rag_tpu.apps.chunker import chunk_text, extract_documents, extract_text
from tristage_rag_tpu.apps.cli import RetrievalApp, main
from tristage_rag_tpu.apps.docmanager import DocumentManager
from tristage_rag_tpu.apps.generation import SimpleGenerator, answer_from_rag

__all__ = [
    "chunk_text",
    "extract_text",
    "extract_documents",
    "RetrievalApp",
    "DocumentManager",
    "SimpleGenerator",
    "answer_from_rag",
    "main",
]

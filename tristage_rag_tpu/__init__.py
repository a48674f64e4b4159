"""tristage_rag_tpu — a TPU-native three-stage retrieval engine.

Re-implements the capabilities of TriStage-RAG (see SURVEY.md) as an
idiomatic JAX/XLA/Pallas framework:

* stage 1: dense candidate generation — Flax bi-encoder + fused
  matmul/top-k over an HBM-resident, document-sharded embedding matrix,
  optionally fused with a vectorized BM25 index via RRF.
* stage 2: ColBERT-style late-interaction MaxSim rescoring as a masked,
  batched Pallas/XLA kernel (no per-candidate Python loops).
* stage 3: cross-encoder reranking as batched XLA inference.

One orchestrator (`engine.pipeline.RetrievalPipeline`) serves every
front-end: MCP stdio server, CLI app, web UI, and the MTEB-style
evaluation harness.
"""

from tristage_rag_tpu.version import __version__

__all__ = ["__version__"]

"""Test configuration: CPU backend with 8 virtual devices.

Multi-device sharding paths are exercised on a virtual CPU mesh
(SURVEY.md §4 — "multi-core index-shard tests run on CPU via
xla_force_host_platform_device_count"), so the suite needs no TPU and
no model assets. Must run before jax initializes its backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so the env vars above can be too late — force the
# platform through the live config as well.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_config():
    from tristage_rag_tpu.engine.config import PipelineConfig

    return PipelineConfig(
        stage1_model="tiny-gemma",
        stage2_model="tiny-modernbert",
        stage3_model="tiny-bert",
        stage1_top_k=20,
        stage1_bm25_top_k=20,
        stage2_top_k=10,
        stage3_top_k=5,
        stage2_max_seq_length=32,
        stage3_max_length=64,
        stage1_max_text_length=64,
        compute_dtype="float32",
        mesh_data_parallel=1,
    )


@pytest.fixture()
def sample_docs():
    return [
        "JAX is a library for composable function transformations in Python.",
        "The TPU matrix unit multiplies 128x128 tiles in bfloat16.",
        "Reciprocal rank fusion combines multiple ranked retrieval lists.",
        "BM25 is a classic lexical scoring function used in search engines.",
        "ColBERT performs late interaction with per-token embeddings.",
        "Cross-encoders jointly encode a query and a document pair.",
        "The quick brown fox jumps over the lazy dog.",
        "High bandwidth memory feeds the vector processing units on chip.",
        "Sharding a document matrix across devices scales retrieval.",
        "Flax linen modules define neural networks functionally.",
    ]

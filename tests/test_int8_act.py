"""int8-activation cross-encoder (``stage3_act_int8``).

All dense projections in the stage-3 encoder run int8 x int8 on the
MXU (models/layers.py::QDense/QDenseGeneral): dynamic per-token
symmetric activation quantization, per-output-channel weights, int32
accumulation. The param tree is IDENTICAL to the bf16 module's, so
checkpoints and trained params swap between the two paths unchanged.

BENCH_NOTES round-3 context: weight-only int8 measured latency-neutral
(stage-3 is MXU compute-bound); int8 activations tap the MXU's 2x int8
peak — this file pins the numerics so the perf lever can't drift the
rankings.
"""

from __future__ import annotations

import numpy as np
import pytest


def _base(**extra):
    from tristage_rag_tpu.engine.config import PipelineConfig

    return PipelineConfig(
        stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
        stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
        stage3_top_k=3, stage1_max_text_length=64,
        stage2_max_seq_length=32, stage3_max_length=64,
        mesh_data_parallel=1, compute_dtype="float32", **extra,
    )


DOCS = [f"doc {i} about topic {i % 4} quick brown fox" for i in range(16)]


class TestQDenseUnits:
    def test_qdense_param_tree_matches_nn_dense(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from tristage_rag_tpu.models.layers import QDense

        x = jnp.ones((2, 8))
        pq = QDense(features=16).init(jax.random.PRNGKey(0), x)
        pd = nn.Dense(features=16).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pd)
        for a, b in zip(jax.tree_util.tree_leaves(pq), jax.tree_util.tree_leaves(pd)):
            assert a.shape == b.shape

    def test_qdense_general_param_tree_matches(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from tristage_rag_tpu.models.layers import QDenseGeneral

        x = jnp.ones((2, 5, 24))
        pq = QDenseGeneral(features=(4, 6)).init(jax.random.PRNGKey(0), x)
        pd = nn.DenseGeneral(features=(4, 6)).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pd)
        # o_proj form: contract the two trailing axes
        y = jnp.ones((2, 5, 4, 6))
        pq2 = QDenseGeneral(features=24, axis=(-2, -1)).init(jax.random.PRNGKey(0), y)
        pd2 = nn.DenseGeneral(features=24, axis=(-2, -1)).init(jax.random.PRNGKey(0), y)
        for a, b in zip(
            jax.tree_util.tree_leaves(pq2), jax.tree_util.tree_leaves(pd2)
        ):
            assert a.shape == b.shape

    def test_qdense_matches_dense_within_quant_error(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from tristage_rag_tpu.models.layers import QDense

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
        p = nn.Dense(features=64).init(jax.random.PRNGKey(1), x)
        y_ref = np.asarray(nn.Dense(features=64).apply(p, x))
        y_q = np.asarray(QDense(features=64).apply(p, x))
        # two int8 quantizations => relative error ~1%, scaled by row norm
        denom = np.maximum(np.abs(y_ref).max(), 1e-6)
        assert np.abs(y_q - y_ref).max() / denom < 0.05

    def test_qdense_consumes_prequantized_dict_kernel(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from tristage_rag_tpu.index.token_cache import symmetric_int8
        from tristage_rag_tpu.models.layers import QDense

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
        p = nn.Dense(features=12).init(jax.random.PRNGKey(1), x)
        k = np.asarray(p["params"]["kernel"])  # [16, 12]
        q8_t, scale = symmetric_int8(jnp.asarray(k.T))  # [12,16], [12]
        qp = {
            "params": {
                "kernel": {"q8": jnp.asarray(np.asarray(q8_t).T), "scale": scale},
                "bias": p["params"]["bias"],
            }
        }
        y_plain = np.asarray(QDense(features=12).apply(p, x))
        y_dict = np.asarray(QDense(features=12).apply(qp, x))
        np.testing.assert_allclose(y_plain, y_dict, atol=1e-5)


class TestStage3ActInt8:
    def test_rankings_identical_scores_close(self):
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        # raw sigmoid scores (min-max normalization rescales the whole
        # batch by the extremes, amplifying per-score deltas ~3x)
        base = CrossEncoderReranker(_base(stage3_normalize_scores=False))
        q = CrossEncoderReranker(
            _base(stage3_act_int8="pallas", stage3_normalize_scores=False)
        )
        # same seed => same random init; param trees must be identical
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(base.runtime.params),
            jax.tree_util.tree_leaves(q.runtime.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        query = "quick brown fox topic 2"
        s_base = np.asarray(base.predict(query, DOCS))
        s_q = np.asarray(q.predict(query, DOCS))
        assert np.abs(s_base - s_q).max() < 0.03
        # rankings may only differ by swaps of near-ties: every pair the
        # two paths order differently must be closer than the quant
        # noise floor in the base scores
        o_base = np.argsort(-s_base)
        o_q = np.argsort(-s_q)
        if o_base.tolist() != o_q.tolist():
            rank_q = {d: r for r, d in enumerate(o_q)}
            for i in range(len(o_base)):
                for j in range(i + 1, len(o_base)):
                    a, b = o_base[i], o_base[j]
                    if rank_q[a] > rank_q[b]:  # order flipped
                        assert abs(s_base[a] - s_base[b]) < 0.02, (a, b)

    def test_full_pipeline_parity(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p_base = RetrievalPipeline(_base())
        p_q = RetrievalPipeline(_base(stage3_act_int8="pallas"))
        p_base.add_documents(DOCS)
        p_q.add_documents(DOCS)
        for query in ("quick brown fox", "topic 1 doc"):
            r_base = p_base.search(query, top_k=3)["results"]
            r_q = p_q.search(query, top_k=3)["results"]
            assert [r["doc_id"] for r in r_base] == [r["doc_id"] for r in r_q]
            for a, b in zip(r_base, r_q):
                # min-max-normalized scale (amplifies raw deltas ~3x)
                assert abs(a["stage3_score"] - b["stage3_score"]) < 0.1

    def test_fused_path_rank_identical(self):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        extra = dict(
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        )
        p1 = RetrievalPipeline(_base(**extra))
        p1.add_documents(list(DOCS))
        p2 = RetrievalPipeline(_base(stage3_act_int8="pallas", **extra))
        p2.add_documents(list(DOCS))
        for q in ("quick brown fox topic 2", "doc topic fox"):
            o1 = p1.search(q, top_k=3)
            o2 = p2.search(q, top_k=3)
            assert o1["timing"].get("fused") and o2["timing"].get("fused")
            assert [r["doc_id"] for r in o1["results"]] == [
                r["doc_id"] for r in o2["results"]
            ]

    def test_yaml_roundtrip_carries_flag(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = _base(stage3_act_int8="pallas")
        path = tmp_path / "c.yaml"
        cfg.export(path)
        back = PipelineConfig.from_yaml(path)
        assert back.stage3_act_int8 == "pallas"

"""int8 quantized dense index vs the float reference."""

import numpy as np
import pytest

from tristage_rag_tpu.index.dense import DenseIndex


def _normalized(n, d, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


class TestInt8Index:
    def test_ranking_close_to_float(self):
        emb = _normalized(200, 64)
        f32 = DenseIndex(dim=64, dtype="float32")
        f32.add(emb)
        q8 = DenseIndex(dim=64, dtype="int8")
        assert q8.quantized
        q8.add(emb)
        s_f, i_f = f32.search(emb[:20], k=10)
        s_q, i_q = q8.search(emb[:20], k=10)
        # top-1 self-retrieval survives quantization
        np.testing.assert_array_equal(i_q[:, 0], np.arange(20))
        # scores within ~1% of float
        np.testing.assert_allclose(s_q[:, 0], s_f[:, 0], atol=0.02)
        # top-10 overlap high
        overlap = np.mean(
            [len(set(i_f[r]) & set(i_q[r])) / 10 for r in range(20)]
        )
        assert overlap >= 0.9, overlap

    def test_raw_int8_add_gets_unit_scales(self):
        """Pre-quantized int8 rows without explicit scales must score
        with scale 1.0, not the zero-initialized buffer (ADVICE r1:
        such rows silently scored exactly 0)."""
        rng = np.random.default_rng(0)
        raw = rng.integers(-127, 128, size=(10, 16), dtype=np.int8)
        idx = DenseIndex(dim=16, dtype="int8")
        idx.add(raw)
        q = raw[:3].astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scores, ids = idx.search(q, k=3)
        np.testing.assert_array_equal(ids[:, 0], np.arange(3))
        assert (np.abs(scores[:, 0]) > 1e-6).all()

    def test_raw_int8_add_with_explicit_scales(self):
        rng = np.random.default_rng(1)
        emb = _normalized(10, 16, seed=1)
        scales = np.abs(emb).max(axis=1) / 127.0
        raw = np.clip(
            np.round(emb / scales[:, None]), -127, 127
        ).astype(np.int8)
        idx = DenseIndex(dim=16, dtype="int8")
        idx.add(raw, scales=scales)
        ref = DenseIndex(dim=16, dtype="int8")
        ref.add(emb)  # quantized internally with the same scheme
        s_a, i_a = idx.search(emb[:5], k=3)
        s_b, i_b = ref.search(emb[:5], k=3)
        np.testing.assert_array_equal(i_a, i_b)
        np.testing.assert_allclose(s_a, s_b, atol=1e-5)
        with pytest.raises(ValueError):
            idx.add(raw, scales=scales[:3])

    def test_delete_and_growth(self):
        emb = _normalized(600, 32, seed=1)
        idx = DenseIndex(dim=32, dtype="int8", capacity=1024)
        idx.add(emb)
        idx.add(_normalized(600, 32, seed=2))  # growth keeps scales
        s, i = idx.search(emb[:5], k=1)
        np.testing.assert_array_equal(i[:, 0], np.arange(5))
        idx.delete([2])
        _, i2 = idx.search(emb[2:3], k=3)
        assert 2 not in i2

    def test_persistence_no_double_quantization(self, tmp_path):
        emb = _normalized(50, 16, seed=3)
        idx = DenseIndex(dim=16, dtype="int8")
        idx.add(emb)
        s1, i1 = idx.search(emb[:8], k=4)
        idx.save(tmp_path / "q")
        loaded = DenseIndex.load(tmp_path / "q")
        assert loaded.quantized
        s2, i2 = loaded.search(emb[:8], k=4)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    def test_compact_keeps_scales(self):
        emb = _normalized(30, 16, seed=4)
        idx = DenseIndex(dim=16, dtype="int8")
        idx.add(emb)
        s_before, _ = idx.search(emb[5:6], k=1)
        idx.delete([0, 1])
        mapping = idx.compact()
        new_pos = int(np.where(mapping == 5)[0][0])
        s_after, i_after = idx.search(emb[5:6], k=1)
        assert i_after[0, 0] == new_pos
        np.testing.assert_allclose(s_before, s_after, rtol=1e-6)

    def test_pipeline_with_int8(self, tiny_config, sample_docs):
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = dataclasses.replace(tiny_config, index_dtype="int8")
        p = RetrievalPipeline(cfg)
        p.add_documents(sample_docs)
        assert p.stage1.index.quantized
        out = p.search("BM25 lexical scoring", top_k=3)
        assert out["results"]


class TestInt8Fused:
    def test_fused_path_with_int8_index(self, tiny_config, sample_docs):
        """The single-dispatch fused program must carry the per-row
        dequant scales through its dense top-k (int8 corpus mode)."""
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        cfg = dataclasses.replace(
            tiny_config, index_dtype="int8",
            stage2_cache_doc_embeddings=True, enable_fused_search=True,
        )
        fused = RetrievalPipeline(cfg)
        staged = RetrievalPipeline(
            dataclasses.replace(cfg, enable_fused_search=False)
        )
        fused.add_documents(sample_docs)
        staged.add_documents(sample_docs)
        of = fused.search("BM25 lexical scoring")
        os_ = staged.search("BM25 lexical scoring")
        assert of["timing"].get("fused") is True
        assert [r["doc_id"] for r in of["results"]] == [
            r["doc_id"] for r in os_["results"]
        ]


class TestScaledTopkOps:
    def test_masked_approx_topk_with_scale(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.ops.topk import masked_approx_topk, masked_topk

        emb = _normalized(128, 32, seed=7)
        amax = np.abs(emb).max(axis=1)
        scales = np.maximum(amax, 1e-12) / 127.0
        q8 = np.clip(np.round(emb / scales[:, None]), -127, 127).astype(np.int8)
        q = emb[:4]
        s_a, i_a = masked_approx_topk(
            jnp.asarray(q), jnp.asarray(q8), jnp.int32(128), k=5,
            scale=jnp.asarray(scales),
        )
        s_e, i_e = masked_topk(
            jnp.asarray(q), jnp.asarray(q8), jnp.int32(128), k=5,
            scale=jnp.asarray(scales),
        )
        # top-1 identical between approx and exact scaled paths
        np.testing.assert_array_equal(
            np.asarray(i_a)[:, 0], np.asarray(i_e)[:, 0]
        )
        np.testing.assert_array_equal(np.asarray(i_e)[:, 0], np.arange(4))

    def test_scale_changes_ordering(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.ops.topk import masked_topk

        corpus = np.eye(4, 8, dtype=np.float32)
        q = np.ones((1, 8), np.float32)
        scale = np.array([1.0, 10.0, 1.0, 1.0], np.float32)
        _, idx = masked_topk(
            jnp.asarray(q), jnp.asarray(corpus), jnp.int32(4), k=1,
            scale=jnp.asarray(scale),
        )
        assert int(np.asarray(idx)[0, 0]) == 1  # scale dominates

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestStageTimer:
    def test_measure_and_summary(self):
        from tristage_rag_tpu.utils.profiling import StageTimer

        t = StageTimer()
        for _ in range(5):
            with t.measure("stage1"):
                time.sleep(0.001)
        s = t.summary()
        assert s["stage1"]["count"] == 5
        assert s["stage1"]["p50_ms"] >= 1.0
        assert "ema_ms" in s["stage1"]

    def test_window_bounded(self):
        from tristage_rag_tpu.utils.profiling import StageTimer

        t = StageTimer(window=10)
        for i in range(50):
            t.record("x", 0.001)
        assert t.summary()["x"]["count"] == 10


def test_device_host_split_runs():
    from tristage_rag_tpu.utils.profiling import device_host_split

    f = jax.jit(lambda x: jnp.sum(x * 2))
    out = device_host_split(f, jnp.ones((64, 64)), iters=3)
    assert out["host_time_s"] > 0
    assert out["dispatch_overhead_s"] >= 0


class TestTrainCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from tristage_rag_tpu.models.config import PoolingConfig
        from tristage_rag_tpu.models.heads import BiEncoder
        from tristage_rag_tpu.models.registry import encoder_config
        from tristage_rag_tpu.train.checkpoint import TrainCheckpointer
        from tristage_rag_tpu.train.contrastive import TrainConfig, Trainer

        cfg = encoder_config("tiny-gemma").replace(dtype="float32", num_layers=1)
        module = BiEncoder(cfg, PoolingConfig(pooling="mean"))
        trainer = Trainer(module, TrainConfig())
        ids = jnp.zeros((4, 8), jnp.int32)
        mask = jnp.ones((4, 8), jnp.int32)
        state = trainer.init_state(jax.random.PRNGKey(0), ids, mask)
        state, _ = trainer.train_step(state, ids, mask, ids, mask)

        ckpt = TrainCheckpointer(tmp_path / "ckpts", max_to_keep=2)
        ckpt.save(1, state)
        assert ckpt.latest_step() == 1

        fresh = trainer.init_state(jax.random.PRNGKey(0), ids, mask)
        restored = ckpt.restore(fresh)
        assert int(restored["step"]) == 1
        # params actually round-tripped
        a = jax.tree.leaves(state["params"])[0]
        b = jax.tree.leaves(restored["params"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ckpt.close()

    def test_restore_empty_raises(self, tmp_path):
        from tristage_rag_tpu.train.checkpoint import TrainCheckpointer

        ckpt = TrainCheckpointer(tmp_path / "none")
        with pytest.raises(FileNotFoundError):
            ckpt.restore({"x": np.zeros(3)})
        ckpt.close()


class TestEmbeddingService:
    def _make(self, cache_size=100):
        from tristage_rag_tpu.engine.embedding_service import EmbeddingService
        from tristage_rag_tpu.models.config import PoolingConfig
        from tristage_rag_tpu.models.registry import encoder_config
        from tristage_rag_tpu.models.runtime import EncoderRuntime
        from tristage_rag_tpu.models.tokenizer import HashTokenizer

        cfg = encoder_config("tiny-gemma").replace(dtype="float32", num_layers=1)
        rt = EncoderRuntime("bi", cfg, PoolingConfig(pooling="mean"))
        return EmbeddingService(
            rt, HashTokenizer(vocab_size=cfg.vocab_size),
            max_length=16, cache_size=cache_size,
        )

    def test_cache_hits(self):
        svc = self._make()
        a = svc.encode(["hello world", "other text"])
        b = svc.encode(["hello world"])
        np.testing.assert_array_equal(a[0], b[0])
        assert svc.stats["hits"] == 1
        assert svc.stats["encoded"] == 2

    def test_order_preserved_with_mixed_hits(self):
        svc = self._make()
        first = svc.encode(["aaa", "bbb"])
        mixed = svc.encode(["ccc", "aaa", "ddd", "bbb"])
        np.testing.assert_array_equal(mixed[1], first[0])
        np.testing.assert_array_equal(mixed[3], first[1])

    def test_duplicate_texts_encoded_once(self):
        svc = self._make()
        out = svc.encode(["same", "same", "same"])
        assert svc.stats["encoded"] == 1
        np.testing.assert_array_equal(out[0], out[2])

    def test_validation(self):
        svc = self._make()
        with pytest.raises(ValueError):
            svc.encode([""])

    def test_cache_eviction(self):
        svc = self._make(cache_size=2)
        svc.encode(["a", "b", "c"])
        assert svc.cache_info()["size"] == 2

    def test_similarity(self):
        svc = self._make()
        v = np.array([1.0, 0.0])
        w = np.array([0.0, 1.0])
        assert svc.similarity(v, v) == pytest.approx(1.0)
        assert svc.similarity(v, w) == pytest.approx(0.0)

    def test_singleton(self):
        from tristage_rag_tpu.engine.embedding_service import EmbeddingService

        EmbeddingService.reset_instance()
        made = []

        def factory():
            svc = self._make()
            made.append(svc)
            return svc

        a = EmbeddingService.get_instance(factory)
        b = EmbeddingService.get_instance()
        assert a is b and len(made) == 1
        EmbeddingService.reset_instance()


class TestGracefulDegradation:
    def test_stage2_failure_passthrough(self, tiny_config):
        from tristage_rag_tpu.engine.stage2 import ColBERTScorer

        s2 = ColBERTScorer(tiny_config)
        cands = [{"doc_id": 0, "document": "x", "stage1_score": 1.0}]
        s2.encode_query = lambda q: (_ for _ in ()).throw(RuntimeError("boom"))
        out = s2.rescore_candidates("q", cands)
        assert out == cands  # unchanged passthrough

    def test_stage3_failure_passthrough(self, tiny_config):
        from tristage_rag_tpu.engine.stage3 import CrossEncoderReranker

        s3 = CrossEncoderReranker(tiny_config)
        cands = [{"doc_id": 0, "document": "x", "stage2_score": 1.0}]
        s3.predict = lambda q, d: (_ for _ in ()).throw(RuntimeError("boom"))
        out = s3.rerank("q", cands)
        assert out == cands

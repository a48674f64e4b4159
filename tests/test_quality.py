"""End-to-end retrieval quality on synthetic tasks (no model assets).

The real NDCG-parity gate needs the reference checkpoints (BASELINE.md
protocol); these tests assert the quality *machinery* end to end:

* lexical relevance flows through the full tri-stage funnel,
* the evaluation harness produces sane metric tables,
* contrastive training measurably improves dense retrieval — the
  encoder, training loop, and index compose into a system that learns.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tristage_rag_tpu.eval.limit import RetrievalTask
from tristage_rag_tpu.eval.metrics import evaluate_retrieval


def _synthetic_task(n_docs=30, seed=0):
    """Docs are token soups; query i is a subset of doc i's tokens."""
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(200)]
    corpus, queries, qrels = {}, {}, {}
    for i in range(n_docs):
        words = rng.choice(vocab, size=12, replace=False)
        corpus[f"d{i}"] = {"text": " ".join(words)}
        if i < 10:
            queries[f"q{i}"] = " ".join(rng.choice(words, size=4, replace=False))
            qrels[f"q{i}"] = {f"d{i}": 1}
    return RetrievalTask("synthetic", corpus, queries, qrels)


class TestLexicalQuality:
    def test_full_funnel_lexical_ndcg(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.harness import run_evaluation

        task = _synthetic_task()
        p = RetrievalPipeline(tiny_config)
        out = run_evaluation(p, task, top_k=10, stages="stage1", warmup=False)
        # stage-1 includes BM25: subset queries must retrieve their doc
        assert out["metrics"]["recall_at_10"] >= 0.9
        assert out["metrics"]["mrr_at_10"] >= 0.8


class TestTrainingImprovesRetrieval:
    def test_contrastive_training_lifts_recall(self):
        """Fine-tune the tiny bi-encoder on (query, doc) pairs and check
        dense-only retrieval improves over random init."""
        from tristage_rag_tpu.index.dense import DenseIndex
        from tristage_rag_tpu.models.config import PoolingConfig
        from tristage_rag_tpu.models.heads import BiEncoder
        from tristage_rag_tpu.models.registry import encoder_config
        from tristage_rag_tpu.models.tokenizer import HashTokenizer
        from tristage_rag_tpu.train.contrastive import TrainConfig, Trainer

        cfg = encoder_config("tiny-gemma").replace(dtype="float32", num_layers=2)
        module = BiEncoder(cfg, PoolingConfig(pooling="mean"))
        tok = HashTokenizer(vocab_size=cfg.vocab_size)

        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(150)]
        n = 24
        docs, queries = [], []
        for i in range(n):
            words = rng.choice(vocab, size=10, replace=False)
            docs.append(" ".join(words))
            # query shares only 3 of 10 tokens -> hard for random init
            queries.append(" ".join(rng.choice(words, size=3, replace=False)))

        def encode_batch(params, texts):
            b = tok.encode_batch(texts, max_length=16, buckets=(16,))
            return np.asarray(
                module.apply(
                    {"params": params},
                    jnp.asarray(b.input_ids),
                    jnp.asarray(b.attn_mask),
                )
            )

        def recall_at_1(params):
            d_emb = encode_batch(params, docs)
            q_emb = encode_batch(params, queries)
            idx = DenseIndex(dim=d_emb.shape[1])
            idx.add(d_emb)
            _, ids = idx.search(q_emb, k=1)
            return float((ids[:, 0] == np.arange(n)).mean())

        trainer = Trainer(
            module,
            TrainConfig(learning_rate=3e-3, warmup_steps=2, total_steps=60,
                        temperature=0.1),
        )
        qb = tok.encode_batch(queries, max_length=16, buckets=(16,))
        db = tok.encode_batch(docs, max_length=16, buckets=(16,))
        state = trainer.init_state(
            jax.random.PRNGKey(0), jnp.asarray(qb.input_ids), jnp.asarray(qb.attn_mask)
        )
        before = recall_at_1(state["params"])
        for _ in range(40):
            state, metrics = trainer.train_step(
                state,
                jnp.asarray(qb.input_ids), jnp.asarray(qb.attn_mask),
                jnp.asarray(db.input_ids), jnp.asarray(db.attn_mask),
            )
        after = recall_at_1(state["params"])
        assert float(metrics["accuracy"]) > 0.9, "training failed to fit"
        assert after >= max(before + 0.3, 0.8), (before, after)


class TestMetricSanity:
    def test_random_scores_bounded(self):
        rng = np.random.default_rng(0)
        qrels = {f"q{i}": {f"d{i}": 1} for i in range(20)}
        results = {
            f"q{i}": {f"d{j}": float(rng.random()) for j in range(20)}
            for i in range(20)
        }
        m = evaluate_retrieval(qrels, results, ks=(10,))
        assert 0 <= m["ndcg_at_10"] <= 1
        assert 0 <= m["main_score"] <= 1

import json

import numpy as np
import pytest

from tristage_rag_tpu.eval.limit import RetrievalTask, load_limit
from tristage_rag_tpu.eval.metrics import (
    evaluate_retrieval,
    map_at_k,
    mrr_at_k,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)


class TestMetrics:
    QRELS = {"q1": {"d1": 1, "d2": 1}, "q2": {"d3": 2}}

    def test_perfect_ranking(self):
        results = {"q1": {"d1": 0.9, "d2": 0.8, "dx": 0.1}, "q2": {"d3": 1.0}}
        m = evaluate_retrieval(self.QRELS, results, ks=(10,))
        assert m["ndcg_at_10"] == pytest.approx(1.0)
        assert m["recall_at_10"] == pytest.approx(1.0)
        assert m["mrr_at_10"] == pytest.approx(1.0)
        assert m["map_at_10"] == pytest.approx(1.0)
        assert m["main_score"] == m["ndcg_at_10"]

    def test_worst_ranking(self):
        results = {"q1": {"dx": 0.9}, "q2": {"dy": 0.9}}
        m = evaluate_retrieval(self.QRELS, results, ks=(10,))
        assert m["ndcg_at_10"] == 0.0
        assert m["recall_at_10"] == 0.0

    def test_ndcg_hand_computed(self):
        # q: rel docs a(3), b(1); ranking: [x, a, b]
        qrels = {"q": {"a": 3, "b": 1}}
        results = {"q": {"x": 0.9, "a": 0.8, "b": 0.7}}
        dcg = 3 / np.log2(3) + 1 / np.log2(4)
        idcg = 3 / np.log2(2) + 1 / np.log2(3)
        assert ndcg_at_k(qrels, results, 10) == pytest.approx(dcg / idcg)

    def test_mrr_position(self):
        qrels = {"q": {"a": 1}}
        results = {"q": {"x": 0.9, "y": 0.8, "a": 0.7}}
        assert mrr_at_k(qrels, results, 10) == pytest.approx(1 / 3)
        assert mrr_at_k(qrels, results, 2) == 0.0

    def test_recall_cutoff(self):
        qrels = {"q": {"a": 1, "b": 1}}
        results = {"q": {"a": 0.9, "x": 0.8, "b": 0.7}}
        assert recall_at_k(qrels, results, 2) == pytest.approx(0.5)
        assert recall_at_k(qrels, results, 3) == pytest.approx(1.0)

    def test_precision(self):
        qrels = {"q": {"a": 1}}
        results = {"q": {"a": 0.9, "x": 0.8}}
        assert precision_at_k(qrels, results, 2) == pytest.approx(0.5)

    def test_map_partial(self):
        qrels = {"q": {"a": 1, "b": 1}}
        results = {"q": {"a": 0.9, "x": 0.8, "b": 0.7}}
        # AP = (1/1 + 2/3) / 2
        assert map_at_k(qrels, results, 10) == pytest.approx((1 + 2 / 3) / 2)

    def test_deterministic_tie_break(self):
        qrels = {"q": {"a": 1}}
        results = {"q": {"a": 0.5, "b": 0.5}}
        # ties break by doc id ascending -> "a" first
        assert mrr_at_k(qrels, results, 10) == 1.0


class TestLimitLoader:
    @pytest.fixture()
    def limit_dir(self, tmp_path):
        d = tmp_path / "limit-small"
        d.mkdir()
        (d / "queries.jsonl").write_text(
            "\n".join(
                json.dumps({"_id": f"q{i}", "text": f"query {i}"}) for i in range(3)
            )
        )
        (d / "corpus.jsonl").write_text(
            "\n".join(
                json.dumps({"_id": f"d{i}", "text": f"doc {i}", "title": f"t{i}"})
                for i in range(5)
            )
        )
        (d / "qrels.jsonl").write_text(
            "\n".join(
                json.dumps({"query-id": f"q{i}", "corpus-id": f"d{i}", "score": 1})
                for i in range(3)
            )
        )
        return tmp_path

    def test_load(self, limit_dir):
        task = load_limit(limit_dir, "limit-small")
        assert len(task.queries) == 3
        assert len(task.corpus) == 5
        assert task.corpus["d0"] == {"text": "doc 0", "title": "t0"}
        assert task.qrels["q1"] == {"d1": 1}

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_limit(tmp_path, "limit-small")

    def test_subsample(self, limit_dir):
        task = load_limit(limit_dir, "limit-small").subsample(2)
        assert len(task.queries) == 2
        assert set(task.qrels) == set(task.queries)


class TestHarness:
    def test_end_to_end_eval(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.harness import run_evaluation

        # Corpus with distinctive lexical content so BM25 fusion makes
        # relevance achievable with random neural weights.
        corpus = {
            f"d{i}": {"text": f"unique token zw{i}x appears here", "title": ""}
            for i in range(6)
        }
        queries = {f"q{i}": f"find zw{i}x token" for i in range(4)}
        qrels = {f"q{i}": {f"d{i}": 1} for i in range(4)}
        task = RetrievalTask("toy", corpus, queries, qrels)
        p = RetrievalPipeline(tiny_config)
        out = run_evaluation(p, task, top_k=6)
        assert out["num_queries"] == 4 and out["num_docs"] == 6
        assert 0.0 <= out["metrics"]["ndcg_at_10"] <= 1.0
        # stage-1 lexical eval must find the unique-token doc
        out1 = run_evaluation(p, task, top_k=6, stages="stage1")
        assert out1["metrics"]["recall_at_10"] == pytest.approx(1.0)

    def test_stage12(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.harness import run_evaluation

        corpus = {f"d{i}": {"text": f"doc body {i}"} for i in range(4)}
        task = RetrievalTask(
            "toy2", corpus, {"q0": "doc body 2"}, {"q0": {"d2": 1}}
        )
        p = RetrievalPipeline(tiny_config)
        out = run_evaluation(p, task, top_k=4, stages="stage12")
        assert out["num_queries"] == 1


class TestMTEBAdapter:
    def test_search_and_predict(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.mteb_adapter import TriStageMTEBModel

        p = RetrievalPipeline(tiny_config)
        model = TriStageMTEBModel(p, top_k=3)
        corpus = {
            "a": {"text": "alpha unique qq1z content", "title": ""},
            "b": {"text": "beta unique qq2z content", "title": ""},
            "c": {"text": "gamma unique qq3z content", "title": ""},
        }
        res = model.search(corpus, {"q": "find qq2z"}, top_k=3)
        assert "q" in res and len(res["q"]) >= 1
        assert all(isinstance(v, float) for v in res["q"].values())
        # pairs mode
        pairs = [("find qq2z", "beta unique qq2z content"),
                 ("find qq2z", "alpha unique qq1z content")]
        scores = model.predict(pairs)
        assert scores.shape == (2,)
        # encode returns embeddings
        emb = model.encode(["hello world"], prompt_name="query")
        assert emb.shape[0] == 1

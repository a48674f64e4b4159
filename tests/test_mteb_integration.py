"""End-to-end ``MTEB(tasks).run(model)`` integration (VERDICT r3
next-3).

Two layers:

* Against the strict evaluator fake (tests/fake_mteb.py) whose call
  sequence and result shapes are derived line-by-line from the
  reference's real call sites — runs in CI with no mteb installed.
* Against the REAL mteb package the moment it becomes installable
  (zero-egress today): the same ``run_mteb`` path on the same
  synthetic LIMIT data, skipped while ``import mteb`` fails.
"""

from __future__ import annotations

import pytest

import fake_mteb


@pytest.fixture(scope="module")
def limit_dir(tmp_path_factory):
    from tristage_rag_tpu.eval.synthetic import generate_synthetic_task

    d = tmp_path_factory.mktemp("limit_data")
    generate_synthetic_task(str(d), n_docs=40, n_queries=6, seed=0)
    return str(d)


@pytest.fixture()
def pipeline(tiny_config):
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    return RetrievalPipeline(tiny_config)


class TestFakeEvaluatorDrive:
    def test_run_mteb_full_loop(self, pipeline, limit_dir, monkeypatch):
        """run_mteb drives make_mteb_tasks + TriStageMTEBModel through
        the pinned evaluator surface and extracts the main score."""
        fake = fake_mteb.install(monkeypatch)
        from tristage_rag_tpu.eval.mteb_adapter import run_mteb

        results, main_scores = run_mteb(
            pipeline, limit_dir, variant="limit-small", top_k=10
        )
        assert list(main_scores) == ["LIMITSmallRetrieval"]
        score = main_scores["LIMITSmallRetrieval"]
        assert 0.0 <= score <= 1.0
        # the synthetic task is lexically grounded: even random-weight
        # encoders + BM25 fusion must beat zero
        assert score > 0.0
        # result objects carry the v2 scores-by-split shape
        (res,) = results
        row = res.scores["test"][0]
        assert row["main_score"] == row["ndcg_at_10"] == score

    def test_evaluator_call_sequence(self, pipeline, limit_dir, monkeypatch):
        """The adapter is exercised through encode(query) ->
        encode(passage) -> search, the sequence the reference observes
        from the real evaluator (tristage_mteb_model.py:135-161,
        :253-308)."""
        fake_mteb.install(monkeypatch)
        import sys

        from tristage_rag_tpu.eval.mteb_adapter import (
            TriStageMTEBModel, make_mteb_tasks,
        )

        task_cls = make_mteb_tasks(limit_dir, "limit-small")
        model = TriStageMTEBModel(pipeline, top_k=10)
        evaluation = sys.modules["mteb"].MTEB(tasks=[task_cls()])
        evaluation.run(model, encode_kwargs={"batch_size": 8})
        kinds = [c[0] for c in evaluation.calls]
        assert kinds == ["encode", "encode", "search"]
        assert evaluation.calls[0][1] == "query"
        assert evaluation.calls[1][1] == "passage"

    def test_extract_main_scores_tolerates_dict_results(self):
        """The score extractor accepts BOTH result shapes the reference
        tolerates (run_mteb_evaluation.py:337-386): objects with
        .scores and plain dicts, list-or-dict split rows."""
        from tristage_rag_tpu.eval.mteb_adapter import extract_main_scores

        obj = fake_mteb.TaskResult(
            "TaskA", {"test": [{"ndcg_at_10": 0.5, "main_score": 0.5}]}
        )
        as_dict = {
            "task_name": "TaskB",
            "scores": {"test": {"main_score": 0.25}},  # dict row form
        }
        scores = extract_main_scores([obj, as_dict])
        assert scores == {"TaskA": 0.5, "TaskB": 0.25}

    def test_task_construction_contract(self, limit_dir, monkeypatch):
        """Tasks construct under the strict metadata contract and load
        LIMIT JSONL into the MTEB split shape."""
        fake_mteb.install(monkeypatch)
        from tristage_rag_tpu.eval.mteb_adapter import make_mteb_tasks

        task = make_mteb_tasks(limit_dir, "limit-small")()
        task.load_data()
        assert task.data_loaded
        assert set(task.corpus) == {"test"}
        qid = next(iter(task.queries["test"]))
        assert isinstance(task.queries["test"][qid], str)
        rels = task.relevant_docs["test"]
        assert all(d in task.corpus["test"] for q in rels for d in rels[q])


class TestRealMTEB:
    """Runs the identical path under the REAL mteb package — skipped
    until it is installable (zero egress). The day `pip install
    mteb==2.0.0` works, this is the first thing to run."""

    def test_real_mteb_limit_small(self, pipeline, limit_dir):
        mteb = pytest.importorskip("mteb")
        assert not hasattr(mteb, "__file__") or "tests" not in str(
            mteb.__file__ or ""
        ), "real-package test picked up a fake"
        from tristage_rag_tpu.eval.mteb_adapter import run_mteb

        results, main_scores = run_mteb(
            pipeline, limit_dir, variant="limit-small", top_k=10
        )
        assert main_scores, f"no main score extracted from {results!r}"
        for score in main_scores.values():
            assert 0.0 <= score <= 1.0

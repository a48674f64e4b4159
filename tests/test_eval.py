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
        out = run_evaluation(p, task, top_k=6, warmup=False)
        assert out["num_queries"] == 4 and out["num_docs"] == 6
        assert 0.0 <= out["metrics"]["ndcg_at_10"] <= 1.0
        # stage-1 lexical eval must find the unique-token doc
        out1 = run_evaluation(p, task, top_k=6, stages="stage1", warmup=False)
        assert out1["metrics"]["recall_at_10"] == pytest.approx(1.0)

    def test_stage12(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.harness import run_evaluation

        corpus = {f"d{i}": {"text": f"doc body {i}"} for i in range(4)}
        task = RetrievalTask(
            "toy2", corpus, {"q0": "doc body 2"}, {"q0": {"d2": 1}}
        )
        p = RetrievalPipeline(tiny_config)
        out = run_evaluation(p, task, top_k=4, stages="stage12", warmup=False)
        assert out["num_queries"] == 1

    @pytest.mark.parametrize("stages", ["stage1", "stage12"])
    def test_batched_ablation_matches_per_query(self, tiny_config, stages):
        """The batched ablation paths (stage1.search_batch /
        stage2.rescore_batch) must rank exactly like the per-query
        paths they replaced in run_evaluation."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.harness import (
            _search_stages,
            _search_stages_batch,
        )

        p = RetrievalPipeline(tiny_config)
        p.add_documents(
            [f"document body number {i} with shared words" for i in range(10)]
        )
        queries = ["document number 3", "shared words body", "number 7"]
        batched = _search_stages_batch(p, queries, 5, stages)
        for q, b in zip(queries, batched):
            single = _search_stages(p, q, 5, stages)
            assert [r["doc_id"] for r in b] == [
                r["doc_id"] for r in single
            ], (stages, q)


class TestRandomWeightGuard:
    def test_random_init_flagged(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(tiny_config)
        p.initialize_stages()
        assert p.all_weights_loaded() is False
        info = p.get_pipeline_info()
        assert info["weights_loaded"] is False
        assert info["stage1"]["weights_loaded"] is False
        assert info["stage2"]["weights_loaded"] is False
        assert info["stage3"]["weights_loaded"] is False

    def test_run_benchmark_refuses_random_weights(self, tmp_path, monkeypatch):
        """run_benchmark exits 3 on random weights without the
        explicit --allow-random-weights override (VERDICT r1 next-6)."""
        import json as _json
        import sys as _sys

        data_dir = tmp_path / "benchmark_data" / "limit-small"
        data_dir.mkdir(parents=True)
        (data_dir / "corpus.jsonl").write_text(
            "\n".join(_json.dumps({"_id": f"d{i}", "text": f"body {i}"})
                      for i in range(3))
        )
        (data_dir / "queries.jsonl").write_text(
            _json.dumps({"_id": "q0", "text": "body 1"})
        )
        (data_dir / "qrels.jsonl").write_text(
            _json.dumps({"query-id": "q0", "corpus-id": "d1", "score": 1})
        )
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            "pipeline:\n"
            "  stage1: {model: tiny-gemma, top_k: 3}\n"
            "  stage2: {model: tiny-modernbert, top_k: 3, max_seq_length: 32}\n"
            "  stage3: {model: tiny-bert, top_k: 2, max_length: 64}\n"
            "  general: {compute_dtype: float32, mesh_data_parallel: 1}\n"
        )
        import run_benchmark

        argv = ["run_benchmark.py", "--config", str(cfg),
                "--data-dir", str(tmp_path / "benchmark_data")]
        monkeypatch.setattr(_sys, "argv", argv)
        assert run_benchmark.main() == 3
        monkeypatch.setattr(
            _sys, "argv", argv + ["--allow-random-weights"]
        )
        assert run_benchmark.main() == 0


class TestHarnessBatchedPath:
    def test_batched_fused_eval_matches_staged(self, tiny_config):
        """run_evaluation's chunked batch_search (fused path) must yield
        the same metrics as the per-query staged path."""
        import dataclasses

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.harness import run_evaluation

        corpus = {
            f"d{i}": {"text": f"unique token yy{i}q appears here", "title": ""}
            for i in range(8)
        }
        queries = {f"q{i}": f"find yy{i}q token" for i in range(6)}
        qrels = {f"q{i}": {f"d{i}": 1} for i in range(6)}
        task = RetrievalTask("toy-batch", corpus, queries, qrels)

        fused_cfg = dataclasses.replace(
            tiny_config, enable_fused_search=True,
            stage2_cache_doc_embeddings=True,
        )
        staged_cfg = dataclasses.replace(tiny_config, enable_fused_search=False)
        out_f = run_evaluation(RetrievalPipeline(fused_cfg), task, top_k=8, warmup=False)
        out_s = run_evaluation(RetrievalPipeline(staged_cfg), task, top_k=8, warmup=False)
        for k in ("ndcg_at_10", "recall_at_10", "mrr_at_10"):
            assert out_f["metrics"][k] == pytest.approx(
                out_s["metrics"][k], abs=1e-6
            )


def _install_fake_mteb(monkeypatch, fake):
    """Install a fake mteb package whose doubles enforce the real
    mteb-v2 construction contract: ``TaskMetadata`` validates its
    required fields and ``AbsTaskRetrieval`` REFUSES to construct
    without a populated metadata instance (the round-2 `metadata =
    None  # set below` bug was invisible to a permissive double)."""
    import sys
    import types

    abstasks = types.ModuleType("mteb.abstasks")
    abstask_mod = types.ModuleType("mteb.abstasks.AbsTaskRetrieval")
    taskmeta_mod = types.ModuleType("mteb.abstasks.TaskMetadata")

    class TaskMetadata:
        _required = (
            "name", "description", "type", "eval_splits", "eval_langs",
            "main_score",
        )

        def __init__(self, **kwargs):
            for field in self._required:
                val = kwargs.get(field)
                if val is None or val == "" or val == []:
                    raise TypeError(
                        f"TaskMetadata missing required field {field!r}"
                    )
            if not isinstance(kwargs.get("dialect", []), list):
                raise TypeError("dialect must be a list")
            for k, v in kwargs.items():
                setattr(self, k, v)

    class AbsTaskRetrieval:
        metadata = None

        def __init__(self, **kwargs):
            if not isinstance(type(self).metadata, TaskMetadata):
                raise TypeError(
                    "AbsTaskRetrieval subclass requires a populated "
                    "TaskMetadata (got "
                    f"{type(type(self).metadata).__name__})"
                )
            self.data_loaded = False

    taskmeta_mod.TaskMetadata = TaskMetadata
    abstask_mod.AbsTaskRetrieval = AbsTaskRetrieval
    abstasks.AbsTaskRetrieval = abstask_mod
    abstasks.TaskMetadata = taskmeta_mod
    fake.abstasks = abstasks
    monkeypatch.setitem(sys.modules, "mteb", fake)
    monkeypatch.setitem(sys.modules, "mteb.abstasks", abstasks)
    monkeypatch.setitem(
        sys.modules, "mteb.abstasks.AbsTaskRetrieval", abstask_mod
    )
    monkeypatch.setitem(
        sys.modules, "mteb.abstasks.TaskMetadata", taskmeta_mod
    )
    return TaskMetadata


class TestMakeMTEBTasks:
    def test_task_classes_load_local_data(self, tmp_path, monkeypatch):
        """make_mteb_tasks builds AbsTaskRetrieval subclasses that load
        LIMIT JSONL into MTEB-shape dicts — exercised with a fake mteb
        package (strict construction contract) so the path runs in CI
        without the dep."""
        import types

        d = tmp_path / "limit-small"
        d.mkdir()
        (d / "queries.jsonl").write_text(
            json.dumps({"_id": "q0", "text": "query 0"})
        )
        (d / "corpus.jsonl").write_text("\n".join(
            json.dumps({"_id": f"d{i}", "text": f"doc {i}"}) for i in range(3)
        ))
        (d / "qrels.jsonl").write_text(
            json.dumps({"query-id": "q0", "corpus-id": "d0", "score": 1})
        )
        limit_dir = tmp_path

        TaskMetadata = _install_fake_mteb(
            monkeypatch, types.ModuleType("mteb")
        )
        from tristage_rag_tpu.eval.mteb_adapter import make_mteb_tasks

        cls = make_mteb_tasks(str(limit_dir))
        assert isinstance(cls.metadata, TaskMetadata)
        assert cls.metadata.name == "LIMITSmallRetrieval"
        assert cls.metadata.main_score == "ndcg_at_10"
        assert cls.metadata.eval_splits == ["test"]
        task = cls()
        task.load_data()
        assert task.data_loaded
        assert set(task.corpus["test"]) and set(task.queries["test"])
        qid = next(iter(task.relevant_docs["test"]))
        assert task.relevant_docs["test"][qid]

    def test_full_variant_metadata(self, tmp_path, monkeypatch):
        """The full-LIMIT variant gets its own task name (parity with
        the reference's two task classes, limit_mteb_tasks.py)."""
        import types

        _install_fake_mteb(monkeypatch, types.ModuleType("mteb"))
        from tristage_rag_tpu.eval.mteb_adapter import make_mteb_tasks

        cls = make_mteb_tasks(str(tmp_path), variant="limit")
        assert cls.metadata.name == "LIMITRetrieval"
        assert cls._variant == "limit"


def _raise_on_mteb(orig_import):
    def _imp(name, *a, **kw):
        if name == "mteb":
            raise ImportError("mteb not installed")
        return orig_import(name, *a, **kw)

    return _imp


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

    def test_encode_corpus_side_effect_indexes(self, tiny_config):
        """Non-query encode() indexes the sentences into the pipeline
        (reference parity: tristage_mteb_model.py:163-200)."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.mteb_adapter import TriStageMTEBModel

        p = RetrievalPipeline(tiny_config)
        model = TriStageMTEBModel(p)
        docs = ["first corpus doc kk1z", "second corpus doc kk2z"]
        emb = model.encode(docs, prompt_name="corpus")
        assert emb.shape[0] == 2
        assert p.get_document_count() == 2
        # re-encoding the same corpus must not re-index
        model.encode(docs, prompt_name="corpus")
        assert p.get_document_count() == 2
        # query encode must NOT index
        model.encode(["a query"], prompt_name="query")
        assert p.get_document_count() == 2

    def test_chunked_corpus_encode_accumulates(self, tiny_config):
        """MTEB encodes corpora in chunks; each chunk must APPEND (not
        clear-and-reindex, which would leave only the last chunk)."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.mteb_adapter import TriStageMTEBModel

        p = RetrievalPipeline(tiny_config)
        model = TriStageMTEBModel(p)
        chunk1 = ["first chunk doc aa1z", "first chunk doc aa2z"]
        chunk2 = ["second chunk doc bb1z", ""]  # empty text is data
        model.encode(chunk1, prompt_name="corpus")
        model.encode(chunk2, prompt_name="corpus")
        assert p.get_document_count() == 4
        # re-encoding a chunk doesn't duplicate
        model.encode(chunk1, prompt_name="corpus")
        assert p.get_document_count() == 4
        # unhinted call must not wipe or grow the index
        model.encode(["mystery sentence"])
        assert p.get_document_count() == 4

    def test_task_names_containing_corpus_do_not_misroute(self, tiny_config):
        """'NFCorpus'/'SciDocsRR'-style task names must not flip query
        batches into corpus indexing (code-review r2 finding)."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.mteb_adapter import TriStageMTEBModel

        p = RetrievalPipeline(tiny_config)
        model = TriStageMTEBModel(p)
        model.encode(["a corpus doc zz1"], prompt_name="corpus")
        assert p.get_document_count() == 1
        # queries for a task whose NAME contains 'corpus' stay queries
        model.encode(
            ["what is zz1"], prompt_name="query", task_name="NFCorpus"
        )
        assert p.get_document_count() == 1
        model.encode(["another q"], prompt_name="query", task_name="SciDocsRR")
        assert p.get_document_count() == 1
        # task-name fallback still routes queries when prompt_name absent
        model.encode(["plain q"], task_name="LIMITSmallRetrieval-queries")
        assert p.get_document_count() == 1

    def test_embedding_cache_hits(self, tiny_config):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.mteb_adapter import TriStageMTEBModel

        p = RetrievalPipeline(tiny_config)
        model = TriStageMTEBModel(p)
        e1 = model.encode(["repeated text"], prompt_name="query")
        e2 = model.encode(["repeated text"], prompt_name="query")
        np.testing.assert_array_equal(e1, e2)
        info = model.cache_info()
        assert info["hits"] >= 1 and info["misses"] >= 1

    def test_search_cross_encoder_corpus_shapes(self, tiny_config):
        """Corpus as dict / list-of-dicts / iterable of texts; queries
        as dict or list (tristage_mteb_model.py:402-481)."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.mteb_adapter import TriStageMTEBModel

        p = RetrievalPipeline(tiny_config)
        model = TriStageMTEBModel(p, top_k=2)
        texts = ["alpha vv1z", "beta vv2z", "gamma vv3z"]
        as_dict = {f"d{i}": {"text": t} for i, t in enumerate(texts)}
        as_list = [{"_id": f"x{i}", "text": t} for i, t in enumerate(texts)]

        r1 = model.search_cross_encoder(as_dict, {"q0": "find vv2z"})
        assert set(r1) == {"q0"} and r1["q0"]
        assert all(k.startswith("d") for k in r1["q0"])
        r2 = model.search_cross_encoder(as_list, ["find vv2z"])
        assert set(r2) == {"0"} and all(k.startswith("x") for k in r2["0"])
        r3 = model.search_cross_encoder(texts, ["find vv3z"])
        assert set(r3) == {"0"} and all(k.isdigit() for k in r3["0"])

    def test_model_card_and_registration(self, tiny_config, monkeypatch):
        import sys
        import types

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.mteb_adapter import (
            ModelCard,
            TriStageMTEBModel,
            register_model,
        )

        p = RetrievalPipeline(tiny_config)
        model = TriStageMTEBModel(p)
        card = model.mteb_model_meta
        assert isinstance(card, ModelCard)
        assert card.name == "tristage-rag-tpu"
        assert card.as_dict()["similarity_fn_name"] == "cosine"

        # fake mteb module with a register hook
        registered = {}
        fake = types.ModuleType("mteb")
        fake.register_model = lambda name, meta: registered.update(
            {name: meta}
        )
        monkeypatch.setitem(sys.modules, "mteb", fake)
        assert register_model(model) is True
        assert "tristage-rag-tpu" in registered

        # absent mteb -> False, never raises
        monkeypatch.delitem(sys.modules, "mteb")
        monkeypatch.setattr(
            "builtins.__import__",
            _raise_on_mteb(__import__),
        )
        assert register_model(model) is False


class TestRunMteb:
    def test_run_mteb_glue_with_fake_mteb(self, tiny_config, monkeypatch):
        """run_mteb drives the model through a (fake) MTEB evaluator and
        extracts main scores from v2 result shapes — the --mteb flag
        must not be a no-op (code-review r2 finding)."""
        import sys
        import types

        calls = {}

        class FakeMTEB:
            def __init__(self, tasks):
                calls["tasks"] = tasks

            def run(self, model, output_folder=None):
                corpus = {"d0": {"text": "alpha qq"}, "d1": {"text": "beta"}}
                calls["res"] = model.search(corpus, {"q0": "alpha qq"}, top_k=2)
                return [{
                    "task_name": "LIMITSmall",
                    "scores": {"test": [{"ndcg_at_10": 0.77}]},
                }]

        fake = types.ModuleType("mteb")
        fake.MTEB = FakeMTEB
        _install_fake_mteb(monkeypatch, fake)

        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline
        from tristage_rag_tpu.eval.mteb_adapter import run_mteb

        _, scores = run_mteb(RetrievalPipeline(tiny_config), "/tmp/nodata")
        assert scores == {"LIMITSmall": 0.77}
        assert calls["res"]["q0"]  # the evaluator really drove search()

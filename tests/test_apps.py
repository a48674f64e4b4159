import io
import json

import pytest

from tristage_rag_tpu.apps.chunker import chunk_text, extract_documents, extract_text
from tristage_rag_tpu.apps.docmanager import DocumentManager
from tristage_rag_tpu.apps.generation import SimpleGenerator, build_prompt


class TestChunker:
    def test_short_text_single_chunk(self):
        assert chunk_text("hello world") == ["hello world"]

    def test_empty(self):
        assert chunk_text("   ") == []

    def test_overlap_and_coverage(self):
        text = " ".join(f"word{i}" for i in range(500))
        chunks = chunk_text(text, chunk_size=200, overlap=50)
        assert all(len(c) <= 200 for c in chunks)
        # every word appears in some chunk
        joined = " ".join(chunks)
        assert "word0" in joined and "word499" in joined
        # consecutive chunks overlap
        assert len(chunks) > 2

    def test_sentence_snapping(self):
        text = ("A sentence that ends here. " * 10).strip()
        chunks = chunk_text(text, chunk_size=100, overlap=0)
        # chunks should end at sentence boundaries when possible
        assert all(c.endswith(".") for c in chunks[:-1])

    def test_extract_json(self, tmp_path):
        f = tmp_path / "docs.json"
        f.write_text(json.dumps(["doc one", "doc two"]))
        assert extract_documents(f) == ["doc one", "doc two"]
        f2 = tmp_path / "docs2.json"
        f2.write_text(json.dumps({"documents": ["a", "b", ""]}))
        assert extract_documents(f2) == ["a", "b"]

    def test_extract_txt_blank_line_split(self, tmp_path):
        f = tmp_path / "d.txt"
        f.write_text("first doc\n\nsecond doc\n\n\nthird")
        assert extract_documents(f) == ["first doc", "second doc", "third"]

    def test_unsupported_type(self, tmp_path):
        f = tmp_path / "x.exe"
        f.write_bytes(b"\x00")
        with pytest.raises(ValueError):
            extract_text(f)


class TestDocumentManager:
    def test_dedup_and_persist(self, tmp_path):
        dm = DocumentManager(tmp_path)
        added = dm.add(["a", "b", "a"], source="test")
        assert added == ["a", "b"]
        assert dm.add(["b", "c"]) == ["c"]
        dm2 = DocumentManager(tmp_path)
        assert dm2.documents == ["a", "b", "c"]
        assert dm2.add(["a"]) == []  # dedup survives reload

    def test_source_counts(self, tmp_path):
        dm = DocumentManager(tmp_path)
        dm.add(["x"], source="s1")
        dm.add(["y", "z"], source="s2")
        assert dm.stats()["sources"] == {"s1": 1, "s2": 2}

    def test_manifest(self, tmp_path):
        dm = DocumentManager(tmp_path)
        assert not dm.is_embedded("chunk1")
        dm.mark_embedded(["chunk1", "chunk2"])
        assert dm.is_embedded("chunk1")
        assert dm.embedded_count() == 2
        dm.clear()
        assert dm.embedded_count() == 0


class TestGeneration:
    def test_prompt_budget(self):
        p = build_prompt("why?", ["c" * 500, "d" * 500], max_chars=600)
        assert "why?" in p
        assert p.count("[2]") == 1
        assert len(p) < 900

    def test_extractive_fallback(self):
        gen = SimpleGenerator.__new__(SimpleGenerator)
        gen._pipe = None
        gen._backend = "extractive"
        from tristage_rag_tpu.apps.generation import GenerationConfig

        gen.config = GenerationConfig()
        out = gen.generate("q", ["the best passage", "other"])
        assert out == "the best passage"
        assert "No relevant context" in gen.generate("q", [])


@pytest.fixture(scope="module")
def webapp(tmp_path_factory):
    from tristage_rag_tpu.apps.cli import RetrievalApp
    from tristage_rag_tpu.apps.webui import WebUI
    from tristage_rag_tpu.engine.config import PipelineConfig

    cfg = PipelineConfig(
        stage1_model="tiny-gemma",
        stage2_model="tiny-modernbert",
        stage3_model="tiny-bert",
        stage1_top_k=8, stage2_top_k=6, stage3_top_k=3,
        stage1_max_text_length=32, stage2_max_seq_length=32, stage3_max_length=48,
        compute_dtype="float32", mesh_data_parallel=1,
        index_dir=str(tmp_path_factory.mktemp("idx")),
    )
    app = RetrievalApp(cfg, data_dir=str(tmp_path_factory.mktemp("data")))
    app.startup()
    app.add_documents([
        "the quick brown fox jumps over the lazy dog",
        "bm25 scores lexical matches in retrieval engines",
        "colbert uses late interaction token embeddings",
    ])
    return WebUI(app)


def _request(app, method, path, body=b"", ctype="application/x-www-form-urlencoded"):
    from urllib.parse import urlsplit

    parts = urlsplit(path)
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": parts.path,
        "QUERY_STRING": parts.query,
        "CONTENT_LENGTH": str(len(body)),
        "CONTENT_TYPE": ctype,
        "wsgi.input": io.BytesIO(body),
    }
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status
        status_headers["headers"] = dict(headers)

    chunks = app(environ, start_response)
    return status_headers["status"], status_headers["headers"], b"".join(chunks)


class TestWebUI:
    def test_chat_page(self, webapp):
        status, headers, body = _request(webapp, "GET", "/")
        assert status == "200 OK"
        assert b"TriStage-TPU" in body

    def test_api_search(self, webapp):
        status, _, body = _request(webapp, "GET", "/api/search?q=quick+fox&top_k=2")
        assert status == "200 OK"
        payload = json.loads(body)
        assert payload["query"] == "quick fox"
        assert len(payload["results"]) <= 2
        assert "stage3_score" in payload["results"][0]

    def test_api_search_missing_q(self, webapp):
        status, _, body = _request(webapp, "GET", "/api/search")
        assert status.startswith("400")

    def test_search_page_highlights(self, webapp):
        status, _, body = _request(webapp, "GET", "/search?q=fox")
        assert status == "200 OK"
        assert b"<mark>fox</mark>" in body

    def test_add_documents_form(self, webapp):
        before = len(webapp.app.docs.documents)
        body = b"text=" + b"a+brand+new+document+about+zebras"
        status, headers, _ = _request(webapp, "POST", "/add", body)
        assert status.startswith("303")
        assert len(webapp.app.docs.documents) == before + 1

    def test_chat_flow(self, webapp):
        status, headers, _ = _request(
            webapp, "POST", "/chat", b"message=quick+fox"
        )
        assert status.startswith("303")
        # history is stored under the newly-set session
        assert any(webapp._chats.values())

    def test_api_stats_and_status(self, webapp):
        _, _, body = _request(webapp, "GET", "/api/stats")
        stats = json.loads(body)
        assert stats["documents"]["total_documents"] >= 3
        _, _, body2 = _request(webapp, "GET", "/api/documents-status")
        st = json.loads(body2)
        assert st["indexed"] >= 3

    def test_404(self, webapp):
        status, _, _ = _request(webapp, "GET", "/nope")
        assert status.startswith("404")

    def test_highlight_escapes_html(self):
        from tristage_rag_tpu.apps.webui import highlight

        out = highlight("<script>alert('fox')</script>", "fox")
        assert "<script>" not in out
        assert "<mark>fox</mark>" in out


class TestRetrievalApp:
    def test_startup_reindex_and_persist(self, tmp_path):
        from tristage_rag_tpu.apps.cli import RetrievalApp
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=4, stage2_top_k=3,
            stage3_top_k=2, stage1_max_text_length=32,
            stage2_max_seq_length=32, stage3_max_length=48,
            compute_dtype="float32", mesh_data_parallel=1,
            index_dir=str(tmp_path / "idx"),
        )
        app = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app.startup()
        assert app.add_documents(["doc about jax", "doc about tpu"]) == 2
        assert app.add_documents(["doc about jax"]) == 0  # dedup
        out = app.search("jax")
        assert out["results"]

        # fresh app instance loads the persisted index
        app2 = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app2.startup()
        assert app2.pipeline.get_document_count() == 2
        out2 = app2.search("jax")
        assert [r["doc_id"] for r in out2["results"]] == [
            r["doc_id"] for r in out["results"]
        ]

    def test_load_file_and_history(self, tmp_path):
        from tristage_rag_tpu.apps.cli import RetrievalApp
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=4, stage2_top_k=3,
            stage3_top_k=2, stage1_max_text_length=32,
            stage2_max_seq_length=32, stage3_max_length=48,
            compute_dtype="float32", mesh_data_parallel=1,
            index_dir=str(tmp_path / "idx"),
        )
        app = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app.startup()
        f = tmp_path / "in.json"
        f.write_text(json.dumps(["aaa bbb", "ccc ddd"]))
        assert app.load_file(f) == 2
        app.search("aaa")
        hist_file = tmp_path / "hist.json"
        app.export_history(hist_file)
        assert len(json.loads(hist_file.read_text())) == 1


class TestWebUIEmbedDir:
    def test_embed_server_directory(self, webapp, tmp_path):
        d = tmp_path / "docs"
        d.mkdir()
        (d / "a.txt").write_text("a fresh server side document about yaks")
        before = len(webapp.app.docs.documents)
        body = f"dir={d}".encode()
        status, _, _ = _request(webapp, "POST", "/embed/run", body)
        assert status.startswith("303")
        assert len(webapp.app.docs.documents) == before + 1

    def test_embed_missing_dir_no_crash(self, webapp):
        status, _, _ = _request(webapp, "POST", "/embed/run", b"dir=/nope/nothere")
        assert status.startswith("303")


class TestWebUIDelete:
    def test_api_delete(self, webapp):
        # find a doc id via search, delete it, confirm exclusion
        _, _, body = _request(webapp, "GET", "/api/search?q=colbert&top_k=1")
        target = json.loads(body)["results"][0]["doc_id"]
        payload = json.dumps({"doc_ids": [target]}).encode()
        status, _, body2 = _request(
            webapp, "POST", "/api/delete", payload, ctype="application/json"
        )
        assert status == "200 OK"
        assert json.loads(body2)["documents_deleted"] == 1
        _, _, body3 = _request(webapp, "GET", "/api/search?q=colbert&top_k=5")
        assert all(r["doc_id"] != target for r in json.loads(body3)["results"])

    def test_api_delete_bad_payload(self, webapp):
        status, _, _ = _request(
            webapp, "POST", "/api/delete", b"not json", ctype="application/json"
        )
        assert status.startswith("400")

    def test_api_delete_non_numeric_ids(self, webapp):
        payload = json.dumps({"doc_ids": ["abc", None]}).encode()
        status, _, _ = _request(
            webapp, "POST", "/api/delete", payload, ctype="application/json"
        )
        assert status.startswith("400")

    def test_api_delete_persists_across_restart(self, tmp_path):
        from tristage_rag_tpu.apps.cli import RetrievalApp
        from tristage_rag_tpu.apps.webui import WebUI
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=4, stage2_top_k=3,
            stage3_top_k=2, stage1_max_text_length=32,
            stage2_max_seq_length=32, stage3_max_length=48,
            compute_dtype="float32", mesh_data_parallel=1,
            index_dir=str(tmp_path / "idx"),
        )
        app = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app.startup()
        app.add_documents(["keep this one", "web delete target zz9"])
        ui = WebUI(app)
        payload = json.dumps({"doc_ids": [1]}).encode()
        status, _, body = _request(
            ui, "POST", "/api/delete", payload, ctype="application/json"
        )
        assert status == "200 OK"
        assert json.loads(body)["documents_deleted"] == 1
        # web deletions must survive restart (ADVICE r1: the old path
        # skipped save_index, so tombstoned docs resurrected on reload)
        app2 = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app2.startup()
        out2 = app2.search("web delete zz9")
        assert all(r["doc_id"] != 1 for r in out2["results"])


class TestAppDelete:
    def test_delete_documents_persists(self, tmp_path):
        from tristage_rag_tpu.apps.cli import RetrievalApp
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=4, stage2_top_k=3,
            stage3_top_k=2, stage1_max_text_length=32,
            stage2_max_seq_length=32, stage3_max_length=48,
            compute_dtype="float32", mesh_data_parallel=1,
            index_dir=str(tmp_path / "idx"),
        )
        app = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app.startup()
        app.add_documents(["keep this one", "delete this one zz9"])
        assert app.delete_documents([1]) == 1
        out = app.search("delete zz9")
        assert all(r["doc_id"] != 1 for r in out["results"])
        # persisted: reload still excludes the tombstoned doc
        app2 = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app2.startup()
        out2 = app2.search("delete zz9")
        assert all(r["doc_id"] != 1 for r in out2["results"])


def test_profile_search_captures_trace(tmp_path):
    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    cfg = PipelineConfig(
        stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
        stage3_model="tiny-bert", stage1_top_k=4, stage2_top_k=3,
        stage3_top_k=2, stage1_max_text_length=32,
        stage2_max_seq_length=32, stage3_max_length=48,
        compute_dtype="float32", mesh_data_parallel=1,
    )
    p = RetrievalPipeline(cfg)
    p.add_documents(["alpha beta", "gamma delta"])
    out = p.profile_search("alpha", log_dir=str(tmp_path / "trace"))
    assert out["results"]
    assert out["trace_dir"] == str(tmp_path / "trace")
    # a trace artifact was actually written
    import os

    assert any(os.scandir(tmp_path / "trace"))


class TestDeleteSurvivesRebuild:
    def test_deleted_docs_do_not_resurrect_from_doc_store(self, tmp_path):
        """If the index files are lost, startup() rebuilds from the raw
        doc store and must re-apply deletion tombstones
        (code-review r2 finding)."""
        import shutil

        from tristage_rag_tpu.apps.cli import RetrievalApp
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=4, stage2_top_k=3,
            stage3_top_k=2, stage1_max_text_length=32,
            stage2_max_seq_length=32, stage3_max_length=48,
            compute_dtype="float32", mesh_data_parallel=1,
            index_dir=str(tmp_path / "idx"),
        )
        app = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app.startup()
        app.add_documents(["keep this one", "delete this one xx9"])
        assert app.delete_documents([1]) == 1
        assert app.docs.stats()["deleted_documents"] == 1
        # simulate index loss -> rebuild from the doc store
        shutil.rmtree(tmp_path / "idx")
        app2 = RetrievalApp(cfg, data_dir=str(tmp_path / "data"))
        app2.startup()
        out = app2.search("delete xx9")
        assert all(r["doc_id"] != 1 for r in out["results"])


class TestWebUIHighlightEntities:
    def test_query_words_do_not_match_entity_bodies(self):
        from tristage_rag_tpu.apps.webui import highlight

        out = highlight("A & B", "amp")
        assert "&amp;" in out and "<mark>amp</mark>" not in out
        out2 = highlight("use <tags> & amp here", "amp")
        assert "<mark>amp</mark>" in out2  # the real word still marks
        assert "&amp;" in out2 and "&lt;tags&gt;" in out2

import numpy as np
import pytest

import jax

from tristage_rag_tpu.index.bm25 import BM25Index, bm25_tokenize
from tristage_rag_tpu.index.dense import DenseIndex
from tristage_rag_tpu.parallel.mesh import create_mesh


class TestDenseIndex:
    def test_add_search_roundtrip(self):
        rng = np.random.default_rng(0)
        idx = DenseIndex(dim=16)
        emb = rng.standard_normal((50, 16)).astype(np.float32)
        ids = idx.add(emb)
        assert ids.tolist() == list(range(50))
        scores, got = idx.search(emb[7:8], k=5)
        assert scores.shape == (1, 5) and got.shape == (1, 5)
        # exact top-k must match numpy over the valid rows
        ref = emb @ emb[7]
        np.testing.assert_array_equal(got[0], np.argsort(-ref)[:5])

    def test_normalized_self_retrieval(self):
        rng = np.random.default_rng(1)
        emb = rng.standard_normal((40, 8)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        idx = DenseIndex(dim=8)
        idx.add(emb)
        scores, got = idx.search(emb[:10], k=1)
        np.testing.assert_array_equal(got[:, 0], np.arange(10))
        np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-5)

    def test_growth(self):
        idx = DenseIndex(dim=4, capacity=1024)
        rng = np.random.default_rng(2)
        for _ in range(3):
            idx.add(rng.standard_normal((600, 4)).astype(np.float32))
        assert idx.count == 1800
        assert idx.capacity >= 1800
        s, i = idx.search(np.ones((1, 4), np.float32), k=10)
        assert (i >= 0).all()

    def test_k_exceeds_count(self):
        idx = DenseIndex(dim=4)
        idx.add(np.eye(4, dtype=np.float32)[:2])
        s, i = idx.search(np.ones((1, 4), np.float32), k=8)
        assert (i[0, :2] >= 0).all()
        assert (i[0, 2:] == -1).all()

    def test_persistence(self, tmp_path):
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((30, 8)).astype(np.float32)
        idx = DenseIndex(dim=8)
        idx.add(emb)
        idx.save(tmp_path / "dense")
        loaded = DenseIndex.load(tmp_path / "dense")
        assert loaded.count == 30
        s1, i1 = idx.search(emb[:3], k=4)
        s2, i2 = loaded.search(emb[:3], k=4)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_matches_single_device(self):
        mesh = create_mesh(8)
        rng = np.random.default_rng(4)
        emb = rng.standard_normal((500, 16)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = emb[::50][:6]

        single = DenseIndex(dim=16)
        single.add(emb)
        sharded = DenseIndex(dim=16, mesh=mesh)
        sharded.add(emb)

        s1, i1 = single.search(q, k=7)
        s2, i2 = sharded.search(q, k=7)
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(i1, i2)

    def test_sharded_approx_recall(self):
        """Per-shard approx_max_k on a mesh: near-exact recall and
        deterministic results (the sharded fused funnel relies on the
        same per-shard semantics — engine/fused.py)."""
        mesh = create_mesh(8)
        rng = np.random.default_rng(5)
        emb = rng.standard_normal((2048, 32)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = emb[::100][:8]

        exact = DenseIndex(dim=32, mesh=mesh, search_impl="exact")
        exact.add(emb)
        approx = DenseIndex(dim=32, mesh=mesh, search_impl="approx")
        approx.add(emb)

        _, ie = exact.search(q, k=16)
        _, ia = approx.search(q, k=16)
        _, ia2 = approx.search(q, k=16)
        np.testing.assert_array_equal(ia, ia2)  # deterministic
        overlap = np.mean([
            len(set(ie[r]) & set(ia[r])) / 16 for r in range(len(q))
        ])
        assert overlap >= 0.9, overlap
        # self-retrieval must survive approx
        assert (ia[:, 0] == np.arange(0, 2048, 100)[:8]).all()


def _bm25_ref_score(query, docs, doc_idx, k1=1.2, b=0.75):
    """Independent reimplementation of the reference's BM25 math
    (src/stage1_retriever.py:56-101) for cross-checking."""
    import math
    from collections import Counter

    toks = [bm25_tokenize(d) for d in docs]
    n = len(docs)
    avg = sum(len(t) for t in toks) / n
    counts = Counter(toks[doc_idx])
    score = 0.0
    for tok in bm25_tokenize(query):
        if tok not in counts:
            continue
        df = sum(1 for t in toks if tok in t)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        tf = counts[tok]
        score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[doc_idx]) / avg))
    return score


class TestBM25:
    DOCS = [
        "the quick brown fox jumps over the lazy dog",
        "a fast auburn fox leaped over a sleepy canine",
        "completely unrelated text about databases and indexes",
        "the dog sat quietly near the fox den",
    ]

    def test_scores_match_reference_math(self):
        idx = BM25Index()
        idx.add(self.DOCS)
        q = "quick fox dog"
        scores = idx.score_all(q)
        for d in range(len(self.DOCS)):
            assert scores[d] == pytest.approx(
                _bm25_ref_score(q, self.DOCS, d), rel=1e-9
            )

    def test_incremental_equals_batch(self):
        batch = BM25Index()
        batch.add(self.DOCS)
        inc = BM25Index()
        for d in self.DOCS:
            inc.add([d])
        q = "fox over the"
        np.testing.assert_allclose(batch.score_all(q), inc.score_all(q), rtol=1e-12)

    def test_search_order(self):
        idx = BM25Index()
        idx.add(self.DOCS)
        results = idx.search("quick brown fox", top_k=2)
        assert results[0][0] == 0
        assert len(results) == 2

    def test_empty_query_and_corpus(self):
        idx = BM25Index()
        assert idx.search("anything") == []
        idx.add(self.DOCS)
        assert all(s == 0.0 for _, s in idx.search("", top_k=2))

    def test_persistence(self, tmp_path):
        idx = BM25Index()
        idx.add(self.DOCS)
        idx.save(tmp_path / "bm25")
        loaded = BM25Index.load(tmp_path / "bm25")
        q = "lazy dog fox"
        np.testing.assert_allclose(
            loaded.score_all(q), idx.score_all(q), rtol=1e-12
        )
        # incremental add still works after load
        loaded.add(["another document about a fox"])
        assert loaded.corpus_size == 5


class TestBM25TieOrder:
    def test_bounded_sort_matches_full_stable_sort(self):
        """The O(N + k log k) selection must equal a full stable argsort
        on tie-heavy score distributions (zero-score docs in doc-id
        order — the reference's stable list.sort contract)."""
        import numpy as np

        from tristage_rag_tpu.index.bm25 import BM25Index

        rng = np.random.default_rng(0)
        words = ["fox", "dog", "bm25", "tpu", "rank"]
        docs = []
        for i in range(200):
            if i % 3 == 0:
                docs.append(" ".join(rng.choice(words, size=3)))
            else:
                docs.append(f"filler{i} nothing relevant")
        idx = BM25Index()
        idx.add(docs)
        for q in ("fox dog", "bm25", "absent-term", ""):
            scores = idx.score_all(q)
            for k in (5, 50, 150, 200):
                expect = np.argsort(-scores, kind="stable")[:k]
                got = [i for i, _ in idx.search(q, k)]
                np.testing.assert_array_equal(got, expect)


class TestStage1LoadIndexConsistency:
    def _cfg(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig

        return PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=6, stage1_bm25_top_k=6,
            stage1_max_text_length=32, compute_dtype="float32",
            mesh_data_parallel=1, index_dir=str(tmp_path / "idx"),
        )

    def test_missing_dense_file_fails_without_mutating(self, tmp_path):
        """docs.json without its dense npz must fail the load and keep
        in-memory state intact (code-review r2 finding)."""
        import json as _json

        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        d = tmp_path / "idx"
        d.mkdir(parents=True)
        (d / "stage1_docs.json").write_text(
            _json.dumps({"documents": ["stale"], "metadata": [{}]})
        )
        s1 = Stage1Retriever(self._cfg(tmp_path))
        s1.add_documents(["live document one", "live document two"])
        assert s1.load_index() is False
        assert s1.documents == ["live document one", "live document two"]
        hits = s1.search("live document", 2)
        assert hits and all("live" in r["document"] for r in hits)

    def test_bm25_rebuilt_when_sidecar_missing(self, tmp_path):
        """Loading an index saved with BM25 disabled into a BM25-enabled
        retriever must rebuild BM25 over the loaded docs so later adds
        keep id alignment (code-review r2 finding)."""
        import dataclasses

        from tristage_rag_tpu.engine.stage1 import Stage1Retriever

        cfg_off = dataclasses.replace(
            self._cfg(tmp_path), stage1_enable_bm25=False
        )
        s_off = Stage1Retriever(cfg_off)
        s_off.add_documents([f"original doc number {i} oo{i}" for i in range(4)])
        s_off.save_index()

        s_on = Stage1Retriever(self._cfg(tmp_path))
        assert s_on.load_index() is True
        assert s_on.bm25 is not None and s_on.bm25.corpus_size == 4
        s_on.add_documents(["a freshly added doc about pelicans pp7"])
        hits = s_on.search("pelicans pp7", 5)
        # the new doc surfaces under its CONTINUED id with its own text
        # (a reset BM25 would have mapped the lexical hit to doc 0)
        match = [r for r in hits if r["doc_id"] == 4]
        assert match and match[0]["document"].endswith("pp7")

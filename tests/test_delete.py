import numpy as np
import pytest

import jax

from tristage_rag_tpu.index.dense import DenseIndex
from tristage_rag_tpu.parallel.mesh import create_mesh


class TestDenseDelete:
    def _normalized(self, n, d, seed=0):
        rng = np.random.default_rng(seed)
        e = rng.standard_normal((n, d)).astype(np.float32)
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    def test_deleted_never_returned(self):
        emb = self._normalized(40, 8)
        idx = DenseIndex(dim=8)
        idx.add(emb)
        assert idx.delete([5, 7]) == 2
        assert idx.live_count == 38
        _, ids = idx.search(emb, k=3)
        assert 5 not in ids and 7 not in ids
        # query vector 5's nearest is now something else, not -1
        assert ids[5, 0] >= 0

    def test_delete_idempotent_and_bounds(self):
        idx = DenseIndex(dim=8)
        idx.add(self._normalized(10, 8))
        assert idx.delete([3]) == 1
        assert idx.delete([3]) == 0  # already deleted
        assert idx.delete([99]) == 0  # out of range
        assert idx.live_count == 9

    def test_delete_survives_growth(self):
        idx = DenseIndex(dim=8, capacity=1024)
        emb = self._normalized(600, 8)
        idx.add(emb)
        idx.delete([0])
        idx.add(self._normalized(600, 8, seed=1))  # triggers growth
        _, ids = idx.search(emb[0:1], k=5)
        assert 0 not in ids

    def test_delete_persists(self, tmp_path):
        idx = DenseIndex(dim=8)
        emb = self._normalized(20, 8)
        idx.add(emb)
        idx.delete([2, 4])
        idx.save(tmp_path / "d")
        loaded = DenseIndex.load(tmp_path / "d")
        assert loaded.live_count == 18
        _, ids = loaded.search(emb[2:3], k=5)
        assert 2 not in ids and 4 not in ids

    def test_compact_reclaims(self):
        idx = DenseIndex(dim=8)
        emb = self._normalized(10, 8)
        idx.add(emb)
        idx.delete([1, 3])
        mapping = idx.compact()
        assert idx.count == 8 and idx.live_count == 8
        assert 1 not in mapping and 3 not in mapping
        # surviving vectors still retrieve themselves
        _, ids = idx.search(emb[mapping][:4], k=1)
        np.testing.assert_array_equal(ids[:, 0], np.arange(4))

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_delete(self):
        mesh = create_mesh(8)
        emb = self._normalized(256, 16)
        idx = DenseIndex(dim=16, mesh=mesh)
        idx.add(emb)
        idx.delete([10, 200])
        _, ids = idx.search(emb[[10, 200]], k=4)
        assert 10 not in ids and 200 not in ids


class TestStage1DeleteBounds:
    def test_out_of_range_delete_does_not_poison_future_ids(
        self, tiny_config, sample_docs
    ):
        """Deleting an id beyond the current count must be a no-op:
        a document later assigned that id must still be retrievable
        (ADVICE r1: deleted_ids was updated unconditionally)."""
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(tiny_config)
        p.add_documents(sample_docs[:5])
        n = 5
        out = p.delete_documents([n + 1])  # not yet assigned
        assert out["documents_deleted"] == 0
        assert not p.stage1.deleted_ids
        p.add_documents(sample_docs[5:])  # doc n+1 now exists
        # stage1 returns every live doc here (top_k=20 > corpus=10), so
        # absence of id n+1 can only mean the poisoned host-side filter
        hits = p.stage1.search(sample_docs[6], tiny_config.stage1_top_k)
        assert any(r["doc_id"] == n + 1 for r in hits)


class TestPipelineDelete:
    def test_delete_through_pipeline(self, tiny_config, sample_docs):
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        p = RetrievalPipeline(tiny_config)
        p.add_documents(sample_docs)
        target = p.search("BM25 lexical scoring", top_k=3)["results"][0]
        out = p.delete_documents([target["doc_id"]])
        assert out["documents_deleted"] == 1
        after = p.search("BM25 lexical scoring", top_k=5)
        assert all(r["doc_id"] != target["doc_id"] for r in after["results"])
        assert all(
            r["doc_id"] != target["doc_id"] for r in after["stage1_results"]
        )

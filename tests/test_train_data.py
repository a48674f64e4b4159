import json

import numpy as np
import pytest

from tristage_rag_tpu.models.tokenizer import HashTokenizer
from tristage_rag_tpu.train.data import PairBatch, PairDataLoader, load_pairs


class TestLoadPairs:
    def test_jsonl(self, tmp_path):
        p = tmp_path / "pairs.jsonl"
        p.write_text(
            "\n".join([
                json.dumps({"query": "q1", "positive": "d1"}),
                json.dumps({"query": "q2", "document": "d2"}),
                json.dumps({"q": "q3", "text": "d3"}),
                json.dumps({"query": "", "positive": "skip"}),
                "",
            ])
        )
        pairs = load_pairs(p)
        assert pairs == [("q1", "d1"), ("q2", "d2"), ("q3", "d3")]

    def test_tsv(self, tmp_path):
        p = tmp_path / "pairs.tsv"
        p.write_text("q1\td1\nq2\td2\nmalformed-line\n")
        assert load_pairs(p) == [("q1", "d1"), ("q2", "d2")]


class TestPairDataLoader:
    def _loader(self, n=20, bs=8, seed=0):
        pairs = [(f"query {i}", f"document {i} body") for i in range(n)]
        return PairDataLoader(
            pairs, HashTokenizer(vocab_size=512), batch_size=bs,
            query_max_len=16, doc_max_len=16, seed=seed,
        )

    def test_batch_shapes_static(self):
        loader = self._loader()
        batches = list(loader.epoch_batches())
        assert len(batches) == 2  # 20 // 8, tail dropped
        for b in batches:
            assert b.size == 8
            assert b.q_ids.shape == b.q_mask.shape
            assert b.d_ids.shape[0] == 8

    def test_shuffles_between_epochs(self):
        loader = self._loader(n=32, bs=32)
        a = next(iter(loader.epoch_batches())).q_ids
        b = next(iter(loader.epoch_batches())).q_ids
        assert not np.array_equal(a, b)

    def test_infinite_stream(self):
        loader = self._loader(n=16, bs=8)
        it = iter(loader)
        batches = [next(it) for _ in range(5)]  # crosses epoch boundary
        assert all(isinstance(b, PairBatch) for b in batches)
        assert loader.epoch >= 2

    def test_too_few_pairs(self):
        with pytest.raises(ValueError, match="at least"):
            self._loader(n=4, bs=8)

    def test_deterministic_given_seed(self):
        a = next(iter(self._loader(seed=7).epoch_batches()))
        b = next(iter(self._loader(seed=7).epoch_batches()))
        np.testing.assert_array_equal(a.q_ids, b.q_ids)

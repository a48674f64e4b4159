"""Native C++ components vs their pure-Python references."""

import numpy as np
import pytest

from tristage_rag_tpu.native import available

pytestmark = pytest.mark.skipif(
    not available(), reason="native toolchain unavailable"
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over a sleepy canine",
    "completely unrelated text about databases and indexes",
    "the dog sat quietly near the fox den",
    "",  # empty doc edge case
    "numbers 123 and symbols #! mixed in",
]


class TestNativeBM25:
    @pytest.mark.parametrize("query", [
        "quick fox dog", "fox over the", "unknownterm", "", "123 symbols",
    ])
    def test_scores_match_python(self, query):
        from tristage_rag_tpu.index.bm25 import BM25Index

        nat = BM25Index(use_native=True)
        nat.add(DOCS)
        assert nat._native is not None
        py = BM25Index(use_native=False)
        py.add(DOCS)
        np.testing.assert_allclose(
            nat.score_all(query), py.score_all(query), rtol=1e-12
        )

    def test_incremental_adds(self):
        from tristage_rag_tpu.index.bm25 import BM25Index

        nat = BM25Index(use_native=True)
        for d in DOCS:
            nat.add([d])
        py = BM25Index(use_native=False)
        py.add(DOCS)
        np.testing.assert_allclose(
            nat.score_all("fox dog"), py.score_all("fox dog"), rtol=1e-12
        )

    def test_all_empty_corpus_no_nan(self):
        """avg_doc_len==0 must not divide by zero in the C++ scorer
        (ADVICE r1); both paths return finite scores and agree."""
        from tristage_rag_tpu.index.bm25 import BM25Index

        nat = BM25Index(use_native=True)
        nat.add(["", "", ""])
        py = BM25Index(use_native=False)
        py.add(["", "", ""])
        s_nat, s_py = nat.score_all("anything"), py.score_all("anything")
        assert np.isfinite(s_nat).all() and np.isfinite(s_py).all()
        np.testing.assert_allclose(s_nat, s_py, rtol=1e-12)

    def test_native_survives_load(self, tmp_path):
        from tristage_rag_tpu.index.bm25 import BM25Index

        idx = BM25Index(use_native=True)
        idx.add(DOCS)
        idx.save(tmp_path / "bm")
        loaded = BM25Index.load(tmp_path / "bm")
        np.testing.assert_allclose(
            loaded.score_all("lazy dog"), idx.score_all("lazy dog"), rtol=1e-12
        )
        # and further adds keep native in sync
        loaded.add(["one more fox document"])
        py = BM25Index(use_native=False)
        py.add(DOCS + ["one more fox document"])
        np.testing.assert_allclose(
            loaded.score_all("fox"), py.score_all("fox"), rtol=1e-12
        )


class TestNativeWordPiece:
    VOCAB = {
        "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
        "un": 4, "##aff": 5, "##able": 6, "hello": 7, "fox": 8,
        "quick": 9, ".": 10, ",": 11, "!": 12, "123": 13, "the": 14,
    }

    @pytest.mark.parametrize("text", [
        "hello unaffable fox.",
        "Quick, hello FOX unaffable!",
        "unknownword here",
        "",
        "the the the 123",
        "punct...only,!",
        # non-ASCII: the native splitter is byte-oriented, so these must
        # route to the Python path (code-review r2 finding — em dashes /
        # NBSP previously glued words only on the native path)
        "quick—fox—hello unaffable",
        "hello fox",
        "résumé fox",  # NFD-normalizes to ASCII 'resume'
        "中文 fox hello",
    ])
    def test_ids_match_python(self, text):
        from tristage_rag_tpu.models.tokenizer import WordPieceTokenizer

        t_native = WordPieceTokenizer(self.VOCAB)
        assert t_native._native is not None
        t_py = WordPieceTokenizer(self.VOCAB)
        t_py._native = None
        assert t_native.tokenize_to_ids(text) == t_py.tokenize_to_ids(text)

    def test_long_word_unk(self):
        from tristage_rag_tpu.models.tokenizer import WordPieceTokenizer

        t = WordPieceTokenizer(self.VOCAB)
        long_word = "a" * 200
        t_py = WordPieceTokenizer(self.VOCAB)
        t_py._native = None
        assert t.tokenize_to_ids(long_word) == t_py.tokenize_to_ids(long_word)

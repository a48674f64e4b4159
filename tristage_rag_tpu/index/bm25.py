"""Vectorized, incrementally-updatable Okapi BM25.

Scoring semantics match the reference BM25 (src/stage1_retriever.py:
35-112: k1=1.2, b=0.75, idf = ln((N - df + 0.5)/(df + 0.5) + 1),
lowercase alnum tokenizer), but the implementation is host-vectorized —
sparse/branchy work is the wrong shape for the TPU (SURVEY.md §2.6):

* per-term postings as a CSC-style sparse matrix built lazily,
* ``add`` updates df/doc-length stats incrementally instead of the
  reference's full refit on every add (stage1_retriever.py:316-322 —
  SURVEY.md §7 "BM25 incrementality"),
* ``search`` scores ONLY documents containing a query term via numpy
  scatter-add, instead of the reference's pure-Python loop over every
  document (stage1_retriever.py:103-112).
"""

from __future__ import annotations

import json
import re
from collections import Counter
from pathlib import Path

import numpy as np
from scipy import sparse

_TOKEN_RE = re.compile(r"[^a-z0-9\s]")


def bm25_tokenize(text: str) -> list[str]:
    """Reference-parity tokenizer: lowercase, strip non-alnum, split."""
    return _TOKEN_RE.sub(" ", text.lower()).split()


class BM25Index:
    def __init__(self, k1: float = 1.2, b: float = 0.75, use_native: bool = True):
        self.k1 = k1
        self.b = b
        self.vocab: dict[str, int] = {}
        self.df = np.zeros(0, dtype=np.int64)
        self.doc_lens: list[int] = []
        # COO triplets accumulated incrementally; CSC built lazily.
        self._rows: list[np.ndarray] = []
        self._cols: list[np.ndarray] = []
        self._tfs: list[np.ndarray] = []
        self._csc: sparse.csc_matrix | None = None
        # Optional C++ postings engine (native/bm25.cpp); scoring falls
        # back to the scipy path when the toolchain is unavailable.
        self._native = None
        if use_native:
            try:
                from tristage_rag_tpu.native.wrappers import NativeBM25

                self._native = NativeBM25(k1, b)
            except Exception:
                self._native = None

    @property
    def corpus_size(self) -> int:
        return len(self.doc_lens)

    @property
    def avg_doc_len(self) -> float:
        return float(np.mean(self.doc_lens)) if self.doc_lens else 0.0

    def _term_id(self, term: str) -> int:
        tid = self.vocab.get(term)
        if tid is None:
            tid = len(self.vocab)
            self.vocab[term] = tid
            if tid >= self.df.shape[0]:
                grow = max(1024, self.df.shape[0])
                self.df = np.concatenate([self.df, np.zeros(grow, dtype=np.int64)])
        return tid

    def add(self, documents: list[str]) -> None:
        """Incrementally index documents (no full refit)."""
        for text in documents:
            doc_idx = len(self.doc_lens)
            tokens = bm25_tokenize(text)
            counts = Counter(tokens)
            self.doc_lens.append(len(tokens))
            if counts:
                tids = np.fromiter(
                    (self._term_id(t) for t in counts), dtype=np.int64, count=len(counts)
                )
                tfs = np.fromiter(counts.values(), dtype=np.float64, count=len(counts))
                self._rows.append(np.full(len(counts), doc_idx, dtype=np.int64))
                self._cols.append(tids)
                self._tfs.append(tfs)
                self.df[tids] += 1
                if self._native is not None:
                    self._native.add_doc(tids, tfs, len(tokens))
            elif self._native is not None:
                self._native.add_doc(
                    np.empty(0, np.int64), np.empty(0, np.float64), len(tokens)
                )
        self._csc = None  # invalidate

    # Back-compat alias mirroring the reference API (fit == rebuild-from).
    def fit(self, documents: list[str]) -> None:
        self.__init__(self.k1, self.b, use_native=self._native is not None)
        self.add(documents)

    def _matrix(self) -> sparse.csc_matrix:
        if self._csc is None or self._csc.shape[0] != self.corpus_size:
            if self._rows:
                rows = np.concatenate(self._rows)
                cols = np.concatenate(self._cols)
                tfs = np.concatenate(self._tfs)
            else:
                rows = cols = np.empty(0, dtype=np.int64)
                tfs = np.empty(0, dtype=np.float64)
            self._csc = sparse.csc_matrix(
                (tfs, (rows, cols)),
                shape=(self.corpus_size, max(len(self.vocab), 1)),
            )
        return self._csc

    def _idf(self, tid: int) -> float:
        n, df = self.corpus_size, float(self.df[tid])
        return float(np.log((n - df + 0.5) / (df + 0.5) + 1.0))

    def score_all(self, query: str) -> np.ndarray:
        """BM25 scores for every document — vectorized over postings."""
        n = self.corpus_size
        scores = np.zeros(n, dtype=np.float64)
        if n == 0:
            return scores
        q_tokens = bm25_tokenize(query)
        if not q_tokens:
            return scores
        if self._native is not None and self._native.num_docs == n:
            q_counts = Counter(q_tokens)
            tids = np.asarray(
                [self.vocab.get(t, -1) for t in q_counts], dtype=np.int64
            )
            counts = np.asarray(list(q_counts.values()), dtype=np.float64)
            return self._native.score(tids, counts)
        mat = self._matrix()
        dl = np.asarray(self.doc_lens, dtype=np.float64)
        avg = self.avg_doc_len or 1.0
        norm = self.k1 * (1.0 - self.b + self.b * dl / avg)
        # Duplicate query terms contribute once per occurrence, matching
        # the reference's loop over query tokens.
        for term, q_tf in Counter(q_tokens).items():
            tid = self.vocab.get(term)
            if tid is None:
                continue
            col = mat.getcol(tid)
            docs, tfs = col.indices, col.data
            idf = self._idf(tid)
            contrib = idf * (tfs * (self.k1 + 1.0)) / (tfs + norm[docs])
            scores[docs] += q_tf * contrib
        return scores

    def search(self, query: str, top_k: int = 10) -> list[tuple[int, float]]:
        scores = self.score_all(query)
        n = scores.shape[0]
        if n == 0:
            return []
        top_k = min(top_k, n)
        # Tie contract: ties (zero-score docs in particular) must come
        # out in doc-id order to match the reference's stable list.sort
        # (stage1_retriever.py:103-112) — plain argpartition selects an
        # arbitrary subset of boundary ties, which perturbs downstream
        # RRF ranks (caught by tests/test_reference_parity.py). To keep
        # O(N + k log k) instead of a full O(N log N) sort: partition
        # for the k-th score, stable-sort only the strictly-greater
        # rows, then fill with threshold ties in ascending-id order
        # (np.nonzero yields ids ascending).
        if top_k == n:
            order = np.argsort(-scores, kind="stable")
        else:
            part = np.argpartition(-scores, top_k - 1)[:top_k]
            kth = scores[part].min()
            above = np.nonzero(scores > kth)[0]
            above = above[np.argsort(-scores[above], kind="stable")]
            need = top_k - above.size
            ties = np.nonzero(scores == kth)[0][:need]
            order = np.concatenate([above, ties])
        return [(int(i), float(scores[i])) for i in order]

    # ---- persistence (JSON + npz; never pickle — SURVEY.md §5.4) --------

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        mat = self._matrix().tocoo()
        np.savez_compressed(
            path.with_suffix(".npz"),
            rows=mat.row.astype(np.int64),
            cols=mat.col.astype(np.int64),
            tfs=mat.data,
            df=self.df[: len(self.vocab)],
            doc_lens=np.asarray(self.doc_lens, dtype=np.int64),
        )
        meta = {
            "k1": self.k1,
            "b": self.b,
            "vocab": self.vocab,
            "format": "tristage-bm25-v1",
        }
        path.with_suffix(".json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str | Path) -> "BM25Index":
        path = Path(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        idx = cls(k1=meta["k1"], b=meta["b"])
        idx.vocab = {k: int(v) for k, v in meta["vocab"].items()}
        with np.load(path.with_suffix(".npz")) as z:
            idx.df = np.zeros(max(len(idx.vocab), 1024), dtype=np.int64)
            idx.df[: z["df"].shape[0]] = z["df"]
            idx.doc_lens = z["doc_lens"].tolist()
            if z["rows"].size:
                idx._rows = [z["rows"]]
                idx._cols = [z["cols"]]
                idx._tfs = [z["tfs"]]
        idx._rebuild_native()
        return idx

    def _rebuild_native(self) -> None:
        if self._native is None:
            return
        from tristage_rag_tpu.native.wrappers import NativeBM25

        self._native = NativeBM25(self.k1, self.b)
        if not self._rows:
            for dl in self.doc_lens:
                self._native.add_doc(
                    np.empty(0, np.int64), np.empty(0, np.float64), dl
                )
            return
        rows = np.concatenate(self._rows)
        cols = np.concatenate(self._cols)
        tfs = np.concatenate(self._tfs)
        order = np.argsort(rows, kind="stable")
        rows, cols, tfs = rows[order], cols[order], tfs[order]
        starts = np.searchsorted(rows, np.arange(self.corpus_size))
        ends = np.searchsorted(rows, np.arange(self.corpus_size), side="right")
        for d in range(self.corpus_size):
            s, e = starts[d], ends[d]
            self._native.add_doc(cols[s:e], tfs[s:e], self.doc_lens[d])

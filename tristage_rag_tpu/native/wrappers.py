"""ctypes wrappers over the native library (tokenizer + BM25)."""

from __future__ import annotations

import ctypes

import numpy as np

from tristage_rag_tpu.native import load_library


class NativeWordPiece:
    """Greedy longest-match WordPiece over a fixed vocab (C++)."""

    def __init__(self, vocab: dict[str, int], unk_id: int):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        parts = []
        for token, tid in vocab.items():
            tb = token.encode("utf-8")
            parts.append(
                np.uint32(tid).tobytes() + np.uint32(len(tb)).tobytes() + tb
            )
        blob = b"".join(parts)
        self._handle = self._lib.wp_create(blob, len(blob), unk_id)
        if not self._handle:
            raise RuntimeError("wp_create failed")

    def encode(self, text: str) -> list[int]:
        # Per-call buffer: ctypes releases the GIL during wp_encode, so
        # a shared buffer would corrupt concurrent encodes.
        tb = text.encode("utf-8")
        buf = (ctypes.c_int32 * 4096)()
        n = self._lib.wp_encode(self._handle, tb, len(tb), buf, 4096)
        if n > 4096:  # rare: resize and retry
            buf = (ctypes.c_int32 * int(n))()
            n = self._lib.wp_encode(self._handle, tb, len(tb), buf, n)
        return list(buf[: int(n)])

    def __del__(self):
        lib = getattr(self, "_lib", None)
        handle = getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.wp_destroy(handle)


class NativeBM25:
    """Incremental postings + Okapi scoring (C++)."""

    def __init__(self, k1: float, b: float):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._handle = self._lib.bm25_create(k1, b)

    def add_doc(self, term_ids: np.ndarray, term_freqs: np.ndarray, doc_len: int):
        term_ids = np.ascontiguousarray(term_ids, dtype=np.int64)
        term_freqs = np.ascontiguousarray(term_freqs, dtype=np.float64)
        self._lib.bm25_add_doc(
            self._handle,
            term_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            term_freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(term_ids),
            doc_len,
        )

    @property
    def num_docs(self) -> int:
        return int(self._lib.bm25_num_docs(self._handle))

    def score(self, term_ids: np.ndarray, term_counts: np.ndarray) -> np.ndarray:
        term_ids = np.ascontiguousarray(term_ids, dtype=np.int64)
        term_counts = np.ascontiguousarray(term_counts, dtype=np.float64)
        out = np.zeros(self.num_docs, dtype=np.float64)
        self._lib.bm25_score_query(
            self._handle,
            term_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            term_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(term_ids),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out

    def __del__(self):
        lib = getattr(self, "_lib", None)
        handle = getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.bm25_destroy(handle)

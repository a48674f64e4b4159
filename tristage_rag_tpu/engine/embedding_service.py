"""Shared embedding service: cached, coalesced batch encoding.

The reference ships this as dead code (src/embedding_service.py — never
imported; SURVEY.md §2.1 flags "cached batched encode" as the
capability worth keeping). Here it is live: a process-wide service over
a bi-encoder runtime with

* a SHA-256-keyed LRU embedding cache (the reference used md5 + FIFO,
  :135-150; LRU keeps hot queries resident),
* cache-merge that preserves input order and encodes only misses in one
  batch (:152-226 semantics),
* text validation (non-empty, length-capped, :126-133),
* thread-safe singleton access with double-checked locking (:27-46).
"""

from __future__ import annotations

import hashlib
import logging
import threading
from collections import OrderedDict
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class EmbeddingService:
    _instance: Optional["EmbeddingService"] = None
    _instance_lock = threading.Lock()

    def __init__(
        self,
        runtime,
        tokenizer,
        max_length: int = 512,
        batch_size: int = 64,
        cache_size: int = 1000,
        max_text_chars: int = 10_000,
    ):
        self.runtime = runtime
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self.max_text_chars = max_text_chars
        self._cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._cache_size = cache_size
        self._lock = threading.Lock()
        self.stats = {"hits": 0, "misses": 0, "encoded": 0}

    # ---- singleton -------------------------------------------------------

    @classmethod
    def get_instance(cls, factory=None) -> "EmbeddingService":
        if cls._instance is None:
            with cls._instance_lock:
                if cls._instance is None:
                    if factory is None:
                        raise RuntimeError(
                            "EmbeddingService not initialized; pass a factory"
                        )
                    cls._instance = factory()
        return cls._instance

    @classmethod
    def reset_instance(cls) -> None:
        with cls._instance_lock:
            cls._instance = None

    # ---- encoding --------------------------------------------------------

    @staticmethod
    def _key(text: str, prompt: str) -> str:
        return hashlib.sha256((prompt + "\x00" + text).encode()).hexdigest()

    def _validate(self, text: str, strict: bool = True) -> str:
        if not isinstance(text, str) or (strict and not text.strip()):
            raise ValueError("text must be a non-empty string")
        return text[: self.max_text_chars]

    def encode(
        self, texts: Sequence[str], kind: str = "document",
        strict: bool = True,
    ) -> np.ndarray:
        """[N, E] embeddings; cache hits reused, misses batch-encoded,
        output order preserved.

        ``strict=False`` accepts blank texts (encoded as their special
        tokens) and an empty list (returns [0, E]) — needed by the MTEB
        adapter, where empty corpus entries are data, not errors.
        """
        if not texts:
            return self.runtime.encode_texts(
                [], self.tokenizer, max_length=self.max_length
            )
        prompt = self.runtime.prompts.get(kind, "")
        texts = [self._validate(t, strict) for t in texts]
        keys = [self._key(t, prompt) for t in texts]
        out: list[Optional[np.ndarray]] = [None] * len(texts)
        misses: list[int] = []
        with self._lock:
            for i, k in enumerate(keys):
                if k in self._cache:
                    self._cache.move_to_end(k)
                    out[i] = self._cache[k]
                    self.stats["hits"] += 1
                else:
                    misses.append(i)
                    self.stats["misses"] += 1
        if misses:
            # de-duplicate identical miss texts within the batch
            uniq: dict[str, list[int]] = {}
            for i in misses:
                uniq.setdefault(keys[i], []).append(i)
            to_encode = [texts[idxs[0]] for idxs in uniq.values()]
            emb = self.runtime.encode_texts(
                [prompt + t for t in to_encode],
                self.tokenizer,
                max_length=self.max_length,
                batch_size=self.batch_size,
            )
            self.stats["encoded"] += len(to_encode)
            with self._lock:
                for (k, idxs), e in zip(uniq.items(), emb):
                    self._cache[k] = e
                    self._cache.move_to_end(k)
                    for i in idxs:
                        out[i] = e
                while len(self._cache) > self._cache_size:
                    self._cache.popitem(last=False)
        return np.stack(out)

    def encode_query(self, text: str) -> np.ndarray:
        return self.encode([text], kind="query")[0]

    def encode_document(self, text: str) -> np.ndarray:
        return self.encode([text], kind="document")[0]

    def similarity(self, a: np.ndarray, b: np.ndarray) -> float:
        """Cosine similarity (embeddings are unit-norm -> dot)."""
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        return float(np.dot(a, b) / denom) if denom > 0 else 0.0

    def cache_info(self) -> dict:
        with self._lock:
            return {"size": len(self._cache), "max": self._cache_size, **self.stats}

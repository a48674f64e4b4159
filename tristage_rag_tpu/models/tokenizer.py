"""Host-side tokenization with pad-to-bucket batching.

The reference leans on HF tokenizers (Rust) via transformers/ST
(SURVEY.md §2.6). Here tokenization stays on host (it is branchy,
string-shaped work), but the device contract is TPU-native: every batch
is padded to a small set of static length buckets so XLA compiles a
bounded number of shapes (SURVEY.md §7 "variable-length candidates").

Three interchangeable tokenizers:

* :class:`HashTokenizer` — deterministic, dependency-free, no assets;
  used by tests and fixtures (SURVEY.md §4: "tiny deterministic fake
  encoder ... so no model download is needed").
* :class:`WordPieceTokenizer` — self-contained BERT WordPiece (greedy
  longest-match-first) reading a ``vocab.txt``; covers MiniLM-style
  checkpoints without the Rust dependency.
* :class:`HFTokenizer` — thin wrapper over ``tokenizers``/``transformers``
  when installed and checkpoint assets exist (SentencePiece models etc.).
"""

from __future__ import annotations

import dataclasses
import re
import unicodedata
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

DEFAULT_BUCKETS = (16, 32, 64, 128, 192, 256, 384, 512)

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def pick_bucket(length: int, buckets: Sequence[int], max_len: int) -> int:
    """Smallest bucket >= length, capped at max_len."""
    length = min(length, max_len)
    for b in buckets:
        if b >= length and b <= max_len:
            return b
    return max_len


@dataclasses.dataclass
class Batch:
    """A padded token batch ready for device transfer."""

    input_ids: np.ndarray  # [B, L] int32
    attn_mask: np.ndarray  # [B, L] int32
    token_type_ids: np.ndarray  # [B, L] int32

    @property
    def seq_len(self) -> int:
        return self.input_ids.shape[1]


class BaseTokenizer:
    pad_id: int = 0
    cls_id: int = 101
    sep_id: int = 102
    vocab_size: int = 30522

    def tokenize_to_ids(self, text: str) -> list[int]:
        raise NotImplementedError

    def encode_batch(
        self,
        texts: Sequence[str],
        max_length: int,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        add_special: bool = True,
    ) -> Batch:
        """Encode texts -> one bucket-padded batch."""
        rows = []
        for t in texts:
            ids = self.tokenize_to_ids(t)
            budget = max_length - (2 if add_special else 0)
            ids = ids[: max(budget, 0)]
            if add_special:
                ids = [self.cls_id] + ids + [self.sep_id]
            rows.append(ids)
        longest = max((len(r) for r in rows), default=1)
        L = pick_bucket(max(longest, 1), buckets, max_length)
        b = len(rows)
        input_ids = np.full((b, L), self.pad_id, dtype=np.int32)
        mask = np.zeros((b, L), dtype=np.int32)
        for i, r in enumerate(rows):
            r = r[:L]
            input_ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return Batch(input_ids, mask, np.zeros_like(input_ids))

    def encode_pairs(
        self,
        pairs: Sequence[tuple[str, str]],
        max_length: int,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
    ) -> Batch:
        """Encode (query, doc) pairs as [CLS] q [SEP] d [SEP] with type ids."""
        rows = []
        for q, d in pairs:
            q_ids = self.tokenize_to_ids(q)
            d_ids = self.tokenize_to_ids(d)
            budget = max_length - 3
            # Longest-first truncation (HF default for pairs). Tie-break
            # parity verified EMPIRICALLY against BertTokenizerFast
            # (truncation="longest_first"): equal lengths pop from the
            # FIRST sequence, i.e. q pops when len(q) >= len(d).
            while len(q_ids) + len(d_ids) > budget:
                if len(q_ids) >= len(d_ids) and q_ids:
                    q_ids.pop()
                elif d_ids:
                    d_ids.pop()
                else:
                    break
            ids = [self.cls_id] + q_ids + [self.sep_id] + d_ids + [self.sep_id]
            types = [0] * (len(q_ids) + 2) + [1] * (len(d_ids) + 1)
            rows.append((ids, types))
        longest = max((len(r[0]) for r in rows), default=1)
        L = pick_bucket(max(longest, 1), buckets, max_length)
        b = len(rows)
        input_ids = np.full((b, L), self.pad_id, dtype=np.int32)
        mask = np.zeros((b, L), dtype=np.int32)
        type_ids = np.zeros((b, L), dtype=np.int32)
        for i, (ids, types) in enumerate(rows):
            ids, types = ids[:L], types[:L]
            input_ids[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
            type_ids[i, : len(types)] = types
        return Batch(input_ids, mask, type_ids)


class HashTokenizer(BaseTokenizer):
    """Deterministic hash tokenizer — no vocab assets required.

    Word tokens are FNV-1a hashed into [n_special, vocab_size). Stable
    across processes/platforms (unlike Python's ``hash``), so golden
    tests are reproducible.
    """

    def __init__(self, vocab_size: int = 30522, lowercase: bool = True):
        self.vocab_size = vocab_size
        self.lowercase = lowercase
        self.pad_id, self.cls_id, self.sep_id = 0, 1, 2
        self._n_special = 4

    @staticmethod
    def _fnv1a(s: str) -> int:
        h = 0xCBF29CE484222325
        for ch in s.encode("utf-8"):
            h ^= ch
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def tokenize_to_ids(self, text: str) -> list[int]:
        if self.lowercase:
            text = text.lower()
        span = self.vocab_size - self._n_special
        return [
            self._n_special + self._fnv1a(w) % span for w in _WORD_RE.findall(text)
        ]


class WordPieceTokenizer(BaseTokenizer):
    """Self-contained BERT WordPiece (greedy longest-match-first).

    Replaces the Rust ``tokenizers`` dependency for BERT-family
    checkpoints; reads the standard ``vocab.txt``.
    """

    def __init__(
        self,
        vocab: dict[str, int] | Path | str,
        lowercase: bool = True,
        unk_token: str = "[UNK]",
        max_chars_per_word: int = 100,
    ):
        if not isinstance(vocab, dict):
            path = Path(vocab)
            with open(path, encoding="utf-8") as f:
                vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        self.vocab = vocab
        self.lowercase = lowercase
        self.unk_id = vocab.get(unk_token, 0)
        self.pad_id = vocab.get("[PAD]", 0)
        self.cls_id = vocab.get("[CLS]", 101)
        self.sep_id = vocab.get("[SEP]", 102)
        self.vocab_size = len(vocab)
        self.max_chars = max_chars_per_word
        # Optional C++ fast path (native/tokenizer.cpp); identical ids,
        # pure-Python fallback when the toolchain is unavailable.
        self._native = None
        try:
            from tristage_rag_tpu.native.wrappers import NativeWordPiece

            self._native = NativeWordPiece(self.vocab, self.unk_id)
        except Exception:
            self._native = None

    def _basic_tokens(self, text: str) -> list[str]:
        # Single normalization definition — the native-gated path uses
        # _normalize too; duplicating the logic risked the two paths
        # drifting apart.
        return _WORD_RE.findall(self._normalize(text))

    def _wordpiece(self, word: str) -> list[int]:
        if len(word) > self.max_chars:
            return [self.unk_id]
        ids, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def _normalize(self, text: str) -> str:
        if not self.lowercase:
            return text
        text = text.lower()
        return "".join(
            c for c in unicodedata.normalize("NFD", text)
            if unicodedata.category(c) != "Mn"
        )

    def tokenize_to_ids(self, text: str) -> list[int]:
        # The C++ splitter is byte-oriented: non-ASCII text (em dashes,
        # NBSP, CJK) would split differently from the Python
        # `\w+|[^\w\s]` semantics and byte-count the max-word guard.
        # Gate the native fast path to pure-ASCII input so the two
        # implementations are id-identical by construction — indexes
        # built with and without the toolchain must agree.
        if self._native is not None:
            norm = self._normalize(text)
            if norm.isascii():
                return self._native.encode(norm)
        out: list[int] = []
        for w in self._basic_tokens(text):
            out.extend(self._wordpiece(w))
        return out


class HFTokenizer(BaseTokenizer):
    """Wrapper over a HF ``tokenizers.Tokenizer`` / transformers tokenizer."""

    def __init__(self, path: str | Path):
        from transformers import AutoTokenizer  # host-side only

        self._tok = AutoTokenizer.from_pretrained(str(path))

        def _first(*ids, default=0):
            # id 0 is a legitimate special token in several vocabs —
            # `or`-chains would skip it
            for i in ids:
                if i is not None:
                    return i
            return default

        self.pad_id = _first(self._tok.pad_token_id)
        self.cls_id = _first(self._tok.cls_token_id, self._tok.bos_token_id)
        self.sep_id = _first(self._tok.sep_token_id, self._tok.eos_token_id)
        self.vocab_size = self._tok.vocab_size

    def tokenize_to_ids(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False)


def load_tokenizer(model_path: Optional[str]) -> BaseTokenizer:
    """Best available tokenizer for a checkpoint dir (or hash fallback)."""
    if model_path:
        p = Path(model_path)
        if (p / "tokenizer.json").exists() or (p / "tokenizer_config.json").exists():
            try:
                return HFTokenizer(p)
            except Exception:
                pass
        if (p / "vocab.txt").exists():
            return WordPieceTokenizer(p / "vocab.txt")
    return HashTokenizer()

"""Host-side training data pipeline for contrastive fine-tuning.

Loads (query, positive-document) pairs from JSONL/TSV, shuffles with a
seeded RNG, tokenizes to fixed-shape batches (pad-to-bucket), and
yields device-ready arrays. Deliberately host-simple: the TPU never
sees strings, and batch shapes come from a bounded bucket set so XLA
compiles a handful of programs (same contract as inference,
models/tokenizer.py).

JSONL rows: {"query": ..., "positive": ...} (extra keys ignored;
"document"/"text" accepted as aliases for "positive").
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from tristage_rag_tpu.models.tokenizer import BaseTokenizer

logger = logging.getLogger(__name__)

_POS_KEYS = ("positive", "document", "text", "doc")


def load_pairs(path: str | Path) -> list[tuple[str, str]]:
    """Read (query, positive) pairs from .jsonl or .tsv."""
    path = Path(path)
    pairs: list[tuple[str, str]] = []
    if path.suffix.lower() in (".tsv", ".txt"):
        for line in path.read_text(encoding="utf-8").splitlines():
            if "\t" in line:
                q, d = line.split("\t", 1)
                if q.strip() and d.strip():
                    pairs.append((q.strip(), d.strip()))
        return pairs
    for line in path.read_text(encoding="utf-8").splitlines():
        if not line.strip():
            continue
        row = json.loads(line)
        q = row.get("query") or row.get("q")
        pos = next((row[k] for k in _POS_KEYS if row.get(k)), None)
        if q and pos:
            pairs.append((str(q), str(pos)))
    return pairs


@dataclasses.dataclass
class PairBatch:
    q_ids: np.ndarray
    q_mask: np.ndarray
    d_ids: np.ndarray
    d_mask: np.ndarray

    @property
    def size(self) -> int:
        return self.q_ids.shape[0]


@dataclasses.dataclass
class CrossPairBatch:
    """Joint (query, doc) pair rows for cross-encoder training."""

    ids: np.ndarray  # [B, L] int32
    mask: np.ndarray  # [B, L] int32
    types: np.ndarray  # [B, L] int32 segment ids
    labels: np.ndarray  # [B, 1] f32 (2-D for uniform dp sharding)


def cross_pair_batch(
    tokenizer: BaseTokenizer,
    queries: Sequence[str],
    positives: Sequence[str],
    max_length: int,
    negatives: Sequence[str] | None = None,
) -> CrossPairBatch:
    """Build a cross-encoder BCE batch from B (query, positive) pairs:
    B label-1 rows (q_i, d_i) plus B label-0 rows — explicit
    ``negatives`` when given (e.g. BM25-mined hard negatives), else
    (q_i, d_{i+1 mod B}) shifted in-batch negatives. Rows tokenize
    through the SAME pair encoding serving uses (encode_pairs:
    [CLS] q [SEP] d [SEP] with types + longest-first truncation)."""
    b = len(queries)
    if negatives is None:
        negatives = [positives[(i + 1) % b] for i in range(b)]
    pairs = [(queries[i], positives[i]) for i in range(b)] + [
        (queries[i], negatives[i]) for i in range(b)
    ]
    tb = tokenizer.encode_pairs(pairs, max_length)
    labels = np.zeros((2 * b, 1), np.float32)
    labels[:b] = 1.0
    return CrossPairBatch(tb.input_ids, tb.attn_mask, tb.token_type_ids, labels)


class PairDataLoader:
    """Shuffled, epoch-aware batch iterator over text pairs.

    Batches are always exactly ``batch_size`` (the tail is dropped —
    in-batch-negative InfoNCE needs a full square logit matrix and
    static shapes keep XLA happy).
    """

    def __init__(
        self,
        pairs: Sequence[tuple[str, str]],
        tokenizer: BaseTokenizer,
        batch_size: int = 32,
        query_max_len: int = 64,
        doc_max_len: int = 256,
        seed: int = 0,
    ):
        if len(pairs) < batch_size:
            raise ValueError(
                f"need at least batch_size={batch_size} pairs, got {len(pairs)}"
            )
        self.pairs = list(pairs)
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.query_max_len = query_max_len
        self.doc_max_len = doc_max_len
        self._rng = np.random.default_rng(seed)
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.pairs) // self.batch_size

    def epoch_batches(self) -> Iterator[PairBatch]:
        order = self._rng.permutation(len(self.pairs))
        for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
            idx = order[start : start + self.batch_size]
            qs = [self.pairs[i][0] for i in idx]
            ds = [self.pairs[i][1] for i in idx]
            qb = self.tokenizer.encode_batch(qs, self.query_max_len)
            db = self.tokenizer.encode_batch(ds, self.doc_max_len)
            yield PairBatch(qb.input_ids, qb.attn_mask, db.input_ids, db.attn_mask)
        self.epoch += 1

    def __iter__(self) -> Iterator[PairBatch]:
        """Infinite stream across epochs (reshuffled each epoch)."""
        while True:
            yield from self.epoch_batches()

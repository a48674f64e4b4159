"""Device-resident stage-3 document token-id cache.

The cross-encoder's host cost is tokenizing ``top_k`` (query, doc)
pairs per query. Documents don't change between queries, so their
token ids are cached ON DEVICE at indexing time, aligned with
DenseIndex row ids; at query time the fused searcher gathers candidate
rows by id and splices the (host-tokenized) query in front of them
inside the same XLA program (engine/fused.py) — no per-query document
tokenization, no host->device candidate traffic.

Rows are stored WITH their trailing [SEP] so a gathered row is exactly
the ``d [SEP]`` tail of the reference's ``[CLS] q [SEP] d [SEP]`` pair
encoding (src/stage3_reranker.py:139-160). Memory is 4 bytes/token:
~1 KB per doc at 224 tokens, 1 GB per million docs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MIN_CAPACITY = 256


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter(buf, len_buf, rows, lens, ids):
    buf = buf.at[ids].set(rows)
    len_buf = len_buf.at[ids].set(lens)
    return buf, len_buf


class DocTokenCache:
    """[capacity, seq_len] i32 token ids + [capacity] i32 lengths."""

    def __init__(
        self,
        seq_len: int,
        sep_id: int,
        max_docs: int = 2_000_000,
        mesh=None,
        data_axis: str = "data",
    ):
        self.seq_len = seq_len
        self.sep_id = sep_id
        # Row-sharded over the mesh's data axis (see
        # index/token_cache.py) so the fused sharded funnel can gather
        # stage-3 rows shard-locally and psum-assemble the pair batch.
        self.mesh = mesh
        self.data_axis = data_axis
        self._shards = 1 if mesh is None else mesh.shape[data_axis]
        self.max_docs = max_docs
        self.capacity = 0
        # Longest stored row (host-side): lets the fused searcher pick
        # a pair-width bucket >= every cached doc, shrinking the
        # cross-encoder's static pair length for short-doc corpora
        # without ever truncating (engine/fused.py::_d3_budget).
        self.max_len = 0
        self._buf: Optional[jax.Array] = None
        self._len: Optional[jax.Array] = None
        self._present: set[int] = set()

    def __contains__(self, doc_id: int) -> bool:
        return doc_id in self._present

    @property
    def size(self) -> int:
        return len(self._present)

    def state(self) -> tuple[jax.Array, jax.Array]:
        """(token buffer [cap, L] i32, lengths [cap] i32) device arrays."""
        return self._buf, self._len

    def _ensure_capacity(self, max_id: int) -> bool:
        from tristage_rag_tpu.index.token_cache import grown_capacity

        needed = max_id + 1
        cap = grown_capacity(
            self.capacity, needed, self.max_docs, self._shards
        )
        if cap is None:
            return False
        if cap == self.capacity:
            return True
        new_buf = self._zeros((cap, self.seq_len), jnp.int32)
        new_len = self._zeros((cap,), jnp.int32)
        if self._buf is not None and self.capacity:
            new_buf = new_buf.at[: self.capacity].set(self._buf)
            new_len = new_len.at[: self.capacity].set(self._len)
        self._buf, self._len = new_buf, new_len
        self.capacity = cap
        return True

    def _zeros(self, shape, dtype):
        z = jnp.zeros(shape, dtype=dtype)
        if self.mesh is None:
            return z
        spec = P(self.data_axis, *([None] * (len(shape) - 1)))
        return jax.device_put(z, NamedSharding(self.mesh, spec))

    def reserve(self, max_id: int) -> bool:
        """Pre-size for ids up to ``max_id`` (see
        index/token_cache.py::reserve — avoids mid-fill growth
        recompiles of the scatter jit)."""
        return self._ensure_capacity(int(max_id))

    def add(self, doc_ids, documents, tokenizer) -> int:
        """Tokenize ``documents`` (truncated to seq_len - 1 tokens, then
        ``[SEP]`` appended) and store at rows ``doc_ids``. Returns how
        many were stored (0 if over the cap)."""
        ids = np.asarray(list(doc_ids), dtype=np.int32)
        if ids.size == 0:
            return 0
        if not self._ensure_capacity(int(ids.max())):
            return 0
        rows = np.zeros((ids.size, self.seq_len), dtype=np.int32)
        lens = np.zeros((ids.size,), dtype=np.int32)
        budget = self.seq_len - 1
        for r, text in enumerate(documents):
            tok = tokenizer.tokenize_to_ids(text)[:budget]
            tok.append(self.sep_id)
            rows[r, : len(tok)] = tok
            lens[r] = len(tok)
        self._buf, self._len = _scatter(
            self._buf, self._len, jnp.asarray(rows), jnp.asarray(lens),
            jnp.asarray(ids),
        )
        self._present.update(int(i) for i in ids)
        self.max_len = max(self.max_len, int(lens.max()))
        return int(ids.size)

    def covers_count(self, count: int) -> bool:
        """True when every row id in [0, count) is cached."""
        return len(self._present) >= count and count <= self.capacity

    # ---- persistence (npz + JSON meta; never pickle) -----------------------

    def save(self, path) -> None:
        import json

        from tristage_rag_tpu.index.token_cache import _atomic_savez

        meta = dict(
            kind="doc_tokens", seq_len=self.seq_len, sep_id=self.sep_id,
            capacity=self.capacity, max_len=self.max_len,
        )
        _atomic_savez(
            path,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            buf=np.asarray(jax.device_get(self._buf)),
            lens=np.asarray(jax.device_get(self._len)),
            present=np.asarray(sorted(self._present), dtype=np.int64),
        )

    def load(self, path) -> bool:
        """Restore; False on tokenizer/shape mismatch (caller refills)."""
        import json

        try:
            z = np.load(path)
            meta = json.loads(bytes(z["meta"]).decode())
        except Exception:
            return False
        if (
            meta.get("kind") != "doc_tokens"
            or meta["seq_len"] != self.seq_len
            or meta["sep_id"] != self.sep_id
        ):
            return False
        cap = int(meta["capacity"])
        if cap % (self._shards * 8) and self._shards > 1:
            return False
        self.capacity = cap
        self.max_len = int(meta["max_len"])
        self._buf = self._place(jnp.asarray(z["buf"], jnp.int32))
        self._len = self._place(jnp.asarray(z["lens"], jnp.int32))
        self._present = set(int(i) for i in z["present"])
        return True

    def _place(self, z):
        if self.mesh is None:
            return jax.device_put(z)
        spec = P(self.data_axis, *([None] * (z.ndim - 1)))
        return jax.device_put(z, NamedSharding(self.mesh, spec))

    def clear(self) -> None:
        self._present = set()
        self.max_len = 0
        if self._len is not None:
            self._len = jnp.zeros_like(self._len)

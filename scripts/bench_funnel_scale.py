"""Fused-funnel device time at corpus scale: scan vs clustered stage-1,
and the stage-2 gather-width bucket (_d2_budget) A/B.

Builds ONE pipeline (one indexing pass — at 100k docs the fill is the
dominant cost) and then re-measures the SAME fused program under each
variant, flipping knobs that only re-key the jit:

* scan            — the default exact/approx stage-1 (impl resolved by
                    corpus size, as shipped);
* clustered@P     — the IVF-equivalent probe inside the funnel
                    (TRISTAGE_SEARCH_IMPL env override; n_probe sweep);
* scan-full-d2    — control with DeviceTokenCache.max_len pinned to the
                    full seq_len, i.e. the pre-_d2_budget gather width.

Rankings: every variant reports top-k overlap of its FINAL (stage-3)
results vs the scan funnel — the end-to-end recall cost of probing,
which is the number a funnel user actually trades against latency.

Run (TPU):
  PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/bench_funnel_scale.py \
      --docs 100000 --probes 32 64 128
CPU smoke: --tiny --docs 512 --block-size 32 --probes 4 8 (tiny models,
recall-only value; the default 1024-row blocks need >=4096 docs to
clear the clustering floor).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--width", type=int, default=100)
    ap.add_argument("--block-size", type=int, default=1024)
    ap.add_argument("--probes", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--queries", type=int, default=16,
                    help="distinct queries for the overlap check")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--index-int8", action="store_true",
                    help="int8 dense index (halves the stage-1 corpus "
                         "HBM; the scale profile's setting)")
    ap.add_argument("--cache-int8", action="store_true",
                    help="int8 stage-2 token cache — the capacity knob "
                         "that fits >100k-doc corpora in one chip's HBM")
    ap.add_argument("--s2-seq", type=int, default=192,
                    help="stage-2 token-cache window; at 500k docs the "
                         "192-token int8 cache (12.3 GB) OOMs at "
                         "search-compile time on one 16 GB chip — 128 "
                         "fits (8.2 GB) and stores identical content "
                         "when docs are shorter than the window")
    ap.add_argument("--hot-window", type=int, default=0,
                    help="two-tier stage-2 cache (TieredTokenCache): "
                         "every doc pays for this many tokens, only "
                         "docs exceeding it occupy a tail slot to "
                         "--s2-seq. The one-chip answer to the 192-"
                         "window 500k OOM when the long-doc share is "
                         "below ~0.9 (VERDICT r4 weak-8)")
    ap.add_argument("--long-frac", type=float, default=1.0,
                    help="fraction of docs generated LONG (~160 "
                         "tokens, crossing a 128 hot window); the rest "
                         "stay ~60 tokens — sets the tail occupancy "
                         "the tiered cache's saving scales with")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax  # noqa: F811

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    if args.tiny:
        models = dict(stage1_model="tiny-gemma",
                      stage2_model="tiny-modernbert",
                      stage3_model="tiny-bert")
    else:
        models = dict(stage1_model="embeddinggemma-300m",
                      stage2_model="gte-moderncolbert",
                      stage3_model="minilm-l6-cross")

    docs = []
    for i in range(args.docs):
        # rep 30 ≈ 130 words ≈ 160 tokens — safely past a 128 hot
        # window; rep 4 ≈ 26 words ≈ 35 tokens — safely inside it
        rep = 30 if (i / max(args.docs, 1)) < args.long_frac else 4
        docs.append(
            f"doc {i}: retrieval kernel fusion latency topic {i % 7} "
            + "memory bandwidth index shard " * rep
        )
    queries = [f"retrieval kernel latency topic {i % 7} shard {i}"
               for i in range(args.queries)]

    cfg = PipelineConfig(
        stage1_top_k=500, stage2_top_k=args.width, stage3_top_k=20,
        stage2_cache_doc_embeddings=True, enable_fused_search=True,
        mesh_data_parallel=1,
        index_cluster_block_size=args.block_size,
        # the fused path needs the token cache covering EVERY doc —
        # the default 100k cap would silently fall back to the staged
        # path at larger corpora (and fail the ready() assert below)
        stage2_cache_max_docs=max(args.docs, 100_000),
        stage2_cache_int8=args.cache_int8,
        stage2_max_seq_length=args.s2_seq,
        stage2_cache_hot_window=args.hot_window,
        index_dtype="int8" if args.index_int8 else "bfloat16",
        **models,
    )
    p = RetrievalPipeline(cfg)
    print(f"indexing {args.docs} docs ...", flush=True)
    p.add_documents(docs)
    assert p._fused is not None

    def measure(tag):
        for _ in range(2):
            p.search(queries[0], top_k=5)  # warm/compile outside clock
        assert p._fused.ready()
        probe = p._fused.device_time_probe(queries[0], iters=args.iters)
        ranks = [
            tuple(r["doc_id"] for r in
                  p.search(q, top_k=args.top_k)["results"])
            for q in queries
        ]
        return probe["per_query_ms"], ranks

    def overlap(a, b):
        return sum(
            len(set(x) & set(y)) / max(len(y), 1) for x, y in zip(a, b)
        ) / len(b)

    rows = []

    def add_row(name, ms, ov):
        # print as rows land: a later-leg crash (e.g. clustered build
        # OOM at the HBM envelope) must not lose earlier measurements
        rows.append((name, ms, ov))
        print(f"ROW {name}: {ms:.2f} ms/q overlap@{args.top_k} {ov:.3f}",
              flush=True)

    ms, base_ranks = measure("scan")
    impl = p.stage1.index._impl()
    add_row(f"scan ({impl})", ms, 1.0)

    # control: pre-_d2_budget gather width (cache.max_len -> full)
    cache = p.stage2._cache
    if args.hot_window and cache is not None:
        print(f"tiered cache: {cache.tail_docs}/{cache.size} docs "
              f"occupy a tail slot (occupancy "
              f"{cache.tail_docs / max(cache.size, 1):.2f})", flush=True)
    if (
        cache is not None and 0 < cache.max_len < cache.seq_len
        and not isinstance(getattr(type(cache), "max_len", None), property)
    ):
        saved = cache.max_len
        cache.max_len = cache.seq_len
        ms_full, ranks_full = measure("scan-full-d2")
        add_row("scan-full-d2 (control)", ms_full,
                overlap(ranks_full, base_ranks))
        cache.max_len = saved
    else:
        print("d2 control skipped: corpus fills the stage-2 window",
              flush=True)

    os.environ["TRISTAGE_SEARCH_IMPL"] = "clustered"
    try:
        idx = p.stage1.index
        for n_probe in args.probes:
            idx.cluster_n_probe = n_probe
            try:
                st = idx.fused_cluster_state(500)
            except Exception as e:
                # building the clustered view needs a SECOND device
                # copy of the corpus (pack_blocks) + k-means transients
                # — at the full-cache HBM envelope (e.g. 500k docs on
                # one 16 GB chip) there is no headroom and the build
                # OOMs; record that instead of losing the scan rows
                print(f"clustered build failed at this HBM envelope "
                      f"({type(e).__name__}); skipping clustered legs",
                      flush=True)
                break
            if st is None:
                print(f"clustered@{n_probe}: ineligible "
                      f"(corpus below the block floor?)", flush=True)
                continue
            ms_c, ranks_c = measure(f"clustered@{n_probe}")
            nb = st["row_ids"].shape[0]
            add_row(
                f"clustered n_probe={st['n_probe']}/{nb} blocks",
                ms_c, overlap(ranks_c, base_ranks),
            )
    finally:
        del os.environ["TRISTAGE_SEARCH_IMPL"]

    print(f"\nfused funnel at {args.docs} docs, width {args.width} "
          f"(device ms/query via chained-dispatch probe; overlap@"
          f"{args.top_k} of final results vs scan):")
    for tag, ms, ov in rows:
        print(f"  {tag:40s} {ms:8.2f} ms/q   overlap {ov:.3f}", flush=True)


if __name__ == "__main__":
    main()

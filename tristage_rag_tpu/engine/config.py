"""Pipeline configuration: dataclasses + YAML round-trip.

Mirrors the reference's layered config surface (SURVEY.md §5.6):
flat `PipelineConfig` knobs (src/retrieval_pipeline.py:15-87), per-stage
configs (src/stage{1,2,3}_*.py), YAML loading of nested
``pipeline.stageN.*`` keys with per-key defaults
(src/retrieval_pipeline.py:162-221) and ``export_config`` round-trip
(:621-634). TPU-specific additions: compute dtype, mesh axis sizes.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import yaml


@dataclasses.dataclass
class PipelineConfig:
    # Stage 1
    stage1_model: str = "google/embeddinggemma-300m"
    stage1_top_k: int = 500
    stage1_batch_size: int = 32
    stage1_max_text_length: int = 512
    stage1_enable_bm25: bool = True
    stage1_bm25_top_k: int = 300
    stage1_fusion_method: str = "rrf"  # "rrf" | "weighted"
    # ST prompt application (PARITY.md "Deliberate divergences"):
    # "auto" prepends the checkpoint's query/document prompts (the
    # model-card-recommended encode_query/encode_document behavior);
    # "st-default" mimics the reference's plain model.encode(texts) —
    # only a configured default_prompt_name prompt, usually none
    # (src/stage1_retriever.py:237-254 never passes prompt_name);
    # "none" disables prompts entirely.
    stage1_prompt_mode: str = "auto"  # "auto" | "st-default" | "none"
    stage1_rrf_k: int = 60
    stage1_dense_weight: float = 0.7
    stage1_bm25_weight: float = 0.3
    # int8 x int8 MXU matmuls for the bi-encoder (same knob semantics
    # as stage3_act_int8: False | "pallas" | "static-pallas"; the
    # plain-XLA modes were removed — see stage3_act_int8). Speeds the
    # indexing-time corpus encode; queries and docs encode through
    # the same quantized forward so similarities stay consistent.
    # Embedding shift ~1e-2 — measure recall before enabling at scale
    # (scripts/bench_indexing.py --act-int8 pallas).
    stage1_act_int8: bool | str = False
    # Weight-only per-channel int8 for the bi-encoder (same mechanics
    # as stage3_weights_int8). The serving funnel's stage-1 query
    # encode is batch-1 and weight-HBM-bound — halving the weight read
    # is a direct latency lever there (unlike compute-bound stage-3,
    # where it measured neutral). Docs and queries encode through the
    # same quantized forward, so similarities compare like with like;
    # rankings on unit-norm embeddings shift within quantization noise
    # (tests/test_int8_weights.py).
    stage1_weights_int8: bool = False
    # bf16 whole-block fused MLP (ops/pallas_qdense.py::fused_mlp_bf16)
    # when act_int8 is off: gate/up/act/mul/down in one Pallas kernel,
    # keeping the [M, mlp_dim] intermediate in VMEM. "auto" (default)
    # = on for accelerator backends, module path on CPU (interpret
    # mode would crawl); measured -13% funnel device time / +15-19%
    # indexing, quality-neutral (BENCH_NOTES round-3). Numerics
    # slightly MORE precise than the module path (f32 epilogue).
    stage1_fused_mlp: bool | str = "auto"
    # Flash attention for padding-only layers (JAX's Pallas TPU
    # kernel): [B,h,L,L] logits/probs never materialize to HBM.
    # Opt-in; windowed/causal/softcapped layers keep the dense
    # einsum path (models/config.py::flash_attention).
    stage1_flash_attention: bool = False
    # Whole-sequence fused attention for small (non-lane-aligned)
    # buckets (ops/pallas_attention.py): covers the lengths flash
    # cannot, e.g. the 96-token stage-3 pair bucket. Opt-in (or
    # "auto" = accelerator-only): the session-10 trace measured
    # the per-(batch,head) kernel LOSING at stage-3 shapes via
    # 4-D layout padding; default off until the whole-block
    # variant beats the dense path on chip.
    stage1_fused_attention: bool | str = False

    # Stage 2
    stage2_model: str = "lightonai/GTE-ModernColBERT-v1"
    stage2_top_k: int = 100
    stage2_batch_size: int = 16
    stage2_max_seq_length: int = 192
    stage2_scoring_method: str = "maxsim"  # "maxsim" | "colbert"
    # MaxSim implementation for the staged rescorer: "xla" einsums the
    # full [C, Lq, Ld] similarity tensor through HBM; "pallas" streams
    # candidate blocks through VMEM (ops/pallas_maxsim.py — the
    # similarities never leave the chip; the win grows with candidate
    # count and token lengths). Scores identical to 1e-4.
    stage2_maxsim_impl: str = "xla"  # "xla" | "pallas"
    # True (default) applies the checkpoint's ColBERT projection (the
    # PyLate 1_Dense head — the checkpoint's intended use); False scores
    # MaxSim on raw last-hidden-state tokens, byte-faithful to the
    # reference (src/stage2_rescorer.py:156-165). See PARITY.md.
    stage2_use_projection: bool = True
    # int8 x int8 MXU matmuls for the ColBERT encoder (same knob
    # semantics as stage3_act_int8). Speeds the indexing-time token
    # cache fill; doc and query tokens then encode identically, so
    # MaxSim compares like with like. Scores shift ~1e-2.
    stage2_act_int8: bool | str = False
    # Weight-only per-channel int8 for the ColBERT encoder (see
    # stage1_weights_int8 — the batch-1 query-encode bandwidth lever).
    # The persisted stage-2 device cache keys on this flag: token
    # embeddings encoded under one weight mode never serve the other.
    stage2_weights_int8: bool = False
    # bf16 fused MLP for the ColBERT encoder (see stage1_fused_mlp;
    # "auto" = accelerator-only).
    stage2_fused_mlp: bool | str = "auto"
    # Flash attention for the ColBERT encoder (see stage1). NOTE: the
    # default stage2_max_seq_length (192) is not lane-aligned, so this
    # only engages on the 128-token bucket (or set max_seq_length 256).
    stage2_flash_attention: bool = False
    # Whole-sequence fused attention for small (non-lane-aligned)
    # buckets (ops/pallas_attention.py): covers the lengths flash
    # cannot, e.g. the 96-token stage-3 pair bucket. Opt-in (or
    # "auto" = accelerator-only): the session-10 trace measured
    # the per-(batch,head) kernel LOSING at stage-3 shapes via
    # 4-D layout padding; default off until the whole-block
    # variant beats the dense path on chip.
    stage2_fused_attention: bool | str = False
    stage2_cache_doc_embeddings: bool = False  # TPU-native win (SURVEY §7)
    # HBM budget for the device-resident token cache (49 KB/doc at
    # 192x128 bf16); docs beyond the cap re-encode per query.
    stage2_cache_max_docs: int = 100_000
    # Store the token cache as symmetric per-token int8 (+f32 scale
    # row): halves HBM per doc, ~0.4% score error on unit-norm ColBERT
    # tokens (same class as DenseIndex int8 mode). Both staged and
    # fused paths dequantize through the same gather.
    stage2_cache_int8: bool = False
    # Two-tier cache (index/token_cache.py::TieredTokenCache): every
    # doc pays for the first `hot_window` tokens; only docs that
    # actually exceed it occupy a tail slot covering the rest of
    # stage2_max_seq_length. 0 = flat single-tier cache. The one-chip
    # answer to the 192-token-window 500k-doc OOM (the flat int8 cache
    # is 12.3 GB there; two-tier costs 8.2 GB + tail-share): scores
    # are identical to the flat cache at the same total window.
    # Single-device only — multi-chip capacity scales by sharding the
    # flat cache over the mesh instead.
    stage2_cache_hot_window: int = 0

    # Stage 3
    stage3_model: str = "cross-encoder/ms-marco-MiniLM-L6-v2"
    stage3_top_k: int = 20
    stage3_batch_size: int = 32
    stage3_max_length: int = 256
    stage3_activation: str = "sigmoid"  # "sigmoid" | "softmax"
    # Weight-only per-channel int8 for the cross-encoder (halves its
    # weight HBM; dequant runs in-jit). Quality/latency measured in
    # scripts/bench_funnel_width.py --int8-stage3.
    stage3_weights_int8: bool = False
    # int8 x int8 MXU matmuls for the cross-encoder's dense projections
    # through the fused quant/dot/dequant Pallas kernel
    # (ops/pallas_qdense.py — one VMEM pass, no HBM materialization of
    # int8 codes / int32 accumulator). Values: False | "pallas"
    # (dynamic per-row scales computed in VMEM) | "static-pallas"
    # (per-tensor scales abs-max-calibrated on the first real batch).
    # The plain-XLA modes (True/"dynamic"/"static") were REMOVED after
    # measuring as in-context losses at every level (BENCH_NOTES
    # round-3: dots 1.2-2.9x faster isolated, funnel 10-25% slower) —
    # a config carrying them fails loudly with this pointer. Scores
    # shift ~1e-2; rankings verified on tiny stacks
    # (tests/test_int8_act.py, test_int8_act_static.py,
    # test_pallas_qdense.py).
    stage3_act_int8: bool | str = False
    # bf16 fused MLP for the cross-encoder (see stage1_fused_mlp;
    # "auto" = accelerator-only).
    stage3_fused_mlp: bool | str = "auto"
    # Flash attention for the cross-encoder (see stage1) — the
    # biggest attention-HBM case: 100 pairs x 256 tokens x 12
    # heads of logits+probs per layer.
    stage3_flash_attention: bool = False
    # Whole-sequence fused attention for small (non-lane-aligned)
    # buckets (ops/pallas_attention.py): covers the lengths flash
    # cannot, e.g. the 96-token stage-3 pair bucket. Opt-in (or
    # "auto" = accelerator-only): the session-10 trace measured
    # the per-(batch,head) kernel LOSING at stage-3 shapes via
    # 4-D layout padding; default off until the whole-block
    # variant beats the dense path on chip.
    stage3_fused_attention: bool | str = False
    stage3_normalize_scores: bool = True
    # Fused-path pair layout: queries are capped at this many tokens
    # (incl. [CLS]/[SEP]) and docs at stage3_max_length - reserve, so
    # [CLS] q [SEP] d [SEP] rows splice on device with static shapes
    # (engine/fused.py). The staged path keeps exact HF longest-first
    # truncation.
    stage3_query_reserve: int = 32

    # General
    model_dir: str = "./models"  # checkpoint root (HF layout per model)
    index_dir: str = "./tpu_index"
    log_level: str = "INFO"
    log_file: Optional[str] = None
    enable_timing: bool = True
    save_intermediate_results: bool = False

    # TPU-native knobs (no reference equivalent)
    compute_dtype: str = "bfloat16"
    index_dtype: str = "float32"
    # Stage-1 dense search path: "auto" picks exact below ~100k rows
    # and approx_max_k above (the reference's flat-vs-IVF switch,
    # src/stage1_retriever.py:274-291); "exact"/"approx"/"pallas"
    # force one. recall_target feeds approx_max_k. "pallas-bank" runs
    # the transposed bank kernel at bank_top=2 — ~0.99 SELECTION
    # recall at 2.4-2.7x the exact-merge kernel's QPS (BENCH_NOTES
    # round 5): the high-recall high-throughput kernel point.
    index_search_impl: str = "auto"
    index_recall_target: float = 0.95
    # Clustered (IVF-equivalent) stage-1: index_search_impl "clustered"
    # k-means-orders the corpus into fixed blocks and scans only the
    # n_probe best blocks per query tile (the reference's IVF nlist/
    # nprobe, src/stage1_retriever.py:264-273). block_size is the scan
    # granule; n_probe the recall knob (probe fraction ~= n_probe *
    # block_size / corpus); tile_q queries share one probe set. On a
    # mesh the blocked view shards over blocks and each device probes
    # ceil(n_probe / n_shards) locally (distributed IVF, all-gather
    # merge).
    index_cluster_block_size: int = 1024
    index_cluster_n_probe: int = 32
    index_cluster_tile_q: int = 8
    index_cluster_iters: int = 10
    index_cluster_factor: int = 4
    # "pallas" streams only the selected blocks through VMEM (scalar-
    # prefetch gather-matmul, one HBM read of the probed pool); "xla"
    # gathers then dots (3x the pool traffic). "auto" (default) picks
    # pallas on accelerators and xla on CPU — the measured TPU sweep
    # (BENCH_NOTES, 1M x 384) has the kernel winning every batch/
    # recall point, 21-33x the XLA probe path. tile_q must be a
    # multiple of 8 (32 for int8) for the kernel; otherwise it
    # degrades to xla.
    index_cluster_kernel: str = "auto"
    mesh_data_parallel: int = 0  # 0 = use all local devices on one axis
    # Multi-slice/DCN (SURVEY.md §5.8): >1 builds a 2-D ("dcn", "data")
    # mesh — corpus/caches shard over "data" (ICI, all engine
    # collectives), query batches shard over "dcn" (slice-parallel
    # serving; no cross-slice collectives in the funnel). With
    # mesh_dcn_parallel=G, mesh_data_parallel is devices PER SLICE.
    mesh_dcn_parallel: int = 1
    seed: int = 0
    # Single-dispatch tri-stage search (engine/fused.py). Activates when
    # its device caches are populated (requires
    # stage2_cache_doc_embeddings on a single device); the pipeline
    # falls back to the staged path otherwise.
    enable_fused_search: bool = True
    # Serving result cache: repeated (query, top_k) hits skip the whole
    # funnel (the fused path's query encode lives inside its single XLA
    # dispatch, so only result-level caching can help serving).
    # Invalidated on any index mutation. Measured guidance (BENCH_NOTES
    # round 4, Zipf-1.5 off/on/off A/B/A under the pipelined server,
    # 37% hit rate): hits cut p50/p95 ~35% but cost ~38% QPS (lock +
    # invalidation churn serializes the batcher) — a LATENCY knob, not
    # a throughput knob. Default off.
    enable_result_cache: bool = False
    result_cache_size: int = 1024
    # Persist the stage-2 token-embedding cache + stage-3 token-id
    # cache alongside the index (npz + JSON meta, never pickle):
    # load_index then restores them instead of re-encoding the whole
    # corpus — the dominant restart cost (~1 chip-minute per 50k docs
    # at measured fill rates). Any mismatch (model, doc count, dtype,
    # int8 mode, mesh split) falls back to the re-encode path.
    persist_device_caches: bool = False
    # Pipelined serving (serve/batcher.py + pipeline.batch_search_
    # dispatch): the MCP micro-batcher splits each batch into dispatch
    # (worker thread) and fetch (dedicated fetch thread), so the NEXT
    # batch's host prep + device dispatch overlaps this batch's device
    # time and device->host round-trip (~30 ms over the relay tunnel).
    # Ordering guarantees are unchanged; in-flight batches reflect the
    # index as of their dispatch, and a back-to-back identical query
    # may miss the result cache (its dispatch can precede the first
    # query's fetch) — correctness is unaffected.
    serve_pipelined: bool = False
    # Persistent XLA compilation cache (jax_compilation_cache_dir):
    # compiled programs — including remote-compiled Mosaic kernels —
    # are written here and reused across process restarts, the other
    # half of restart cost next to persist_device_caches (a cold fused
    # funnel pays tens of seconds of XLA compiles locally and minutes
    # of remote Mosaic compiles over tunneled dev TPUs). The setting is
    # process-global (jax.config): the first pipeline to set it wins
    # for the process lifetime. None = off.
    compilation_cache_dir: Optional[str] = None

    # ---- YAML ------------------------------------------------------------

    _YAML_MAP = {
        "stage1": [
            ("model", "stage1_model"),
            ("top_k", "stage1_top_k"),
            ("batch_size", "stage1_batch_size"),
            ("max_text_length", "stage1_max_text_length"),
            ("enable_bm25", "stage1_enable_bm25"),
            ("bm25_top_k", "stage1_bm25_top_k"),
            ("fusion_method", "stage1_fusion_method"),
            ("prompt_mode", "stage1_prompt_mode"),
            ("rrf_k", "stage1_rrf_k"),
            ("dense_weight", "stage1_dense_weight"),
            ("bm25_weight", "stage1_bm25_weight"),
            ("act_int8", "stage1_act_int8"),
            ("weights_int8", "stage1_weights_int8"),
            ("fused_mlp", "stage1_fused_mlp"),
            ("flash_attention", "stage1_flash_attention"),
        ],
        "stage2": [
            ("model", "stage2_model"),
            ("top_k", "stage2_top_k"),
            ("batch_size", "stage2_batch_size"),
            ("max_seq_length", "stage2_max_seq_length"),
            ("scoring_method", "stage2_scoring_method"),
            ("maxsim_impl", "stage2_maxsim_impl"),
            ("use_projection", "stage2_use_projection"),
            ("cache_doc_embeddings", "stage2_cache_doc_embeddings"),
            ("cache_max_docs", "stage2_cache_max_docs"),
            ("cache_int8", "stage2_cache_int8"),
            ("cache_hot_window", "stage2_cache_hot_window"),
            ("act_int8", "stage2_act_int8"),
            ("weights_int8", "stage2_weights_int8"),
            ("fused_mlp", "stage2_fused_mlp"),
            ("flash_attention", "stage2_flash_attention"),
        ],
        "stage3": [
            ("model", "stage3_model"),
            ("top_k", "stage3_top_k"),
            ("batch_size", "stage3_batch_size"),
            ("max_length", "stage3_max_length"),
            ("activation", "stage3_activation"),
            ("normalize_scores", "stage3_normalize_scores"),
            ("query_reserve", "stage3_query_reserve"),
            ("weights_int8", "stage3_weights_int8"),
            ("act_int8", "stage3_act_int8"),
            ("fused_mlp", "stage3_fused_mlp"),
            ("flash_attention", "stage3_flash_attention"),
        ],
        "general": [
            ("model_dir", "model_dir"),
            ("index_dir", "index_dir"),
            ("log_level", "log_level"),
            ("log_file", "log_file"),
            ("enable_timing", "enable_timing"),
            ("save_intermediate_results", "save_intermediate_results"),
            ("compute_dtype", "compute_dtype"),
            ("index_dtype", "index_dtype"),
            ("index_search_impl", "index_search_impl"),
            ("index_recall_target", "index_recall_target"),
            ("index_cluster_block_size", "index_cluster_block_size"),
            ("index_cluster_n_probe", "index_cluster_n_probe"),
            ("index_cluster_tile_q", "index_cluster_tile_q"),
            ("index_cluster_iters", "index_cluster_iters"),
            ("index_cluster_factor", "index_cluster_factor"),
            ("index_cluster_kernel", "index_cluster_kernel"),
            ("mesh_data_parallel", "mesh_data_parallel"),
            ("mesh_dcn_parallel", "mesh_dcn_parallel"),
            ("seed", "seed"),
            ("enable_fused_search", "enable_fused_search"),
            ("enable_result_cache", "enable_result_cache"),
            ("result_cache_size", "result_cache_size"),
            ("persist_device_caches", "persist_device_caches"),
            ("serve_pipelined", "serve_pipelined"),
            ("compilation_cache_dir", "compilation_cache_dir"),
        ],
    }

    @classmethod
    def from_yaml(cls, path: str | Path) -> "PipelineConfig":
        """Load nested ``pipeline:`` YAML; unknown/missing keys default."""
        raw = yaml.safe_load(Path(path).read_text()) or {}
        section = raw.get("pipeline", raw)
        cfg = cls()
        for group, pairs in cls._YAML_MAP.items():
            sub = section.get(group, {}) if isinstance(section, dict) else {}
            if not isinstance(sub, dict):
                continue
            for yaml_key, field in pairs:
                if yaml_key in sub and sub[yaml_key] is not None:
                    setattr(cfg, field, sub[yaml_key])
        return cfg

    def to_yaml_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for group, pairs in self._YAML_MAP.items():
            out[group] = {yk: getattr(self, f) for yk, f in pairs}
        return {"pipeline": out}

    def export(self, path: str | Path) -> None:
        Path(path).write_text(yaml.safe_dump(self.to_yaml_dict(), sort_keys=False))

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def as_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

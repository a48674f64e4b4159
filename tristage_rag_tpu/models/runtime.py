"""Inference runtime: jitted, bucketed, mesh-aware encoder execution.

Replaces the reference's torch `model.encode(...)` call sites
(src/stage1_retriever.py:230-254, src/stage2_rescorer.py:134-242,
src/stage3_reranker.py:139-190) with a TPU-shaped contract:

* host tokenizes and pads to (batch-bucket, seq-bucket) static shapes,
* one jitted apply per shape (XLA caches compiles per bucket),
* with a device mesh, inputs are batch-sharded over the ``dp`` axis and
  params replicated, so encoder forwards are data-parallel via jit's
  sharding propagation (SURVEY.md §2.6 parallelism table).

No OOM fallback ladders (reference: stage1_retriever.py:137-228) — XLA
preallocates; the equivalent robustness lever here is shape bucketing +
bounded batch sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tristage_rag_tpu.models.config import EncoderConfig
from tristage_rag_tpu.models.heads import (
    BiEncoder,
    ColBERTEncoder,
    CrossEncoder,
    apply_score_activation,
)
from tristage_rag_tpu.models.tokenizer import Batch, BaseTokenizer

BATCH_BUCKETS = (1, 8, 32, 64, 128, 256, 512)


# ---------------------------------------------------------------------------
# weight-only int8 (stage3_weights_int8)
# ---------------------------------------------------------------------------


def _quantize_kernel(w: np.ndarray) -> dict:
    """Per-output-channel symmetric int8 for a kernel whose LEADING
    axis is (part of) the contraction — flax's Dense/DenseGeneral
    layout. Rank-general: a [in, out] kernel gets a [1, out] scale; a
     3-D [in, heads, dim] attention kernel gets [1, heads, dim] (one
    scale per output unit, abs-max over the contraction axis), so the
    dequant ``q8 * scale`` broadcast reconstructs any rank.

    Delegates to index/token_cache.py::symmetric_int8 — the ONE
    definition of the int8 numeric contract (shared with the dense
    index and the stage-2 token cache) — applied over axis 0 via a
    transpose."""
    from tristage_rag_tpu.index.token_cache import symmetric_int8

    arr = jnp.asarray(w, jnp.float32)
    nd = arr.ndim
    perm = tuple(range(1, nd)) + (0,)  # contraction axis last
    q, s = symmetric_int8(arr.transpose(perm))
    inv = (nd - 1,) + tuple(range(nd - 1))
    return {
        "q8": np.ascontiguousarray(np.asarray(q).transpose(inv)),
        "scale": np.asarray(s, np.float32)[None, ...],
    }


def _dequant_tree(p, dtype, keep_names=(), _parent=None):
    """Rebuild a dense param tree; {"q8","scale"} leaves dequantize to
    ``dtype`` (the convert+scale stays inside the jit — XLA reads int8
    from HBM and materializes the dense kernel as a temporary). The
    multiply runs in f32 so a bf16 compute dtype does not round the
    per-channel scale (8 mantissa bits would add ~0.4%/channel error
    on top of the int8 contract).

    ``keep_names``: module names whose kernel dicts pass through
    UNdequantized — the Pallas fused-MLP path consumes q8+scale
    directly (VMEM tile dequant), which is the whole point of
    weight-int8 on bandwidth-bound shapes; materializing the dense
    kernel here would cost MORE traffic than never quantizing
    (measured, BENCH_NOTES session 9)."""
    if isinstance(p, dict) or hasattr(p, "items"):
        if "q8" in p and "scale" in p and len(p) == 2:
            if _parent in keep_names:
                return dict(p)
            return (
                p["q8"].astype(jnp.float32) * p["scale"].astype(jnp.float32)
            ).astype(dtype)
        return {
            k: _dequant_tree(v, dtype, keep_names, _parent=k)
            for k, v in p.items()
        }
    return p


# The Mlp projection param names whose q8 dicts the Pallas fused-MLP
# kernel consumes natively (models/layers.py::Mlp._fused_bf16).
_FUSED_MLP_PROJ = ("gate_proj", "up_proj", "down_proj")


class DequantModule:
    """Adapter that dequantizes int8 kernels before delegating apply —
    keeps ``module.apply({"params": runtime.params}, ...)`` working
    unchanged everywhere the (module, params) pair travels (staged
    forwards AND the fused/sharded funnel programs).

    When the encoder's bf16 fused-MLP kernel path will engage (knob on
    + lane-aligned dims + no act-int8), the MLP projection dicts are
    NOT dequantized here: the kernel reads int8 weight tiles from HBM
    and dequantizes in VMEM — the actual bandwidth win. Every other
    quantized kernel (attention projections, pooler) still
    dequantizes in-trace."""

    def __init__(self, inner, dtype, keep_names=()):
        self._inner = inner
        self._dtype = dtype
        self._keep_names = tuple(keep_names)

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def apply(self, variables, *args, **kwargs):
        variables = dict(variables)
        variables["params"] = _dequant_tree(
            variables["params"], self._dtype, self._keep_names
        )
        return self._inner.apply(variables, *args, **kwargs)


def prefetched(gen, depth: int = 2):
    """Run a generator on a background thread, buffering up to ``depth``
    items — the double-buffered input pipeline (VERDICT r2 next-6).

    On the indexing fill, host tokenization of batch i+1 overlaps batch
    i's (GIL-releasing) device uploads/dispatch: the consumer blocks in
    tunnel I/O while the producer tokenizes ahead. Exceptions in the
    producer re-raise at the consumer's next pull.

    ``TRISTAGE_PREFETCH=0`` disables the thread (serial fallback) for
    A/B measurement and as an operational kill-switch."""
    import os
    import queue
    import threading

    if os.environ.get("TRISTAGE_PREFETCH", "1") in ("0", "off"):
        yield from gen
        return

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    END = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def run():
        try:
            for item in gen:
                # bounded put that gives up if the consumer bailed —
                # otherwise an abandoned generator would pin this
                # thread (and the tokenizer) forever
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is END:
                t.join()
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def pad_batch(b: Batch, target: int) -> Batch:
    """Pad the batch dimension up to ``target`` rows (mask rows all-pad)."""
    n = b.input_ids.shape[0]
    if n == target:
        return b
    pad = target - n

    def _p(x):
        return np.concatenate([x, np.zeros((pad, x.shape[1]), dtype=x.dtype)], 0)

    return Batch(_p(b.input_ids), _p(b.attn_mask), _p(b.token_type_ids))


def batch_bucket(n: int, buckets: Sequence[int] = BATCH_BUCKETS) -> int:
    for b in buckets:
        if b >= n:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


class EncoderRuntime:
    """Holds a Flax module + params and runs jitted bucketed forwards."""

    def __init__(
        self,
        kind: str,
        cfg: EncoderConfig,
        head_cfg,
        params=None,
        seed: int = 0,
        mesh: Optional[Mesh] = None,
        dp_axis: str = "dp",
        precast_kernels: bool = True,
    ):
        self.kind = kind
        self.cfg = cfg
        self.head_cfg = head_cfg
        # False when weight-only int8 is coming (stage3_weights_int8):
        # quantization must derive int8 codes/scales from the ORIGINAL
        # f32 kernels, not bf16-pre-cast ones (stacked rounding).
        self._precast_kernels = bool(precast_kernels)
        if kind == "bi":
            self.module = BiEncoder(cfg, head_cfg)
        elif kind == "colbert":
            self.module = ColBERTEncoder(cfg, head_cfg)
        elif kind == "cross":
            self.module = CrossEncoder(cfg, head_cfg)
        else:
            raise ValueError(f"unknown runtime kind {kind!r}")
        self.mesh = mesh
        self.dp_axis = dp_axis
        # Encoder forwards are pure data parallelism (params replicated,
        # no cross-batch collectives), so on a hybrid ("dcn", "data")
        # mesh the batch shards over EVERY axis — all devices, both
        # interconnect tiers, zero communication (SURVEY.md §5.8).
        self._dp_axes = tuple(mesh.axis_names) if mesh is not None else ()
        self._dp_size = mesh.size if mesh is not None else 1
        # ST-style encode prompts ({"query": ..., "document": ...});
        # populated by the factory from checkpoint config.
        self.prompts: dict[str, str] = {"query": "", "document": ""}
        if params is None:
            rng = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, 8), dtype=jnp.int32)
            params = self.module.init(rng, dummy, jnp.ones_like(dummy))["params"]
        elif cfg.int8_activations and getattr(cfg, "int8_act_static", False):
            # Checkpoints predate the static-quant ``*_scale`` leaves;
            # graft them (value 1.0, replaced by calibration) so the
            # loaded tree matches the module's.
            params = self._graft_act_scales(params, seed)
        self.params = self._place_params(params)
        # Static activation scales start uncalibrated (1.0): the first
        # real batch through forward() (or an explicit
        # calibrate_act_static call) sets them before any scoring runs.
        self.needs_act_calibration = bool(
            cfg.int8_activations and getattr(cfg, "int8_act_static", False)
        )
        self._weights_int8 = False  # set by quantize_weights_int8
        self._jit_apply = jax.jit(self._apply)

    def load_params(self, params) -> None:
        """Install an externally-produced param tree (trained,
        distilled, or checkpoint-loaded AFTER construction). Handles
        the runtime-only transforms a raw tree predates:

        * static act-int8: grafts missing ``*_scale`` leaves and
          re-arms calibration — but ONLY when leaves were actually
          missing (a tree saved from a calibrated runtime keeps its
          representative scales);
        * weight-only int8 (quantize_weights_int8 ran): a dense
          incoming tree is re-quantized so the DequantModule wrapper
          keeps serving int8 kernels instead of silently going dense.

        Assigning ``runtime.params`` directly skips all of this and
        either crashes the next forward (ScopeParamNotFoundError) or
        silently changes what the runtime serves."""
        if self.cfg.int8_activations and getattr(
            self.cfg, "int8_act_static", False
        ):
            params, grafted = self._graft_act_scales(
                params, 0, report=True
            )
            if grafted:
                self.needs_act_calibration = True
        self.params = self._place_params(params)
        if self._weights_int8:

            def has_q8(p):
                if isinstance(p, dict) or hasattr(p, "items"):
                    return any(
                        (k == "kernel" and isinstance(v, dict))
                        or has_q8(v)
                        for k, v in p.items()
                    )
                return False

            if not has_q8(jax.device_get(self.params)):
                self.quantize_weights_int8()

    def _graft_act_scales(self, params, seed: int, report: bool = False):
        """Insert ``*_scale`` scalar leaves missing from a loaded
        checkpoint tree, taking them from a fresh module init. With
        ``report`` returns ``(tree, n_grafted)`` so callers can tell a
        pre-calibrated tree (0 grafts — keep its scales) from a raw
        bf16 one (grafts — needs calibration)."""
        from flax.traverse_util import flatten_dict, unflatten_dict

        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 8), dtype=jnp.int32)
        ref = self.module.init(rng, dummy, jnp.ones_like(dummy))["params"]
        flat = dict(flatten_dict(params))
        grafted = 0
        for path, leaf in flatten_dict(ref).items():
            if path not in flat and path[-1].endswith("_scale"):
                flat[path] = leaf
                grafted += 1
        tree = unflatten_dict(flat)
        return (tree, grafted) if report else tree

    def calibrate_act_static(self, batches: Sequence[Batch]) -> int:
        """Abs-max calibration for static int8 activations.

        Runs bf16 forwards with the ``act_stats`` collection mutable —
        each quant site (models/layers.py::_act_site) then takes the
        dense path and sows its input's abs-max. The per-site maxima
        (max over all batches) become per-tensor scales written into
        the ``*_scale`` param leaves. Same treedef before/after, so no
        recompile of the serving programs; returns #sites calibrated.
        """
        from flax.traverse_util import flatten_dict, unflatten_dict

        assert self.cfg.int8_activations and self.cfg.int8_act_static
        self.needs_act_calibration = False

        @jax.jit
        def stats_fn(p, ids, mask, tt):
            _, st = self.module.apply(
                {"params": p}, ids, mask, tt, mutable=["act_stats"]
            )
            return st["act_stats"]

        merged: dict = {}
        for b in batches:
            bucket = batch_bucket(b.input_ids.shape[0])
            if self.mesh is not None:
                dp = self._dp_size
                bucket = ((max(bucket, dp) + dp - 1) // dp) * dp
            b = pad_batch(b, bucket)
            st = jax.device_get(
                stats_fn(
                    self.params,
                    self._place_batch(b.input_ids),
                    self._place_batch(b.attn_mask),
                    self._place_batch(b.token_type_ids),
                )
            )
            for path, v in flatten_dict(st).items():
                v = float(np.max(v))
                merged[path] = max(merged.get(path, 0.0), v)

        flat = dict(flatten_dict(jax.device_get(self.params)))
        count = 0
        for path, absmax in merged.items():
            # sow stores under (..., site_name); the scale param lives
            # beside it as (..., site_name + "_scale").
            target = path[:-1] + (path[-1] + "_scale",)
            if target in flat:
                flat[target] = jnp.float32(max(absmax, 1e-8) / 127.0)
                count += 1
        self.params = self._place_params(unflatten_dict(flat))
        return count

    def _fused_mlp_consumes_q8(self) -> bool:
        """True when Mlp.__call__ will take the bf16 fused-kernel path
        (models/layers.py: knob on, lane-aligned dims, fused-able
        activation, no act-int8) — the condition under which MLP q8
        dicts must pass through to the kernel undequantized."""
        from tristage_rag_tpu.models.layers import Mlp

        return Mlp.fused_bf16_engages(self.cfg)

    def quantize_weights_int8(self, min_size: int = 4096) -> int:
        """Convert large kernels (any rank — attention DenseGenerals
        included) to per-output-channel symmetric int8 (weight-only;
        activations stay in compute dtype). Halves weight HBM
        residency. MLP projections feed the Pallas fused-MLP kernel as
        int8 directly (VMEM tile dequant — the serving bandwidth win);
        other kernels dequantize in-jit. Embedding tables and small
        kernels stay dense, pre-cast to the compute dtype (leaving
        them f32 would re-convert per dispatch — the session-9 trace
        showed a 133 us f32 QKV copy from exactly that). Returns
        #kernels quantized."""
        # From here on, placements must never pre-cast kernels: any
        # future load_params tree feeds RE-quantization, which needs
        # f32 sources. The CURRENT tree's survivors are cast below —
        # they are never re-read as quantization sources (re-quant
        # always starts from a freshly loaded tree).
        self._precast_kernels = False
        host = jax.device_get(self.params)
        count = 0
        dt = jnp.dtype(self.cfg.dtype)

        def walk(p, in_classifier=False):
            nonlocal count
            if isinstance(p, dict) or hasattr(p, "items"):
                out = {}
                for k, v in p.items():
                    sub_cls = in_classifier or "classifier" in str(k)
                    if sub_cls:
                        # the classifier head computes in f32 on
                        # purpose (same exclusion as
                        # _precast_embed_tables) — never quantize or
                        # downcast it
                        out[k] = walk(v, True)
                    elif (
                        k == "kernel"
                        and getattr(v, "ndim", 0) >= 2
                        and v.size >= min_size
                    ):
                        out[k] = _quantize_kernel(v)
                        count += 1
                    elif (
                        k == "kernel"
                        and getattr(v, "dtype", None) == np.float32
                        and dt != jnp.float32
                    ):
                        # surviving small dense kernel: pre-cast once
                        # (same rounding flax applies per-apply; same
                        # policy as _precast_embed_tables, which this
                        # runtime's placements no longer perform)
                        out[k] = v.astype(dt)
                    else:
                        out[k] = walk(v, sub_cls)
                return out
            return p

        keep = _FUSED_MLP_PROJ if self._fused_mlp_consumes_q8() else ()
        self.params = self._place_params(walk(host))
        if not self._weights_int8:  # load_params re-entry: don't re-wrap
            self.module = DequantModule(
                self.module, jnp.dtype(self.cfg.dtype), keep_names=keep
            )
        self._weights_int8 = True
        self._jit_apply = jax.jit(self._apply)
        return count

    # Embedding tables flax's nn.Embed promotes to the compute dtype
    # before its take — i.e. the WHOLE table converts on EVERY dispatch
    # when stored f32. Measured on the bf16 fused funnel trace: 1.9 ms
    # per dispatch (28%!) for Gemma3's 262k x 640 tok_embed alone
    # (BENCH_NOTES round 3). Pre-cast once at placement instead —
    # bit-identical, the per-dispatch promote applied the same
    # f32->compute rounding.
    _EMBED_TABLES = ("tok_embed", "pos_embed", "type_embed")

    def _precast_embed_tables(self, params):
        """Pre-cast f32-stored params that flax would convert to the
        compute dtype on EVERY apply anyway — embedding tables
        (nn.Embed promotes the full 262k x 640 Gemma3 table per
        dispatch: measured 1.9 ms = 28% of fused-funnel device time)
        and dense kernels (nn.Dense/DenseGeneral cast kernel+bias per
        apply; leaving them f32 doubles the weight HBM read of every
        matmul — the trace showed stage-3's down-proj fusion at 36
        TFLOP/s on f32 weights). Bit-identical: the same f32->bf16
        rounding flax applies, done once at placement.

        Exclusions: norm scales (RMSNorm computes in f32; no 'kernel'
        leaf, so excluded by name), the f32-dtype classifier head, and
        act-int8 runtimes (their in-trace weight quantization reads the
        f32 kernel — pre-rounding would perturb the int8 scales)."""
        dt = jnp.dtype(self.cfg.dtype)
        if dt == jnp.float32:
            return params
        from flax.traverse_util import flatten_dict, unflatten_dict

        cast_kernels = getattr(self, "_precast_kernels", True) and not (
            self.cfg.int8_activations or self.cfg.int8_act_static
        )
        flat = dict(flatten_dict(params))
        changed = False
        for path, leaf in flat.items():
            if getattr(leaf, "dtype", None) != jnp.float32:
                continue
            is_embed = (
                len(path) >= 2
                and path[-1] == "embedding"
                and path[-2] in self._EMBED_TABLES
            )
            is_kernel = (
                cast_kernels
                and path[-1] == "kernel"
                and getattr(leaf, "ndim", 0) >= 2
                and "classifier" not in path
            )
            if is_embed or is_kernel:
                flat[path] = leaf.astype(dt)
                changed = True
        return unflatten_dict(flat) if changed else params

    def _place_params(self, params):
        params = self._precast_embed_tables(params)
        if self.mesh is None:
            return jax.device_put(params)
        repl = NamedSharding(self.mesh, P())
        return jax.device_put(params, repl)

    def _apply(self, params, input_ids, attn_mask, token_type_ids):
        return self.module.apply(
            {"params": params}, input_ids, attn_mask, token_type_ids
        )

    def _place_batch(self, arr: np.ndarray) -> jax.Array:
        if self.mesh is None:
            return jnp.asarray(arr)
        sh = NamedSharding(self.mesh, P(self._dp_axes, None))
        return jax.device_put(arr, sh)

    def forward(self, b: Batch) -> jax.Array:
        """Run one padded batch; returns device array (unpadded rows first)."""
        if self.needs_act_calibration:
            # First real batch doubles as the static-quant calibration
            # set (abs-max is distribution-coarse by design; later
            # outliers saturate at +-127 rather than corrupt scales).
            self.calibrate_act_static([b])
        n = b.input_ids.shape[0]
        bucket = batch_bucket(n)
        if self.mesh is not None:
            dp = self._dp_size
            bucket = max(bucket, dp)
            bucket = ((bucket + dp - 1) // dp) * dp
        b = pad_batch(b, bucket)
        out = self._jit_apply(
            self.params,
            self._place_batch(b.input_ids),
            self._place_batch(b.attn_mask),
            self._place_batch(b.token_type_ids),
        )
        return out[:n]

    # ---- high-level text APIs -------------------------------------------

    def encode_texts(
        self,
        texts: Sequence[str],
        tokenizer: BaseTokenizer,
        max_length: int,
        batch_size: int = 64,
        device_out: bool = False,
    ) -> np.ndarray:
        """Bi-encoder: texts -> [N, E] f32 embeddings.

        ``device_out=True`` keeps the result as a device array so
        downstream device consumers (DenseIndex.add) skip the
        device->host->device round-trip on the indexing path.
        """
        assert self.kind == "bi"
        outs = []
        toks = (
            tokenizer.encode_batch(texts[i : i + batch_size], max_length)
            for i in range(0, len(texts), batch_size)
        )
        for tb in prefetched(toks):
            fwd = self.forward(tb)
            outs.append(fwd if device_out else np.asarray(fwd))
        if not outs:
            e_dim = (
                self.head_cfg.projection_dims[-1]
                if self.head_cfg.projection_dims
                else self.cfg.hidden_size
            )
            return np.zeros((0, e_dim), dtype=np.float32)
        if device_out:
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return np.concatenate(outs, axis=0)

    def encode_token_embeddings(
        self,
        texts: Sequence[str],
        tokenizer: BaseTokenizer,
        max_length: int,
        batch_size: int = 16,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ColBERT: texts -> ([N, L, D] f32 token embs, [N, L] mask).

        All batches are padded to ``max_length`` so results concatenate;
        downstream MaxSim masks padding anyway.
        """
        assert self.kind == "colbert"
        embs, masks = [], []
        toks = (
            tokenizer.encode_batch(
                texts[i : i + batch_size], max_length, buckets=(max_length,)
            )
            for i in range(0, len(texts), batch_size)
        )
        for tb in prefetched(toks):
            out = np.asarray(self.forward(tb))
            embs.append(out)
            masks.append(tb.attn_mask)
        if not embs:
            dim = (
                self.head_cfg.output_dim
                if getattr(self.head_cfg, "project", True)
                else self.cfg.hidden_size
            )
            return (
                np.zeros((0, max_length, dim), np.float32),
                np.zeros((0, max_length), np.int32),
            )
        return np.concatenate(embs, 0), np.concatenate(masks, 0)

    def token_embedding_batches(
        self,
        texts: Sequence[str],
        tokenizer: BaseTokenizer,
        max_length: int,
        batch_size: int = 16,
    ):
        """ColBERT batches as (device [n, L, D] embeddings, host [n, L]
        mask) WITHOUT fetching embeddings to host.

        The indexing-time cache fill (stage2.precompute) scatters each
        batch straight into the device token cache; fetching through
        ``encode_token_embeddings`` costs a full host round-trip per
        batch (~30 ms on tunneled dev TPUs) plus a re-upload. Because
        nothing here blocks, host tokenization of batch j+1 overlaps
        the device forward of batch j; ``prefetched`` extends the
        overlap to the consumer's scatter/upload time too."""
        assert self.kind == "colbert"
        toks = (
            tokenizer.encode_batch(
                texts[i : i + batch_size], max_length, buckets=(max_length,)
            )
            for i in range(0, len(texts), batch_size)
        )
        for tb in prefetched(toks):
            yield self.forward(tb), tb.attn_mask

    def score_pairs(
        self,
        pairs: Sequence[tuple[str, str]],
        tokenizer: BaseTokenizer,
        max_length: int,
        batch_size: int = 32,
    ) -> np.ndarray:
        """Cross-encoder: (q, d) pairs -> [N] f32 relevance scores."""
        assert self.kind == "cross"
        outs = []
        toks = (
            tokenizer.encode_pairs(pairs[i : i + batch_size], max_length)
            for i in range(0, len(pairs), batch_size)
        )
        for tb in prefetched(toks):
            logits = self.forward(tb)
            scores = apply_score_activation(logits, self.head_cfg.activation)
            outs.append(np.asarray(scores))
        if not outs:
            return np.zeros((0,), dtype=np.float32)
        return np.concatenate(outs, axis=0)

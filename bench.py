"""Driver perf gate: stage-1 QPS headline + budgeted optional legs.

Prints the stage-1 headline JSON line the moment the stage-1 leg
returns, then re-prints a MERGED line as each optional leg lands
(end-to-end funnel, synthetic NDCG). The driver keeps the LAST JSON
line, so every printed line is a complete superset of the previous
one — an rc=124 kill during a later leg can no longer erase the
headline (VERDICT r3 weak-1: round 3 shipped rc=124 with no JSON).

Final merged line:
  {"metric": "stage1_qps", "value": N, "unit": "qps", "vs_baseline": R,
   "recall_at_k": r, "exact_qps": E,
   "int8_approx_qps": Q8, "int8_recall_at_k": r8,
   "funnel_ms_per_query": F, "funnel_vs_target": 20/F,
   "funnel_ms_spread": S, "funnel_trace_ms": T,
   "indexing_docs_s": D, "indexing_warmup_s": W,
   "synthetic_ndcg_at_10": Nd, "synthetic_ndcg_spread": Ns}

Funnel fields measure the shipped DEFAULT config (the measured latency
optimum at the 2k gate shape): `funnel_ms_per_query` = best of N
chained probes with `funnel_ms_spread` recording the probe dispersion,
and `funnel_trace_ms` = per-program trace-derived device time (the
cross-round-comparable ground truth; probes include relay noise).
`indexing_docs_s` is a WARM steady-state rate (compiles + reserve
excluded, reported as `indexing_warmup_s`).

Process layout: the PARENT never imports jax or touches the device.
Each leg is a timeout-bounded subprocess (TPU runtimes are exclusive
per-process, so device legs run sequentially; the CPU-only NDCG leg
runs concurrently from the start):

  1. ``bench.py --leg stage1``       device leg, cap BENCH_S1_TIMEOUT
     (default 480 s) — the headline. If it fails, nothing is printed
     and the gate exits non-zero (an honest tunnel-down signal).
  2. ``scripts/bench_funnel_gate.py`` device leg, cap
     BENCH_FUNNEL_TIMEOUT (default 300 s) — fused tri-stage device
     time at the BASELINE.md protocol shape (full-size archs, 2k
     docs, 500/100/20). Uses the persistent compile cache under
     ./xla_cache so full-size Mosaic compiles amortize across runs.
     BENCH_NO_FUNNEL=1 disables.
  3. ``bench.py --leg pallas``        device leg, cap
     BENCH_PALLAS_TIMEOUT (default 480 s) — the Pallas stage-1 kernel
     paths (bankT top1/top2, exact select) with both recall axes,
     merged as pallas_* fields. BENCH_NO_PALLAS=1 disables.
  4. ``scripts/bench_ndcg_gate.py``   CPU leg, cap BENCH_NDCG_TIMEOUT
     (default 420 s) — synthetic-LIMIT NDCG@10 of the tiny trained
     stack (quality regression axis, VERDICT r3 next-10).
     BENCH_NO_NDCG=1 disables.

The stage-1 headline `value` stays pinned to the DEFAULT storage path
(bf16 corpus + XLA approx_max_k) so vs_baseline is apples-to-apples
across rounds; int8 storage reports as its own fields with its own
measured recall, and `exact_qps` shows what accuracy the headline
trades. Setup mirrors BASELINE.md's north-star config: 1M (2^20)
768-dim bf16 embeddings resident in HBM, query batch 128, fused
top-500; vs_baseline = QPS / 10,000. Timing method: the axon relay
acks dispatches before device completion, so block_until_ready
under-measures; we time jit(fori_loop(op)) at two iteration counts
and difference out RTT + dispatch overhead (each iteration's output
feeds the next input, so iterations cannot overlap).
"""

from __future__ import annotations

import json
import os as _os
import subprocess
import sys
import time

N = int(_os.environ.get("BENCH_N", 1 << 20))  # 1,048,576 docs
D = 768
K = int(_os.environ.get("BENCH_K", 500))
B = 128
BASELINE_QPS = 10_000.0

_REPO = _os.path.dirname(_os.path.abspath(__file__))


# ---------------------------------------------------------------- legs

def _stage1_leg(which: str = "stage1") -> None:
    """Device leg, ONE JSON line.

    ``which="stage1"``: the XLA headline paths (approx/int8/exact).
    ``which="pallas"``: the Pallas kernel paths as their OWN budgeted
    leg — cold remote Mosaic compiles and per-program load latencies
    measured ~7-8 min for the combined leg on the tunneled chip, which
    blew the headline's cap; split out, a pallas timeout can never
    cost the headline (same structure as the funnel leg)."""
    import jax
    import jax.numpy as jnp

    if _os.environ.get("BENCH_FORCE_CPU"):  # local smoke validation
        jax.config.update("jax_platforms", "cpu")

    try:  # persistent compile cache: restarts reuse compiled programs
        from tristage_rag_tpu.utils.compilecache import (
            enable_compilation_cache,
        )

        enable_compilation_cache(_os.path.join(_REPO, "xla_cache"))
    except Exception as e:
        print(f"# compile cache unavailable: {e}", file=sys.stderr)

    from tristage_rag_tpu.utils.benchtime import chained_loop_time

    docs = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    # L2-normalize on device (cosine / inner-product equivalence).
    norm = jnp.sqrt(jnp.sum(jnp.square(docs.astype(jnp.float32)), axis=1,
                            keepdims=True))
    docs = (docs.astype(jnp.float32) / jnp.maximum(norm, 1e-9)).astype(
        jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype=jnp.bfloat16)
    count = jnp.int32(N)

    candidates = {}

    def xla_approx_step(q, d):
        s = jnp.einsum("bd,nd->bn", q, d, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, K, recall_target=0.95)

    def xla_exact_step(q, d):
        s = jnp.einsum("bd,nd->bn", q, d, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)

    # int8 storage mode (opt-in `index_int8` config): per-row symmetric
    # quantization, dequant fused into the matmul's HBM read — halves
    # the corpus-read bytes that bound this op. Reported as its OWN
    # metric fields, never as the headline (ADVICE r2).
    int8_ready = False
    try:
        from tristage_rag_tpu.index.dense import _quantize_rows

        q8docs, scales = _quantize_rows(docs.astype(jnp.float32))

        def int8_approx_step(q, d):
            s = jnp.einsum(
                "bd,nd->bn", q.astype(jnp.bfloat16), d.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * scales[None, :]
            return jax.lax.approx_max_k(s, K, recall_target=0.95)

        int8_ready = True
    except Exception as e:
        print(f"# int8 path unavailable: {e}", file=sys.stderr)

    if which == "stage1":
        paths = [("xla_approx", xla_approx_step, docs)]
        if int8_ready:
            paths.append(("int8_approx", int8_approx_step, q8docs))
        # Exact XLA top_k is ~77x slower at this scale, so it gets few
        # iterations — it contextualizes the headline's recall cost.
        paths.append(("xla_exact", xla_exact_step, docs))
    else:  # pallas leg
        from tristage_rag_tpu.ops.pallas_topk import fused_matmul_topk

        def pallas_step(q, d):
            return fused_matmul_topk(q, d, count, k=K)

        def pallas_bank_step(q, d):
            # transposed bank kernel (round 5): scores land [BLK, B] so
            # the bank reduce is a sublane reshape, not a per-bank lane
            # loop — 3-6x the round-4 bank kernel at the same recall
            return fused_matmul_topk(q, d, count, k=K, mode="bankT")

        paths = [
            ("pallas_fused_bank", pallas_bank_step, docs),
            ("pallas_fused_exact", pallas_step, docs),
        ]
        if int8_ready:
            # int8 x int8 on the MXU + half the HBM read — the XLA
            # int8 path only gets the read saving (it dequantizes into
            # a float dot, staying compute-bound). blk2048 measured
            # best for the bankT legs (BENCH_NOTES round 5).
            def pallas_int8_step(q, d):
                return fused_matmul_topk(
                    q.astype(jnp.float32), d, count, k=K, scales=scales
                )

            def pallas_int8_bank_step(q, d):
                return fused_matmul_topk(
                    q.astype(jnp.float32), d, count, k=K, mode="bankT",
                    scales=scales, block_size=2048, per_block_k=16,
                )

            def pallas_int8_bank2_step(q, d):
                # bank_top=2 recovers 2-winner bank collisions:
                # >=0.99 SELECTION recall at k=500/1M (the >=0.99 axis
                # VERDICT r4 next-2 asks for; the vs-bf16 number is
                # floored at ~0.986 by int8 quantization id-divergence
                # for EVERY int8 path, including int8_approx at 0.981)
                return fused_matmul_topk(
                    q.astype(jnp.float32), d, count, k=K, mode="bankT",
                    bank_top=2, scales=scales, block_size=2048,
                    per_block_k=16,
                )

            paths = [
                ("pallas_int8_bank", pallas_int8_bank_step, q8docs),
                ("pallas_int8_bank2", pallas_int8_bank2_step, q8docs),
                ("pallas_int8_exact", pallas_int8_step, q8docs),
            ] + paths

    def _emit(recalls={}, sel_recalls={}):
        """Print the JSON line with everything measured SO FAR — the
        parent salvages the LAST line on a leg timeout, so a slow
        relay window degrades later fields instead of losing the leg
        (round-5 hardening: two rehearsals lost the whole headline to
        480 s caps on a flaky window)."""
        if which == "stage1":
            if "xla_approx" not in candidates:
                return
            o = {
                "metric": "stage1_qps",
                "value": round(candidates["xla_approx"], 1),
                "unit": "qps",
                "vs_baseline": round(
                    candidates["xla_approx"] / BASELINE_QPS, 3
                ),
            }
            if "xla_approx" in recalls:
                o["recall_at_k"] = round(recalls["xla_approx"], 4)
            if "xla_exact" in candidates:
                o["exact_qps"] = round(candidates["xla_exact"], 1)
            if "int8_approx" in candidates:
                o["int8_approx_qps"] = round(candidates["int8_approx"], 1)
                if "int8_approx" in recalls:
                    o["int8_recall_at_k"] = round(
                        recalls["int8_approx"], 4
                    )
        else:
            o = {}
            for pal in ("pallas_int8_exact", "pallas_int8_bank",
                        "pallas_int8_bank2", "pallas_fused_bank",
                        "pallas_fused_exact"):
                if pal in candidates:
                    o[f"{pal}_qps"] = round(candidates[pal], 1)
                    if pal in recalls:
                        o[f"{pal}_recall_at_k"] = round(recalls[pal], 4)
                    if pal in sel_recalls:
                        o[f"{pal}_sel_recall"] = round(
                            sel_recalls[pal], 4
                        )
        if o:
            print(json.dumps(o), flush=True)

    iters_for = {"xla_exact": 6}
    for name, fn, corpus in paths:
        try:
            per_iter = chained_loop_time(
                fn, q, corpus, iters_for.get(name, 30)
            )
            candidates[name] = B / per_iter
            print(f"# {name}: {per_iter * 1e3:.3f} ms/batch "
                  f"({candidates[name]:.0f} qps)", file=sys.stderr)
            _emit()
        except Exception as e:  # keep the bench alive if one path breaks
            print(f"# {name} failed: {e}", file=sys.stderr)

    if which == "stage1" and "xla_approx" not in candidates:
        raise SystemExit("default-path benchmark failed")

    # Measured recall@K of each approx path vs exact, on this corpus +
    # query batch (one fetch each; set membership per query, averaged).
    recalls = {}
    sel_recalls = {}
    try:
        exact_ids = jax.device_get(jax.jit(xla_exact_step)(q, docs)[1])
        # SELECTION-recall oracle for int8 paths: exact top-k over the
        # SAME int8-dequant scores. Every int8 path's vs-bf16 recall is
        # floored near 0.986 by quantization id-divergence at the K
        # boundary (int8_approx reads 0.981 for the same reason); the
        # kernel only controls selection loss, measured against this.
        int8_exact_ids = None
        if int8_ready:
            # each leg's selection oracle is exact top-k over the
            # measured paths' OWN score function (round-5 review): the
            # stage-1 leg's int8_approx uses a FLOAT query; the pallas
            # kernels quantize the query, so their oracle does too
            # (the int8 x int8 dot is exact in int32 and f32 holds it
            # losslessly — bit-faithful scores)
            def int8_exact_step(qq, dd):
                if which == "stage1":
                    s = jnp.einsum(
                        "bd,nd->bn", qq.astype(jnp.bfloat16),
                        dd.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ) * scales[None, :]
                    return jax.lax.top_k(s, K)
                from tristage_rag_tpu.index.token_cache import (
                    symmetric_int8,
                )

                q8, qs = symmetric_int8(qq)
                s = jnp.einsum(
                    "bd,nd->bn", q8.astype(jnp.bfloat16),
                    dd.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                s = s * qs[:, None] * scales[None, :]
                return jax.lax.top_k(s, K)

            int8_exact_ids = jax.device_get(
                jax.jit(int8_exact_step)(q, q8docs)[1]
            )
        if which == "stage1":
            recall_paths = [("xla_approx", xla_approx_step, docs)]
            if int8_ready:
                recall_paths.append(
                    ("int8_approx", int8_approx_step, q8docs)
                )
        elif int8_ready:
            recall_paths = [
                ("pallas_int8_exact", pallas_int8_step, q8docs),
                ("pallas_int8_bank", pallas_int8_bank_step, q8docs),
                ("pallas_int8_bank2", pallas_int8_bank2_step, q8docs),
            ]
        else:
            recall_paths = []

        def _overlap(ids, ref):
            hit = sum(
                len(set(ids[b].tolist()) & set(ref[b].tolist()))
                for b in range(B)
            )
            return hit / float(B * K)

        for name, step, corpus in recall_paths:
            ids = jax.device_get(jax.jit(step)(q, corpus)[1])
            recalls[name] = _overlap(ids, exact_ids)
            print(f"# {name} recall@{K}: {recalls[name]:.4f}",
                  file=sys.stderr)
            if int8_exact_ids is not None and "int8" in name:
                sel_recalls[name] = _overlap(ids, int8_exact_ids)
                print(f"# {name} selection recall@{K}: "
                      f"{sel_recalls[name]:.4f}", file=sys.stderr)
    except Exception as e:
        print(f"# recall measurement failed: {e}", file=sys.stderr)

    _emit(recalls, sel_recalls)


# -------------------------------------------------------- orchestrator

def _last_json_line(text: str) -> dict | None:
    for line in text.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except Exception:
                continue
    return None


def _run_leg(argv: list[str], timeout_s: float, label: str) -> dict | None:
    return _run_leg_env(argv, timeout_s, label, None)


def _run_leg_env(
    argv: list[str], timeout_s: float, label: str, env: dict | None
) -> dict | None:
    """Run one leg to completion; return its last JSON line (or None).
    Leg stderr passes through for diagnostics; never raises."""
    if timeout_s <= 5:
        print(f"# {label} leg skipped: budget exhausted", file=sys.stderr)
        return None
    try:
        res = subprocess.run(
            argv, capture_output=True, text=True, timeout=timeout_s,
            cwd=_REPO, env=env,
        )
        if res.stderr:
            sys.stderr.write(res.stderr[-2000:])
        parsed = _last_json_line(res.stdout)
        if parsed is None:
            print(f"# {label} leg produced no JSON (rc={res.returncode})",
                  file=sys.stderr)
        return parsed
    except subprocess.TimeoutExpired as e:
        print(f"# {label} leg timed out after {timeout_s:.0f}s",
              file=sys.stderr)
        # salvage whatever the leg printed before the kill — legs
        # print partial JSON lines as results land, so a timeout
        # mid-extra-measurement keeps the core fields
        out = e.stdout
        if out:
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            parsed = _last_json_line(out)
            if parsed is not None:
                print(f"# {label} leg: salvaged partial JSON",
                      file=sys.stderr)
            return parsed
    except Exception as e:
        print(f"# {label} leg failed: {e}", file=sys.stderr)
    return None


def main() -> None:
    if "--leg" in sys.argv:
        which = sys.argv[sys.argv.index("--leg") + 1]
        assert which in ("stage1", "pallas"), which
        _stage1_leg(which)
        return

    budget = float(_os.environ.get("BENCH_BUDGET_S", 1100))
    deadline = time.time() + budget

    def remaining() -> float:
        return deadline - time.time()

    # CPU-only NDCG leg runs concurrently from the start — it never
    # touches the chip (it forces the CPU platform before compute).
    # Output goes to temp FILES, not PIPEs: an undrained pipe would
    # block a chatty leg mid-run, and files let the join below be a
    # plain wait.
    import tempfile

    ndcg_proc = None
    ndcg_out = ndcg_err = None
    ndcg_start = time.time()
    if not _os.environ.get("BENCH_NO_NDCG"):
        ndcg_out = tempfile.TemporaryFile(mode="w+")
        ndcg_err = tempfile.TemporaryFile(mode="w+")
        ndcg_proc = subprocess.Popen(
            [sys.executable, "-u",
             _os.path.join(_REPO, "scripts", "bench_ndcg_gate.py")],
            stdout=ndcg_out, stderr=ndcg_err, text=True, cwd=_REPO,
        )

    def join_ndcg() -> dict | None:
        if ndcg_proc is None:
            return None
        # BENCH_NDCG_TIMEOUT caps the leg's RUNTIME from its launch
        # (not from this join): a hung leg dies at launch+cap even
        # though the device legs ran in between.
        n_cap = float(_os.environ.get("BENCH_NDCG_TIMEOUT", 420))
        wait_s = min(n_cap - (time.time() - ndcg_start), remaining())
        try:
            ndcg_proc.wait(timeout=max(5.0, wait_s))
        except subprocess.TimeoutExpired:
            ndcg_proc.kill()
            ndcg_proc.wait()
            print("# ndcg leg timed out", file=sys.stderr)
            return None
        except Exception as e:
            print(f"# ndcg leg failed: {e}", file=sys.stderr)
            return None
        ndcg_err.seek(0)
        err = ndcg_err.read()
        if err:
            sys.stderr.write(err[-2000:])
        ndcg_out.seek(0)
        return _last_json_line(ndcg_out.read())

    s1_cap = float(_os.environ.get("BENCH_S1_TIMEOUT", 480))
    headline = _run_leg(
        [sys.executable, "-u", _os.path.abspath(__file__),
         "--leg", "stage1"],
        min(s1_cap, remaining()), "stage1",
    )
    if not headline or "value" not in headline:
        if ndcg_proc is not None:
            ndcg_proc.kill()
            ndcg_proc.communicate()
        raise SystemExit("stage-1 headline leg failed — no JSON emitted")

    print(json.dumps(headline), flush=True)  # line 1: headline FIRST

    if not _os.environ.get("BENCH_NO_FUNNEL"):
        # 420 s: the warm-indexing restructure + probe/trace fields
        # (round 5) cost ~1-2 min beyond the old single-probe leg on
        # slow relay windows; partial JSON salvage above keeps the
        # core fields even when the cap hits mid-trace
        f_cap = float(_os.environ.get("BENCH_FUNNEL_TIMEOUT", 420))
        funnel = _run_leg(
            [sys.executable, "-u",
             _os.path.join(_REPO, "scripts", "bench_funnel_gate.py")],
            min(f_cap, remaining() - 30), "funnel",
        )
        if funnel:
            # merge whatever the leg managed to measure: a degraded
            # window can yield indexing fields without probes (the leg
            # prints partial lines as results land)
            if "funnel_ms_per_query" in funnel:
                headline["funnel_ms_per_query"] = (
                    funnel["funnel_ms_per_query"]
                )
                # latency target ratio, higher = better (<20 ms)
                headline["funnel_vs_target"] = round(
                    20.0 / max(funnel["funnel_ms_per_query"], 1e-9), 2
                )
            # dispersion + trace-derived ground truth (VERDICT r4
            # weak-1: a single chained probe has a ±45% noise band;
            # funnel_trace_ms is the cross-round-comparable number)
            for k in ("funnel_ms_spread", "funnel_trace_ms",
                      "indexing_warmup_s"):
                if k in funnel:
                    headline[k] = funnel[k]
            if "indexed_docs_s" in funnel:
                headline["indexing_docs_s"] = funnel["indexed_docs_s"]
            print(json.dumps(headline), flush=True)  # line 2: +funnel
        # (the round-4 `funnel_perf_*` leg is gone: configs/perf.yaml
        # was a CAPACITY profile that measured SLOWER than defaults at
        # the 2k gate shape by design — VERDICT r4 weak-6. It now lives
        # as configs/scale.yaml; measure it at scale via
        # BENCH_FUNNEL_CONFIG=configs/scale.yaml BENCH_FUNNEL_DOCS=...)

    # Pallas kernel leg (round 5, default-on): its own subprocess +
    # budget, merged like the funnel leg — cold Mosaic compiles or
    # per-program load latency can time out THIS leg but never the
    # headline. BENCH_NO_PALLAS=1 disables.
    if not _os.environ.get("BENCH_NO_PALLAS") and not _os.environ.get(
        "BENCH_FORCE_CPU"  # Mosaic is TPU-only
    ):
        p_cap = float(_os.environ.get("BENCH_PALLAS_TIMEOUT", 480))
        pal = _run_leg(
            [sys.executable, "-u", _os.path.abspath(__file__),
             "--leg", "pallas"],
            min(p_cap, remaining() - 30), "pallas",
        )
        if pal:
            headline.update(pal)
            print(json.dumps(headline), flush=True)  # line 3: +pallas

    ndcg = join_ndcg()
    if ndcg and "synthetic_ndcg_at_10" in ndcg:
        for k in ("synthetic_ndcg_at_10", "synthetic_ndcg_spread",
                  "synthetic_ndcg_per_seed", "synthetic_recall_at_10"):
            if k in ndcg:
                headline[k] = ndcg[k]
        print(json.dumps(headline), flush=True)  # line 3: +quality axis


if __name__ == "__main__":
    main()

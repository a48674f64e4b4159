"""Summarize a jax.profiler trace: top device ops by total time.

Parses the xplane.pb that ``jax.profiler.trace(out_dir)`` writes (via
the installed ``xprof``/``tensorboard_plugin_profile`` protos — no
TensorBoard server needed) and prints, per trace:

  * total device time across all TensorCore op events,
  * the top-N op groups (events aggregated by name) with total us,
    occurrence count, and share of device time.

This is the attribution tool behind BENCH_NOTES' per-op tables (e.g.
the session-7 "six 310-us convert+reduce fusions" finding). The
per-program totals it reports are the device-execution ground truth
the chained ``device_time_probe`` approximates (see BENCH_NOTES
"method" notes — the probe includes relay throttling gaps).

Usage:
  python scripts/trace_ops.py /tmp/traces_s9/fused-mlp [--top 40] \
      [--per-iter N]   # divide totals by N (e.g. traced iterations)
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict


def _load_xplane(path: str):
    try:  # tensorflow ships the canonical xplane proto
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # xprof wheel layout (older/newer variants)
        from xprof.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _device_planes(xs):
    # TPU device planes are named like "/device:TPU:0"; the host plane
    # is "/host:CPU". Keep any plane that looks like an accelerator.
    for plane in xs.planes:
        name = plane.name
        if "TPU" in name or "GPU" in name or "device:" in name.lower():
            if "CPU" in name and "TPU" not in name:
                continue
            yield plane


def device_total_us(trace_dir: str, per_iter: int = 1) -> float | None:
    """Total synchronous device-op time across every xplane.pb under
    ``trace_dir``, in microseconds per iteration — the per-program
    ground-truth number BENCH_NOTES' method notes call "trace-derived
    device time" (reproduces to ~1 us run-to-run, unlike the chained
    probe whose reading includes relay throttling gaps). Returns None
    when no trace or no device events exist (e.g. CPU platform)."""
    pbs = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ))
    total_ps = 0.0
    seen = False
    for pb in pbs:
        try:
            xs = _load_xplane(pb)
        except Exception:
            continue
        for plane in _device_planes(xs):
            for line in plane.lines:
                if (line.name or "") != "XLA Ops":
                    continue
                for ev in line.events:
                    total_ps += ev.duration_ps
                    seen = True
    if not seen:
        return None
    return total_ps * 1e-6 / max(per_iter, 1)


def summarize(path: str, top: int, per_iter: int, line_filter: str | None):
    xs = _load_xplane(path)
    groups: dict[str, list[float, int]] = defaultdict(lambda: [0.0, 0])
    total_ps = 0.0
    for plane in _device_planes(xs):
        ev_names = plane.event_metadata
        for line in plane.lines:
            # Keep ONLY the synchronous op line: "Async XLA Ops" are
            # DMA prefetches that overlap compute (summing them
            # double-counts ~7x), and "XLA Modules" would double-count
            # every op. The XLA Ops total reproduces the per-program
            # device time exactly (BENCH_NOTES session-8 method note).
            lname = line.name or ""
            if line_filter is not None:
                if line_filter not in lname:
                    continue
            elif lname != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_names.get(ev.metadata_id)
                name = meta.name if meta else f"<{ev.metadata_id}>"
                dur = ev.duration_ps
                groups[name][0] += dur
                groups[name][1] += 1
                total_ps += dur
    if not groups:
        print(f"  (no device op events in {os.path.basename(path)})")
        return
    scale = 1e-6 / max(per_iter, 1)  # ps -> us, per iteration
    print(f"  device total: {total_ps * 1e-6 / max(per_iter, 1):,.0f} us"
          f"{' /iter' if per_iter > 1 else ''}")
    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])[:top]
    for name, (ps, n) in rows:
        print(f"  {ps * scale:9.1f} us  {n / max(per_iter, 1):6.1f}x  "
              f"{ps / total_ps * 100:5.1f}%  {name[:100]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", help="dir passed to jax.profiler.trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--per-iter", type=int, default=1,
                    help="divide totals by this (traced iterations)")
    ap.add_argument("--line-filter", default=None,
                    help="only lines whose name contains this substring")
    args = ap.parse_args()

    pbs = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
    ))
    if not pbs:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}")
    for pb in pbs:
        print(f"== {pb}")
        summarize(pb, args.top, args.per_iter, args.line_filter)


if __name__ == "__main__":
    main()

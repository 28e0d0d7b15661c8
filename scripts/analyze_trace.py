#!/usr/bin/env python
"""Aggregate a jax.profiler trace into a per-kernel time table.

Consumes the xplane protobuf that `jax.profiler.start_trace` writes
(plugins/profile/<ts>/*.xplane.pb) via tensorflow's profiler proto (bundled
with the baked-in TF install; falls back to the perfetto trace.json.gz if
present). Prints the top-N device ops by total self time — the input the
round-3 roofline attack needs (the replan saturates neither FLOPs nor HBM,
so the time must be living in specific small kernels / gaps).

  python scripts/analyze_trace.py --trace-dir logs/prof_r3 [--top 30]
"""
import argparse
import collections
import glob
import gzip
import json
import os


def from_xplane(path, top):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    device = [p for p in xs.planes
              if "device" in p.name.lower() or "tpu" in p.name.lower()]
    if not device:  # CPU runs put compute on the host plane
        device = [p for p in xs.planes
                  if sum(len(ln.events) for ln in p.lines)]
    rows = collections.Counter()
    total = 0
    for plane in device:
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ps / 1e9  # -> ms
                rows[ev_names.get(ev.metadata_id, "?")] += dur
                total += dur
    return rows, total


def from_perfetto(path, top):
    with gzip.open(path, "rt") as f:
        t = json.load(f)
    rows = collections.Counter()
    total = 0
    for ev in t.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            rows[ev.get("name", "?")] += ev["dur"] / 1e3  # us -> ms
            total += ev["dur"] / 1e3
    return rows, total


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trace-dir", required=True)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    xplanes = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.xplane.pb"), recursive=True))
    perfetto = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if xplanes:
        rows, total = from_xplane(xplanes[-1], args.top)
        src = xplanes[-1]
    elif perfetto:
        rows, total = from_perfetto(perfetto[-1], args.top)
        src = perfetto[-1]
    else:
        raise SystemExit(f"no xplane.pb or trace.json.gz under {args.trace_dir}")

    print(f"# {src}: {total:.1f} ms total device-track time")
    table = []
    for name, ms in rows.most_common(args.top):
        pct = 100 * ms / total if total else 0
        table.append({"op": name, "ms": round(ms, 3), "pct": round(pct, 1)})
        print(f"{ms:10.3f} ms  {pct:5.1f}%  {name[:110]}")
    if args.out:
        json.dump({"source": src, "total_ms": round(total, 2),
                   "top": table}, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

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
import re
import glob
import gzip
import json
import os


# control-flow wrapper ops whose durations INCLUDE their body ops — summing
# them alongside the leaf kernels double-counts the whole loop
_WRAPPERS = ("while", "conditional", "call", "fusion-wrapper")


def _leaf_name(hlo: str) -> str:
    """'%fusion.8347 = (bf16[128,64,1024]{...}, ...) fusion(...)' ->
    'fusion bf16[128,64,1024]' — op kind + first result shape, enough to
    recognize the kernel class without 4 KB of HLO text."""
    m = re.match(r"%?([\w.-]+?)(?:\.\d+)? = \(?(\w+\[[\d,]*\])?", hlo)
    if not m:
        return hlo[:60]
    kind, shape = m.group(1), m.group(2) or ""
    return f"{kind} {shape}".strip()


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
    cats = collections.Counter()
    total = n_events = 0
    for plane in device:
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        # only the per-op line: "Steps"/"XLA Modules" wrap whole programs and
        # would triple-count every kernel
        lines = [ln for ln in plane.lines if ln.name == "XLA Ops"] \
            or plane.lines
        for line in lines:
            for ev in line.events:
                raw = ev_names.get(ev.metadata_id, "?")
                kind = re.match(r"%?([a-zA-Z_-]+)", raw)
                kind = kind.group(1) if kind else "?"
                if kind in _WRAPPERS:
                    continue  # body ops are counted individually
                dur = ev.duration_ps / 1e9  # -> ms
                rows[_leaf_name(raw)] += dur
                cats[kind] += dur
                total += dur
                n_events += 1
    return rows, cats, total, n_events


def from_perfetto(path, top):
    with gzip.open(path, "rt") as f:
        t = json.load(f)
    rows = collections.Counter()
    total = n = 0
    for ev in t.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            rows[ev.get("name", "?")] += ev["dur"] / 1e3  # us -> ms
            total += ev["dur"] / 1e3
            n += 1
    return rows, collections.Counter(), total, n


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
        rows, cats, total, n_events = from_xplane(xplanes[-1], args.top)
        src = xplanes[-1]
    elif perfetto:
        rows, cats, total, n_events = from_perfetto(perfetto[-1], args.top)
        src = perfetto[-1]
    else:
        raise SystemExit(f"no xplane.pb or trace.json.gz under {args.trace_dir}")

    print(f"# {src}: {total:.1f} ms leaf-kernel time over {n_events} events")
    table = []
    for name, ms in rows.most_common(args.top):
        pct = 100 * ms / total if total else 0
        table.append({"op": name, "ms": round(ms, 3), "pct": round(pct, 1)})
        print(f"{ms:10.3f} ms  {pct:5.1f}%  {name[:110]}")
    cat_table = []
    print("# by op kind:")
    for name, ms in cats.most_common(20):
        pct = 100 * ms / total if total else 0
        cat_table.append({"kind": name, "ms": round(ms, 3),
                          "pct": round(pct, 1)})
        print(f"{ms:10.3f} ms  {pct:5.1f}%  {name}")
    if args.out:
        json.dump({"source": src, "total_ms": round(total, 2),
                   "n_events": n_events, "top": table,
                   "by_kind": cat_table}, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Summarize a jax.profiler xplane trace: per-op time table.

The tracing subsystem (core/profiling.py, --profile_dir) writes TensorBoard
XPlane traces; this tool aggregates them without needing the TensorBoard UI
(the installed tensorboard-plugin-profile wheel is ABI-mismatched with TF, so
we parse the XSpace proto directly via tensorflow.tsl).

Usage:
    python tools/analyze_trace.py <logdir-or-xplane.pb> [--top 30]
                                  [--plane TPU]

Device planes (e.g. "/device:TPU:0") carry one event per executed HLO op —
summing durations by name gives the op-level breakdown used for kernel
triage. Host planes are nested (thread call stacks); the same aggregation is
then an inclusive-time approximation, still useful for spotting stalls.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_xspaces(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(
            path, "**", "*.xplane.pb"), recursive=True))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {path}")
    spaces = []
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        spaces.append((f, xs))
    return spaces


def aggregate(spaces, plane_filter: str | None):
    """-> {plane_name: {event_name: [total_ps, count]}}"""
    out = {}
    for _, xs in spaces:
        for plane in xs.planes:
            if plane_filter and plane_filter.lower() not in plane.name.lower():
                continue
            names = {i: m.name for i, m in plane.event_metadata.items()}
            agg = out.setdefault(plane.name, defaultdict(lambda: [0, 0]))
            for line in plane.lines:
                for ev in line.events:
                    name = names.get(ev.metadata_id, f"#{ev.metadata_id}")
                    agg[name][0] += ev.duration_ps
                    agg[name][1] += 1
    return out


def report(agg, top: int) -> str:
    lines = []
    for plane, events in agg.items():
        if not events:
            continue
        total_ms = sum(v[0] for v in events.values()) / 1e9
        lines.append(f"\n== {plane}  ({len(events)} distinct events, "
                     f"{total_ms:.1f} ms summed)")
        lines.append(f"{'time_ms':>10}  {'share':>6}  {'count':>8}  name")
        ranked = sorted(events.items(), key=lambda kv: -kv[1][0])[:top]
        for name, (ps, n) in ranked:
            ms = ps / 1e9
            lines.append(f"{ms:10.3f}  {100 * ps / max(sum(v[0] for v in events.values()), 1):5.1f}%  "
                         f"{n:8d}  {name[:100]}")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser("xplane trace summary")
    ap.add_argument("path", help="trace logdir or a .xplane.pb file")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default=None,
                    help="substring filter on plane name (e.g. TPU)")
    args = ap.parse_args()
    spaces = load_xspaces(args.path)
    print(f"loaded {len(spaces)} xspace file(s)")
    print(report(aggregate(spaces, args.plane), args.top))


if __name__ == "__main__":
    sys.exit(main())

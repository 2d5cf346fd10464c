#!/usr/bin/env python
"""Summarize device-side op time from a jax.profiler trace.

The axon tunnel makes host-side timing treacherous (`jax.block_until_ready`
is a no-op there — see CLAUDE.md), so the profiler trace is the ground
truth for where a step's device time goes.  Point this at the directory
passed to ``jax.profiler.start_trace`` (e.g. ``tools/profile_step.py
--trace-dir DIR``); it finds ``*.trace.json.gz`` (chrome-trace format),
keeps only events on the device lane, strips XLA's numeric fusion suffixes,
and prints per-category totals divided by the number of traced steps.

usage: python tools/trace_report.py DIR [--steps N] [--top K] [--raw]

--steps divides totals to per-step numbers (default: infer from the
repetition count of the largest jit span); --raw lists the biggest
individual events with their HLO long names instead (for chasing one
specific copy/fusion).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        sys.exit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev = {p for p, n in names.items() if "TPU" in n or "device" in n}
    return [e for e in events
            if e.get("ph") == "X" and e.get("pid") in dev], names


_JIT = re.compile(r"^jit_?\w*\(\d+\)$|^jit__unknown")
_NUM = re.compile(r"^\d+$")


def jit_device_ms(trace_dir, steps=None):
    """Average DEVICE duration (ms) of the dominant top-level jit span in
    ``trace_dir`` — the trustworthy per-call time on axon (host-side
    timing there is polluted by variable tunnel RPC latency; CLAUDE.md).
    ``steps`` overrides the divisor (defaults to the span count)."""
    events, _ = load_events(trace_dir)
    jit_spans = [e for e in events if _JIT.match(e["name"])]
    if not jit_spans:
        return float("nan")
    # dominant by TOTAL device time, not count: tiny helper jits (e.g.
    # jit_convert_element_type) can tie the span count
    totals, counts = collections.Counter(), collections.Counter()
    for e in jit_spans:
        totals[e["name"]] += e.get("dur", 0)
        counts[e["name"]] += 1
    top_name, total = totals.most_common(1)[0]
    return (total / 1e3) / (steps or counts[top_name])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--steps", type=int, default=0,
                   help="traced step count (default: inferred)")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--raw", action="store_true",
                   help="largest individual events with HLO long names")
    args = p.parse_args()

    events, names = load_events(args.trace_dir)
    print("device lanes:", {p: n for p, n in names.items()
                            if "TPU" in n or "device" in n})

    if args.raw:
        rows = sorted(events, key=lambda e: -e.get("dur", 0))[:args.top]
        for e in rows:
            long = e.get("args", {}).get("long_name", "")
            print(f"{e.get('dur', 0) / 1e3:8.3f} ms  {e['name']:30s} "
                  f"{long[:120]}")
        return

    # infer steps: the top-level jit span's repetition count
    jit_spans = [e for e in events if _JIT.match(e["name"])]
    steps = args.steps or (max(
        collections.Counter(e["name"] for e in jit_spans).values())
        if jit_spans else 1)

    agg, cnt = collections.Counter(), collections.Counter()
    jit_total = 0.0
    for e in events:
        name = e["name"]
        dur = e.get("dur", 0) / 1e3
        if _JIT.match(name):
            jit_total += dur
            continue
        if _NUM.match(name):  # per-step numbered spans
            continue
        base = re.sub(r"\.\d+(\.clone)?$", "", name)
        agg[base] += dur
        cnt[base] += 1

    print(f"steps traced: {steps}   "
          f"top-level jit device time: {jit_total / steps:.3f} ms/step")
    print(f"{'category':40s} {'ms/step':>8s} {'n/step':>7s}")
    shown = 0.0
    for base, ms in agg.most_common(args.top):
        shown += ms
        print(f"{base:40s} {ms / steps:8.3f} {cnt[base] / steps:7.1f}")
    rest = sum(agg.values()) - shown
    if rest > 0:
        print(f"{'(other)':40s} {rest / steps:8.3f}")


if __name__ == "__main__":
    main()

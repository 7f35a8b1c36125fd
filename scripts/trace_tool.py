"""jax.profiler trace capture + flat aggregation (no TensorBoard needed).

`capture(fn)` runs fn under jax.profiler.trace and returns the trace dir;
`aggregate(trace_dir)` parses the trace.json.gz and sums device-track op
durations by fusion/op name, printing the top offenders.  This is how the
per-step numbers in docs/KERNELS.md were attributed.

Usage as a module:
    from scripts.trace_tool import capture, aggregate
    aggregate(capture(lambda: run_one_step()))
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict


def capture(fn, trace_dir: str | None = None) -> str:
    import jax

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    with jax.profiler.trace(trace_dir):
        fn()
    return trace_dir


def _load_events(trace_dir: str):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def aggregate(trace_dir: str, top: int = 25, device_only: bool = True,
              out=sys.stderr):
    """Sum durations of complete events by (sanitized) name; device tracks
    are selected by their process name containing 'TPU'/'TensorCore'."""
    events = _load_events(trace_dir)
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_device(pid, tid):
        p = proc_names.get(pid, "")
        t = thread_names.get((pid, tid), "")
        return ("TPU" in p or "TensorCore" in p or
                "XLA Op" in t or "Steps" in t)

    totals = defaultdict(float)
    counts = defaultdict(int)
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_only and not is_device(e.get("pid"), e.get("tid")):
            continue
        t = thread_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Op" not in t and "Ops" not in t:
            continue
        name = re.sub(r"\.\d+", "", e["name"])  # fusion.123 -> fusion
        name = e["name"] if name in ("fusion", "copy") else name
        totals[name] += e["dur"]
        counts[name] += 1
        wall += e["dur"]
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    print(f"-- device op time total {wall/1e3:.1f} ms "
          f"({len(totals)} distinct ops) --", file=out)
    for name, dur in rows:
        print(f"{dur/1e3:9.2f} ms  x{counts[name]:<5d} {name[:90]}",
              file=out)
    return totals


if __name__ == "__main__":
    aggregate(sys.argv[1], top=int(sys.argv[2]) if len(sys.argv) > 2 else 25)

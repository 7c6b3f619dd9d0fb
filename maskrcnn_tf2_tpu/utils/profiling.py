"""Tracing/profiling helpers (aux subsystem; reference had only a
TensorBoard callback with profile_batch='1,2', training.py:131-134).

``trace(fn)`` captures a jax.profiler trace; ``top_ops`` parses the xplane
proto (via tensorflow's bundled profiler protos) into (op_name, total_us)
rows so hotspots are inspectable without TensorBoard.
"""

from __future__ import annotations

import glob
import gzip
import os
import tempfile
from collections import defaultdict
from typing import Callable, List, Tuple

import jax


def trace(fn: Callable[[], None], trace_dir: str | None = None) -> str:
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="mrcnn_trace_")
    jax.profiler.start_trace(trace_dir)
    try:
        fn()
    finally:
        jax.profiler.stop_trace()
    return trace_dir


def top_ops(trace_dir: str, k: int = 25, device_only: bool = True) -> List[Tuple[str, float]]:
    """Aggregate event durations (us) by name from the Chrome-trace dump."""
    import json

    totals: dict = defaultdict(float)
    for path in glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    ):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            proc = pid_names.get(ev.get("pid"), "")
            if device_only and not ("TPU" in proc or "tpu" in proc.lower()):
                continue
            totals[ev["name"]] += ev["dur"]
    return sorted(totals.items(), key=lambda kv: -kv[1])[:k]


def print_top_ops(trace_dir: str, k: int = 25):
    for name, us in top_ops(trace_dir, k):
        print(f"{us / 1e3:10.3f} ms  {name[:120]}")

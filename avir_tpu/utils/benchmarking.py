"""Benchmark timing utilities.

``device_ms`` measures on-chip execution time from a JAX profiler trace
(sum of device-lane op durations / iterations).  This isolates TPU
compute from host-side dispatch: in tunneled single-chip dev setups each
dispatch pays a fixed multi-ms RTT that a production (local-PCIe/pod)
deployment does not.  Falls back to wall-clock timing when no device
trace is produced (e.g. CPU backend).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import shutil
import tempfile
import time


def wall_ms(fn, *args, n: int = 10) -> float:
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def device_ms(fn, *args, n: int = 10) -> tuple[float, dict]:
    """Per-iteration on-device time in ms plus a per-op breakdown.

    Returns (total_ms, {op_name: ms}); falls back to (wall_ms, {}) when
    the profiler yields no device events.
    """
    import jax

    out = fn(*args)
    jax.block_until_ready(out)

    trace_dir = tempfile.mkdtemp(prefix="avir_prof_")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
        paths = sorted(
            glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
        )
        if not paths:
            return wall_ms(fn, *args, n=n), {}
        with gzip.open(paths[-1]) as f:
            tr = json.load(f)
        device_pids = {
            p.get("pid")
            for p in tr["traceEvents"]
            if p.get("name") == "process_name"
            and "TPU" in str(p.get("args", {}).get("name"))
        }
        total = 0
        ops = collections.Counter()
        for e in tr["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in device_pids:
                if e["name"].startswith("jit_"):
                    total += e["dur"]
                else:
                    ops[e["name"]] += e["dur"]
        if total == 0:
            return wall_ms(fn, *args, n=n), {}
        return total / 1e3 / n, {k: v / 1e3 / n for k, v in ops.items()}
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)

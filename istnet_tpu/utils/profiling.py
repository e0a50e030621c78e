"""Tracing / profiling helpers.

The reference's only tracing is manual wall-clock T_data/T_forward/T_backward
logging (``utils/solver.py:78-106``); the Solver here logs the same breakdown.
This module adds the TPU-native upgrades:

- ``trace(log_dir)``: context manager around ``jax.profiler`` — produces an
  xplane trace viewable in TensorBoard / Perfetto.
- ``timed(fn)``: wall-clock timing with a FORCED device-to-host sync. Plain
  ``block_until_ready`` does not actually block through tunneled TPU backends
  (verified: reports 260x fiction) — always sync via a scalar D2H read.
- ``parse_trace(log_dir)`` / ``aggregate_ops(...)``: kernel-level attribution
  WITHOUT the (version-broken in this image) tensorboard profiler plugin: the
  trace's ``*.trace.json.gz`` carries the device plane ("XLA Ops" thread) with
  per-op device durations, HLO categories, FLOPs and bytes — parse it directly.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs) -> float:
    """Mean seconds per call with forced D2H sync each iteration."""
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args, **kwargs))
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# Device-plane trace parsing (kernel-level attribution)
# ---------------------------------------------------------------------------

def parse_trace(log_dir: str) -> list[dict]:
    """Device-op events from the newest trace under ``log_dir``.

    Returns one dict per "XLA Ops" event: ``{name, dur_us, category, tf_op,
    flops, bytes, occurrences}``-ready raw rows (un-aggregated).
    """
    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # find the device pid and its "XLA Ops" tid
    device_pids = set()
    ops_tids = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        args = e.get("args") or {}
        if e.get("name") == "process_name" and "TPU" in str(args.get("name", "")):
            device_pids.add(e.get("pid"))
        if e.get("name") == "thread_name" and args.get("name") == "XLA Ops":
            ops_tids[e.get("pid")] = e.get("tid")

    rows = []
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and e.get("tid") == ops_tids.get(e.get("pid"))):
            a = e.get("args") or {}
            rows.append({
                "name": e.get("name", ""),
                "dur_us": float(e.get("dur", 0.0)),
                "category": a.get("hlo_category", ""),
                "tf_op": a.get("tf_op", ""),
                "source": (a.get("source_stack") or a.get("source") or
                           "").split("\n")[0],
                "flops": int(a.get("model_flops", 0) or 0),
                "bytes": int(a.get("bytes_accessed", 0) or 0),
            })
    return rows


def aggregate_ops(rows: list[dict], key: str = "tf_op", top: int = 30,
                  calls: int = 1) -> list[dict]:
    """Aggregate device-op rows by ``key``; adds MFU/bandwidth estimates.

    ``calls``: number of identical timed invocations in the trace — durations
    are divided by it so results are per-call.
    """
    agg: dict[str, dict] = {}
    for r in rows:
        k = r.get(key) or r["name"]
        a = agg.setdefault(k, {"key": k, "dur_us": 0.0, "flops": 0,
                               "bytes": 0, "n": 0, "category": r["category"],
                               "source": r["source"]})
        a["dur_us"] += r["dur_us"]
        a["flops"] += r["flops"]
        a["bytes"] += r["bytes"]
        a["n"] += 1
    out = sorted(agg.values(), key=lambda a: -a["dur_us"])[:top]
    for a in out:
        a["dur_us"] = round(a["dur_us"] / calls, 1)
        a["n"] = a["n"] // calls or a["n"]
        sec = a["dur_us"] * 1e-6
        a["tflops"] = round(a["flops"] / calls / sec / 1e12, 1) if sec else 0.0
        a["gbps"] = round(a["bytes"] / calls / sec / 1e9, 0) if sec else 0.0
        del a["flops"], a["bytes"]
    return out

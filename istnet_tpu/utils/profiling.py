"""Tracing / profiling helpers.

The reference's only tracing is manual wall-clock T_data/T_forward/T_backward
logging (``utils/solver.py:78-106``); the Solver here logs the same breakdown.
This module adds the TPU-native upgrades:

- ``trace(log_dir)``: context manager around ``jax.profiler`` — produces an
  xplane trace viewable in TensorBoard / Perfetto.
- ``timed(fn)``: wall-clock timing with a FORCED device-to-host sync. Plain
  ``block_until_ready`` does not actually block through tunneled TPU backends
  (verified: reports 260x fiction) — always sync via a scalar D2H read.
"""

from __future__ import annotations

import contextlib
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

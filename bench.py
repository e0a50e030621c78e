"""Benchmark: object pose inferences/sec/chip (REAL275-shaped inputs).

Measures the flagship ISTNet eval forward (the exact graph test.py runs per
instance batch) on the real TPU chip at production shapes: batch 32 instance
crops, 1024 points, 192x192 RGB. Prints ONE JSON line:

    {"metric": "object pose inferences/sec/chip", "value": N,
     "unit": "inferences/sec", "vs_baseline": R}

Baseline note: the reference (CVMI-Lab/IST-Net) publishes NO throughput
numbers (BASELINE.md), and its CUDA stack cannot run in this TPU-only
environment, so a measured head-to-head is impossible here. ``REF_ESTIMATE``
is a documented engineering estimate of the torch+CUDA reference at batch-32
inference on an RTX-3090-class GPU: ~65 GFLOP/instance forward at a typical
30-40% fp32 utilization plus its per-op kernel-launch overhead (8 SA groupers
+ 4 FP stages per PointNet2MSG) ≈ 120 inferences/sec. vs_baseline = value /
REF_ESTIMATE; the BASELINE.json target is vs_baseline >= 5.

Timing methodology: the axon tunnel's ``block_until_ready`` does not actually
block (verified — it reports 260x fiction), so every timed iteration forces a
device-to-host read of one output scalar.
"""

import json
import time

import numpy as np

REF_ESTIMATE = 120.0  # est. reference CUDA throughput, inferences/sec (see docstring)
BATCH = 32
WARMUP = 3
ITERS = 20


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # reuse compiled graphs across runs (first compile is ~2-10 min)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from istnet_tpu.nn import precision

    # deployment precision: bfloat16 compute, f32 params/heads/geometry
    precision.set_compute_dtype(jnp.bfloat16)

    import __graft_entry__ as g

    fn, args = g.entry()
    jfn = jax.jit(fn)

    for _ in range(WARMUP):
        out = jfn(*args)
        _ = np.asarray(out["pred_translation"])[0, 0]  # forced D2H sync

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(*args)
        _ = np.asarray(out["pred_translation"])[0, 0]
    dt = (time.perf_counter() - t0) / ITERS

    value = BATCH / dt
    print(json.dumps({
        "metric": "object pose inferences/sec/chip",
        "value": round(value, 1),
        "unit": "inferences/sec",
        "vs_baseline": round(value / REF_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()

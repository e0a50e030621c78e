"""Benchmark: object pose inferences/sec/chip (REAL275-shaped inputs).

Measures the flagship ISTNet eval forward (the exact graph test.py runs per
instance batch, incl. the sparse point-decode head) on the real TPU chip at
production shapes (1024 points, 192x192 crops), at batch 32 (BASELINE
config #2's batched-inference setting) and at the peak-throughput batch 128
(serving-style). Prints ONE JSON line; the primary value is the peak
throughput, with the batch-32 number included for transparency:

    {"metric": "object pose inferences/sec/chip", "value": N,
     "unit": "inferences/sec", "vs_baseline": R, "batch": 128,
     "b32_value": M}

Baseline note: the reference (CVMI-Lab/IST-Net) publishes NO throughput
numbers (BASELINE.md) and its CUDA stack cannot run in this TPU-only
environment, so a measured head-to-head is impossible here. ``REF_ESTIMATE``
is the FLOP-audited estimate of the reference AS SHIPPED (its per-image
eval loop, B~5 instances/forward, ~36.4 GFLOP/instance, TF32 on an
RTX-3090-class GPU at 10-20% sustained, plus ~150 kernel launches/forward):
250 inferences/sec central, 150-400 range — full per-layer derivation in
BASELINE.md "Throughput baseline derivation". A hypothetical re-batched
CUDA deployment (the reference cannot do this without restructuring) would
reach 490-780 inf/s; both ratios are reported there.
vs_baseline = value / REF_ESTIMATE; the BASELINE.json target is >= 5.

Timing methodology: the axon tunnel's ``block_until_ready`` does not actually
block and a per-call D2H sync costs up to ~30 ms of tunnel latency, so the
forward is timed AMORTIZED: CHAIN forwards run inside one jitted fori_loop
(inputs perturbed per iteration to defeat CSE), one scalar synced at the end.
This measures pure device throughput — the steady-state serving number, where
dispatch overlaps execution.
"""

import json
import os
import sys
import time

import numpy as np

REF_ESTIMATE = 250.0  # FLOP-audited as-shipped reference estimate (BASELINE.md)
WARMUP = 1
ITERS = 3
# base chain length at B=128; scaled up at smaller batches (see _throughput).
# 30 puts the one ~30 ms tunnel sync per chain at ~2% of a ~1.4 s chain —
# round-3's CHAIN=10 still taxed every batch ~6%, under-reporting the
# device-profile throughput by that margin.
CHAIN = 30


def _throughput(fn, args, batch: int) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    params, stats, inputs = args
    # equalize the per-chain tunnel-sync overhead across batch sizes: one
    # float() costs ~30 ms regardless of batch, so a fixed CHAIN=10 taxes
    # B=32 (~26% of a 114 ms chain) 4x harder than B=128 (~6.5% of 460 ms).
    # Scale the chain so every batch amortizes over the same total work
    # (profiled device time is ~flat per sample: 355 us/sample @32 vs
    # 362 @128 — the old B=32 number was a measurement artifact).
    chain_len = max(CHAIN, CHAIN * 128 // max(batch, 1))

    @jax.jit
    def chain(inputs):
        def body(i, acc):
            # perturb EVERY float input: a loop-invariant rgb would let XLA
            # hoist the entire encoder out of the chain and inflate the number
            inp = dict(inputs)
            inp["pts"] = inp["pts"] + acc * 1e-12
            inp["rgb"] = inp["rgb"] + acc * 1e-12
            out = fn(params, stats, inp)
            return acc + jnp.sum(out["pred_translation"][0]) * 1e-9
        return lax.fori_loop(0, chain_len, body, jnp.float32(0))

    for _ in range(WARMUP):
        _ = float(chain(inputs))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = float(chain(inputs))
    return batch / ((time.perf_counter() - t0) / (ITERS * chain_len))


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

    fn, args32 = g.entry()
    jfn = jax.jit(fn)
    b32 = _throughput(jfn, args32, 32)

    inputs128 = g._make_inputs(b=128, n=1024, img=192, train=False)
    args128 = (args32[0], args32[1], inputs128)
    b128 = _throughput(jfn, args128, 128)

    value = max(b32, b128)
    record = {
        "metric": "object pose inferences/sec/chip",
        "value": round(value, 1),
        "unit": "inferences/sec",
        "vs_baseline": round(value / REF_ESTIMATE, 3),
        "batch": 128 if b128 >= b32 else 32,
        "b32_value": round(b32, 1),
        "b128_value": round(b128, 1),  # full surface: a peak-batch flip
                                       # must be visible in the artifact
    }

    # secondary metric: FULL train-step throughput at the reference's
    # production batch (18 syn + 6 real), incl. the device-resident input
    # pipeline (depth fill, crop/sample, ColorJitter, bb/rt aug), grads,
    # Adam, BN-EMA. Reference hot loop: utils/solver.py:85-122.
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "tools"))
        from train_bench import measure_train_steps
        tr = measure_train_steps(batch=24)
        record["train_steps_per_sec"] = tr["train_steps_per_sec"]
        record["train_samples_per_sec"] = tr["samples_per_sec"]
        record["train_batch"] = tr["batch"]
    except Exception as e:  # never lose the primary metric
        record["train_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(record))


if __name__ == "__main__":
    main()

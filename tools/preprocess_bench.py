"""Stage-level microbench of the device training input pipeline on real TPU.

Breaks the ~236 ms preprocessing cost (train step: 330 ms with, 94 ms
without) into: fill_missing_tpu, instance crop/sample/resize, ColorJitter.

Usage: python tools/preprocess_bench.py [--batch 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 8
ITERS = 3


def timed_chain(fn, args, perturb, extract) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(args):
        def body(i, acc):
            out = fn(perturb(args, acc, i))
            return acc + extract(out)
        return lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    _ = float(chain(args))
    _ = float(chain(args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = float(chain(args))
    return (time.perf_counter() - t0) / (ITERS * CHAIN)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from tools.train_bench import make_synth_raw_batch

    b = args.batch
    raw = jax.tree_util.tree_map(jnp.asarray, make_synth_raw_batch(b))
    results = {"batch": b}

    from istnet_tpu.data.device_preprocess import (fill_missing_tpu,
                                                   preprocess_train_instances_tpu)
    from istnet_tpu.data.device_transforms import color_jitter_batch

    # 1. depth completion
    dt = timed_chain(lambda d: fill_missing_tpu(d, 1000.0, 1.0), raw["depth_raw"],
                     lambda d, acc, i: d + (i % 2).astype(jnp.float32) * 1e-4,
                     lambda o: jnp.sum(o[:, 0, 0]) * 1e-9)
    results["fill_ms"] = round(dt * 1e3, 2)

    # 2. crop + sample + backproject + resize + jitter + qo (normalize off)
    filled = jax.jit(lambda d: fill_missing_tpu(d, 1000.0, 1.0))(raw["depth_raw"])

    def run_pre(a):
        d, k = a
        return preprocess_train_instances_tpu(
            raw["rgb_raw"], d, raw["mask_raw"], raw["bbox"],
            raw["intrinsics"], raw["rotation_label"], raw["translation_label"],
            raw["size_label"], k, normalize=False)

    dt = timed_chain(run_pre, (filled, jax.random.PRNGKey(0)),
                     lambda a, acc, i: (a[0] + (i % 2).astype(jnp.float32) * 1e-4,
                                        jax.random.fold_in(a[1], i)),
                     lambda o: jnp.sum(o["pts"][:, 0]) * 1e-6)
    results["instances_ms"] = round(dt * 1e3, 2)

    # 3. ColorJitter on the resized crops
    crops = jnp.asarray(np.random.RandomState(0).rand(b, 192, 192, 3) * 255,
                        jnp.float32)

    def run_cj(a):
        x, k = a
        return color_jitter_batch(x, k)

    dt = timed_chain(run_cj, (crops, jax.random.PRNGKey(1)),
                     lambda a, acc, i: (a[0], jax.random.fold_in(a[1], i)),
                     lambda o: jnp.sum(o[:, 0, 0, 0]) * 1e-9)
    results["colorjitter_ms"] = round(dt * 1e3, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

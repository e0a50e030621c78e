"""Kernel-level profile of the ISTNet eval forward (or train step) on TPU.

Runs the target under ``jax.profiler`` and parses the trace's device plane
directly (the tensorboard profiler plugin is version-broken in this image;
``istnet_tpu.utils.profiling.parse_trace`` reads the ``*.trace.json.gz``
instead). Prints the top device ops by total device time with FLOPs/bandwidth
utilization, aggregated by JAX op path (tf_op).

Usage:
  python tools/profile_fwd.py [--batch 128] [--target fwd|train] [--top 40]
       [--key tf_op|name|category|source]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALLS = 3


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--target", default="fwd", choices=["fwd", "train"])
    p.add_argument("--points", type=int, default=1024,
                   help="points per instance (train target; e.g. 2048)")
    p.add_argument("--freeze", action="store_true",
                   help="freeze_world_enhancer two-phase mode (train target)")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--key", default="tf_op")
    p.add_argument("--json", action="store_true", help="machine-readable output")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from istnet_tpu.nn import precision
    precision.set_compute_dtype(jnp.bfloat16)
    from istnet_tpu.utils import profiling

    import __graft_entry__ as g

    if args.target == "fwd":
        fn, (params, stats, _) = g.entry()
        jfn = jax.jit(fn)
        inputs = g._make_inputs(b=args.batch, n=1024, img=192, train=False)

        def run():
            out = jfn(params, stats, inputs)
            return float(out["pred_translation"][0, 0])
    else:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from train_bench import make_synth_raw_batch
        from istnet_tpu.data.device_augment import device_augment
        from istnet_tpu.data.device_preprocess import make_train_preprocess
        from istnet_tpu.models.ist_net import ISTNet, supervised_loss
        from istnet_tpu.train.train_state import (create_train_state,
                                                  make_optimizer, make_train_step)
        from istnet_tpu.utils.config import Config

        model = ISTNet(nclass=6, freeze_world_enhancer=args.freeze)
        dummy = g._make_inputs(b=1, n=args.points, img=192, train=True)
        variables = jax.jit(model.init, static_argnames="train")(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            dummy, train=True)
        cfg = Config({"optimizer": {"name": "Adam", "lr": 0.01, "weight_decay": 0},
                      "max_epoch": 30,
                      "bn": {"bn_momentum": 0.9, "bn_decay": 0.5,
                             "decay_step": 4000, "bnm_clip": 0.01}})
        tx, _ = make_optimizer(cfg, 4000, variables["params"])
        step_fn = make_train_step(
            model, lambda e, l: supervised_loss(
                e, l, 1.0, 100.0 if args.freeze else 10.0, args.freeze),
            tx, cfg.bn, augment_fn=lambda bt, r: device_augment(bt, r),
            preprocess_fn=make_train_preprocess(sample_num=args.points))
        state_box = [create_train_state(variables["params"],
                                        variables["batch_stats"], tx)]
        batch = jax.tree_util.tree_map(jnp.asarray,
                                       make_synth_raw_batch(args.batch))
        rng_key = jax.random.PRNGKey(42)
        jstep = jax.jit(step_fn)

        def run():
            state_box[0], metrics = jstep(state_box[0], batch, rng_key)
            return float(metrics["loss"])

    run()  # compile
    run()  # warm

    log_dir = tempfile.mkdtemp(prefix="istnet_prof_")
    try:
        with profiling.trace(log_dir):
            for _ in range(CALLS):
                run()
        rows = profiling.parse_trace(log_dir)
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)

    total_us = sum(r["dur_us"] for r in rows) / CALLS
    agg = profiling.aggregate_ops(rows, key=args.key, top=args.top, calls=CALLS)
    if args.json:
        print(json.dumps({"total_device_ms": round(total_us / 1e3, 2),
                          "batch": args.batch, "ops": agg}))
        return
    print(f"total device time: {total_us / 1e3:.2f} ms/call  "
          f"(batch {args.batch}, {CALLS} calls)")
    print(f"{'us/call':>9}  {'%':>5} {'n':>4} {'TF/s':>6} {'GB/s':>6}  key")
    for a in agg:
        pct = 100.0 * a["dur_us"] / total_us if total_us else 0
        print(f"{a['dur_us']:>9.1f}  {pct:>5.1f} {a['n']:>4} {a['tflops']:>6.1f}"
              f" {a['gbps']:>6.0f}  {a['key'][:110]}")


if __name__ == "__main__":
    main()

"""Real-TPU training-step benchmark (and verify driver) for the full
device-resident pipeline.

Measures steps/sec of the COMPLETE jitted train step at the reference's
production setting (B = 18 syn + 6 real = 24, 1024 points, 192^2 crops,
bf16 compute): on-device preprocessing (depth completion, crop, in-mask
sampling, backprojection, jitter, ColorJitter, qo) + FS-Net bb/rt
augmentation + forward + loss + grads + Adam + BN-EMA. Reference hot loop:
``/root/reference/utils/solver.py:85-122``.

Timing: the axon tunnel's block_until_ready does not block, and per-call D2H
sync costs ~30 ms, so CHAIN steps run inside one jitted fori_loop (state
carried through; raw depth perturbed per iteration to defeat loop-invariant
hoisting of the fill stage) and one scalar is read at the end.

Usage: python tools/train_bench.py [--host-pipeline] [--batch 24]
Prints one JSON line: {"train_steps_per_sec": N, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 10  # short chains leave ~30 ms of tunnel-sync latency / CHAIN in the number
ITERS = 3
WARMUP = 1


def make_synth_raw_batch(b: int, h: int = 480, w: int = 640, seed: int = 0) -> dict:
    """NOCS-shaped raw training batch (device-preprocess mode) from noise."""
    rng = np.random.RandomState(seed)
    depth = np.zeros((b, h, w), np.float32)
    masks = np.zeros((b, h, w), bool)
    bboxes = np.zeros((b, 4), np.int32)
    for i in range(b):
        y0, x0 = rng.randint(40, h - 240), rng.randint(40, w - 240)
        hh, ww = rng.randint(80, 200), rng.randint(80, 200)
        depth[i, y0:y0 + hh, x0:x0 + ww] = 800 + 400 * rng.rand(hh, ww)
        # random holes for the fill stage to complete
        hole = rng.rand(hh, ww) < 0.15
        depth[i, y0:y0 + hh, x0:x0 + ww][hole] = 0
        masks[i, y0 + 5:y0 + hh - 5, x0 + 5:x0 + ww - 5] = True
        bboxes[i] = [y0 + 5, x0 + 5, y0 + hh - 5, x0 + ww - 5]
    rots = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    return {
        "depth_raw": depth,
        "rgb_raw": (rng.rand(b, h, w, 3) * 255).astype(np.uint8),
        "mask_raw": masks,
        "bbox": bboxes,
        "intrinsics": np.tile(np.asarray(
            [591.0125, 590.16775, 322.525, 244.11084], np.float32), (b, 1)),
        "category_label": rng.randint(0, 6, size=b).astype(np.int64),
        "rotation_label": rots,
        "translation_label": np.asarray(
            [[0.0, 0.0, 1.0]] * b, np.float32),
        "size_label": np.abs(rng.rand(b, 3).astype(np.float32)) + 0.05,
        "sym_info": np.zeros((b, 4), np.int32),
    }


def make_host_batch(b: int, n: int = 1024, img: int = 192, seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    inputs = {
        "rgb": rng.rand(b, img, img, 3).astype(np.float32),
        "pts": (rng.randn(b, n, 3) * 0.1).astype(np.float32),
        "choose": rng.randint(0, img * img, size=(b, n)).astype(np.int32),
        "category_label": rng.randint(0, 6, size=(b,)).astype(np.int32),
        "qo": (rng.randn(b, n, 3) * 0.1).astype(np.float32),
        "sym_info": np.zeros((b, 4), np.int32),
    }
    labels = {
        "rotation_label": np.tile(np.eye(3, dtype=np.float32), (b, 1, 1)),
        "translation_label": np.zeros((b, 3), np.float32),
        "size_label": np.ones((b, 3), np.float32),
        "qo": inputs["qo"],
    }
    return {"inputs": inputs, "labels": labels}


def measure_train_steps(batch: int = 24, host_pipeline: bool = False,
                        f32: bool = False, points: int = 1024,
                        freeze: bool = False) -> dict:
    """Measure full-train-step steps/sec on the current default backend.

    Assumes jax is importable and the compilation cache is configured by the
    caller (bench.py / main below)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from istnet_tpu.nn import precision
    if not f32:
        precision.set_compute_dtype(jnp.bfloat16)

    from istnet_tpu.data.device_augment import device_augment
    from istnet_tpu.data.device_preprocess import make_train_preprocess
    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.train.train_state import (create_train_state, make_optimizer,
                                              make_train_step)
    from istnet_tpu.utils.config import Config

    b = batch
    model = ISTNet(nclass=6, freeze_world_enhancer=freeze)
    dummy = {
        "rgb": jnp.zeros((1, 192, 192, 3), jnp.float32),
        "pts": jnp.zeros((1, points, 3), jnp.float32),
        "choose": jnp.zeros((1, points), jnp.int32),
        "category_label": jnp.zeros((1,), jnp.int32),
        "qo": jnp.zeros((1, points, 3), jnp.float32),
    }
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)

    cfg = Config({"optimizer": {"name": "Adam", "lr": 0.01, "weight_decay": 0},
                  "max_epoch": 30,
                  "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": 4000,
                         "bnm_clip": 0.01}})
    tx, _ = make_optimizer(cfg, 4000, variables["params"])
    pre_fn = None if host_pipeline else make_train_preprocess(sample_num=points)
    step_fn = make_train_step(
        model,
        lambda e, l: supervised_loss(e, l, 1.0, 100.0 if freeze else 10.0, freeze),
        tx, cfg.bn,
        augment_fn=lambda bt, r: device_augment(bt, r), preprocess_fn=pre_fn)
    state = create_train_state(variables["params"], variables["batch_stats"], tx)

    if host_pipeline:
        batch = jax.tree_util.tree_map(jnp.asarray, make_host_batch(b, n=points))
    else:
        batch = jax.tree_util.tree_map(jnp.asarray, make_synth_raw_batch(b))

    @jax.jit
    def chain(state, batch, rng):
        def body(i, st):
            bt = dict(batch)
            if "depth_raw" in bt:
                # i-dependent nudge: keeps the fill stage inside the loop
                bt["depth_raw"] = bt["depth_raw"] + (i % 2).astype(jnp.float32) * 1e-4
            else:
                bt = {"inputs": dict(batch["inputs"]), "labels": batch["labels"]}
                bt["inputs"]["pts"] = bt["inputs"]["pts"] + (
                    i % 2).astype(jnp.float32) * 1e-9
            st, _ = step_fn(st, bt, jax.random.fold_in(rng, i))
            return st
        return lax.fori_loop(0, CHAIN, body, state)

    rng = jax.random.PRNGKey(42)
    t_c0 = time.perf_counter()
    out = chain(state, batch, rng)
    _ = float(np.asarray(jax.device_get(out.step)))  # forced D2H sync
    compile_s = time.perf_counter() - t_c0
    for _ in range(WARMUP):
        out = chain(state, batch, rng)
        _ = float(np.asarray(jax.device_get(out.step)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chain(state, batch, rng)
        _ = float(np.asarray(jax.device_get(out.step)))
    dt = (time.perf_counter() - t0) / (ITERS * CHAIN)

    return {
        "train_steps_per_sec": round(1.0 / dt, 3),
        "step_ms": round(dt * 1000, 2),
        "samples_per_sec": round(b / dt, 1),
        "batch": b,
        "pipeline": "host" if host_pipeline else "device",
        "points": points,
        "freeze_world_enhancer": freeze,
        "dtype": "float32" if f32 else "bfloat16",
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--host-pipeline", action="store_true",
                   help="bench the step WITHOUT device preprocessing "
                        "(host-preprocessed inputs) for the breakdown")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--points", type=int, default=1024)
    p.add_argument("--freeze", action="store_true",
                   help="freeze_world_enhancer two-phase mode (BASELINE config #5)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    print(json.dumps(measure_train_steps(args.batch, args.host_pipeline,
                                         args.f32, args.points, args.freeze)))


if __name__ == "__main__":
    main()

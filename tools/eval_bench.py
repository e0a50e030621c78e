"""REAL275-scale eval-loop dry run: measured images/sec over 2,754 images.

NOCS data is not in this image, so the dry run synthesizes a REAL275-sized
test set (2,754 segmentation result pkls — the real set's image count — all
referencing one synthetic scene; the HOST work per image [pkl load, PNG
decodes, depth fill, crops] is identical to the real run) and times:

  - test_func_batched  (host preprocessing, cross-image 64-instance batches)
  - test_func_device   (raw arrays to the chip; fill/crop/sample on device)

Caveat for this environment: the axon tunnel moves host->device bytes at
tunnel speed, which penalizes the device path's raw-image uploads far beyond
a real TPU host's PCIe/DMA. Both numbers are reported; the host-path number
is the environment-robust one.

Usage: python tools/eval_bench.py [--images 2754] [--mode batched|device|both]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_real275_scale_tree(data_dir: str, n_images: int) -> None:
    from istnet_tpu.data.synthetic import write_scene, write_seg_result

    test_dir = os.path.join(data_dir, "data", "Real", "test", "scene_1")
    seg_dir = os.path.join(data_dir, "data", "segmentation_results",
                           "test_trainedwithMask")
    gts = write_scene(test_dir, "00000", seed=0, coord=True)
    for i in range(n_images):
        # unique pkl per image (host pkl-load work identical to a real run)
        write_seg_result(seg_dir, gts, f"{i:05d}", scene="scene_1")
    # every pkl references scene_1/<its stem>; symlink stems to scene 00000
    # so PNG decode work per image is also identical to a real run
    for i in range(1, n_images):
        for suffix in ("_color.png", "_depth.png", "_coord.png"):
            dst = os.path.join(test_dir, f"{i:05d}{suffix}")
            if not os.path.exists(dst):
                os.symlink(os.path.join(test_dir, f"00000{suffix}"), dst)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=2754)  # REAL275 test size
    p.add_argument("--mode", default="batched",
                   choices=("batched", "device", "device_batched", "both", "all"))
    p.add_argument("--eval_batch", type=int, default=64)
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from istnet_tpu.data import TestDataset
    from istnet_tpu.data.dataset import REAL_INTRINSICS
    from istnet_tpu.eval.test_loop import (make_device_forward, test_func_batched,
                                           test_func_device)
    from istnet_tpu.models.ist_net import ISTNet
    from istnet_tpu.nn import precision
    from istnet_tpu.utils.config import Config

    precision.set_compute_dtype(jnp.bfloat16)

    work = tempfile.mkdtemp(prefix="eval_bench_")
    data_dir = os.path.join(work, "data")
    print(f"building {args.images}-image tree under {work} ...", flush=True)
    build_real275_scale_tree(data_dir, args.images)

    cfg = Config({"img_size": 192, "sample_num": 1024})
    model = ISTNet(nclass=6)
    dummy = {"rgb": jnp.zeros((1, 192, 192, 3)), "pts": jnp.zeros((1, 1024, 3)),
             "choose": jnp.zeros((1, 1024), jnp.int32),
             "category_label": jnp.zeros((1,), jnp.int32),
             "qo": jnp.zeros((1, 1024, 3))}
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    results = {"images": args.images}

    if args.mode in ("batched", "both", "all"):
        @jax.jit
        def forward(inputs):
            return model.apply(ev, inputs, train=False)

        ds = TestDataset(cfg, data_dir)
        save = os.path.join(work, "res_batched")
        t0 = time.perf_counter()
        test_func_batched(forward, ds, save, progress=False, batch_size=64,
                          prefetch_workers=4)
        dt = time.perf_counter() - t0
        n = len(os.listdir(save))
        results["batched_images_per_sec"] = round(n / dt, 2)
        results["batched_total_s"] = round(dt, 1)
        print(f"host-batched: {n} images in {dt:.1f}s "
              f"({n / dt:.2f} img/s)", flush=True)

    if args.mode in ("device", "both", "all"):
        ds = TestDataset(cfg, data_dir, device_preprocess=True)
        dfwd = make_device_forward(model, ev, REAL_INTRINSICS)
        save = os.path.join(work, "res_device")
        t0 = time.perf_counter()
        test_func_device(dfwd, ds, save, progress=False)
        dt = time.perf_counter() - t0
        n = len(os.listdir(save))
        results["device_images_per_sec"] = round(n / dt, 2)
        results["device_total_s"] = round(dt, 1)
        print(f"device-pipeline: {n} images in {dt:.1f}s "
              f"({n / dt:.2f} img/s)", flush=True)

    if args.mode in ("device_batched", "all"):
        from istnet_tpu.eval.test_loop import test_func_device_batched
        ds = TestDataset(cfg, data_dir, device_preprocess=True)
        save = os.path.join(work, "res_device_batched")
        t0 = time.perf_counter()
        test_func_device_batched(model, ev, ds, save, REAL_INTRINSICS,
                                 batch_size=args.eval_batch, progress=False)
        dt = time.perf_counter() - t0
        n = len(os.listdir(save))
        results["device_batched_images_per_sec"] = round(n / dt, 2)
        results["device_batched_total_s"] = round(dt, 1)
        print(f"device-batched (x{args.eval_batch}): {n} images in {dt:.1f}s "
              f"({n / dt:.2f} img/s)", flush=True)

    print(json.dumps(results))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Inference + evaluation CLI — mirrors the reference ``test.py:21-43`` surface.

``python -m istnet_tpu.cli.test --config config/ist_net_default.yaml
  --test_epoch 30 [--only_eval] [--vis]``
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description="IST-Net TPU testing")
    p.add_argument("--config", default="config/ist_net_default.yaml")
    p.add_argument("--data_dir", default="data/NOCS")
    p.add_argument("--test_epoch", type=int, default=30)
    p.add_argument("--only_eval", action="store_true",
                   help="skip inference, evaluate existing result pkls")
    p.add_argument("--mask_label", action="store_true",
                   help="surface parity with the reference test.py:38; the "
                        "reference parses but never reads this flag")
    p.add_argument("--torch_checkpoint", default=None,
                   help="evaluate a reference-trained torch .pth (or a "
                        "pre-converted .npz) instead of an Orbax checkpoint — "
                        "converted on the fly by cli/convert_torch_istnet.py")
    p.add_argument("--device_preprocess", action="store_true",
                   help="run depth completion/crop/sampling/resize ON DEVICE, "
                        "fused with the model forward")
    p.add_argument("--eval_batch", type=int, default=None,
                   help="cross-image batched inference at this fixed instance "
                        "batch (test_func_batched: one compiled shape, full "
                        "device batches) instead of per-image buckets")
    p.add_argument("--devices", type=int, default=None,
                   help="data-parallel inference over the first N devices "
                        "(1-D mesh, instance batch sharded); implies "
                        "--eval_batch (default 64), which must divide by N; "
                        "composes with --device_preprocess (sharded "
                        "compaction buffer)")
    p.add_argument("--vis", action="store_true", help="draw detection boxes")
    p.add_argument("--vis_axes", action="store_true",
                   help="axes-arrow box style (vis_utils.py:73-100)")
    p.add_argument("--vis_labels", action="store_true",
                   help="class-name label boxes (vis_utils.py:103-139)")
    p.add_argument("--log_dir", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import numpy as np

    # persistent compile cache: the eval graph costs 1-8 min to build on a
    # small host; reuse it across process restarts (skip if the embedding
    # process — e.g. pytest's conftest — already configured one)
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from istnet_tpu.data import TestDataset
    from istnet_tpu.eval.nocs_map import evaluate
    from istnet_tpu.eval.test_loop import test_func
    from istnet_tpu.models.ist_net import ISTNet
    from istnet_tpu.nn import precision
    from istnet_tpu.train import checkpoints
    from istnet_tpu.utils import Config, get_logger

    cfg = Config.fromfile(args.config)
    exp_name = os.path.splitext(os.path.basename(args.config))[0]
    log_dir = args.log_dir or os.path.join("log", exp_name)
    save_path = os.path.join(log_dir, f"eval_epoch{args.test_epoch}")
    os.makedirs(save_path, exist_ok=True)
    logger = get_logger(path_file=os.path.join(log_dir, f"test_{int(time.time())}.log"))

    if not args.only_eval:
        if cfg.get("compute_dtype", "float32") == "bfloat16":
            import jax.numpy as jnp
            precision.set_compute_dtype(jnp.bfloat16)

        model = ISTNet(nclass=cfg.num_category,
                       freeze_world_enhancer=bool(cfg.get("freeze_world_enhancer", False)),
                       sa_npoints=tuple(cfg.get("sa_npoints", (512, 256, 128, 64))))
        if args.torch_checkpoint:
            from istnet_tpu.cli import convert_torch_istnet as convert
            if args.torch_checkpoint.endswith(".npz"):
                payload = convert.load_npz(args.torch_checkpoint)
            else:
                payload = convert.convert_file(args.torch_checkpoint, "ist_net")
            logger.info(f"converted torch checkpoint {args.torch_checkpoint}")
        else:
            payload = checkpoints.restore_for_eval(
                os.path.join(log_dir, "ckpt"), args.test_epoch)
            logger.info(f"restored epoch {args.test_epoch}")
        variables = {"params": payload["params"], "batch_stats": payload["batch_stats"]}

        if args.device_preprocess:
            from istnet_tpu.data.dataset import REAL_INTRINSICS
            dataset = TestDataset(cfg.test, args.data_dir, device_preprocess=True)
            if args.eval_batch or args.devices:
                # fused device preprocessing AND cross-image instance
                # batching: instances stream through a device-resident
                # compaction buffer, one model forward per eval_batch;
                # --devices shards the buffer rows + forward over a 1-D mesh
                from istnet_tpu.eval.test_loop import test_func_device_batched
                mesh = None
                eval_batch = args.eval_batch or 64
                if args.devices:
                    from istnet_tpu.parallel import mesh as pmesh
                    n_dev = min(args.devices, jax.device_count())
                    if eval_batch % n_dev:
                        raise SystemExit(f"--eval_batch {eval_batch} must "
                                         f"divide by the {n_dev} devices")
                    mesh = pmesh.make_mesh(n_dev)
                logger.info(f"{len(dataset)} test images (device "
                            f"preprocessing, batched x{eval_batch}"
                            + (f", {mesh.devices.size}-device mesh" if mesh
                               else "") + ")")
                test_func_device_batched(
                    model, variables, dataset, save_path, REAL_INTRINSICS,
                    img_size=int(cfg.test.img_size),
                    sample_num=int(cfg.test.sample_num),
                    batch_size=eval_batch, logger=logger, mesh=mesh)
            else:
                from istnet_tpu.eval.test_loop import (make_device_forward,
                                                       test_func_device)
                logger.info(f"{len(dataset)} test images (device preprocessing)")
                dfwd = make_device_forward(model, variables, REAL_INTRINSICS,
                                           img_size=int(cfg.test.img_size),
                                           sample_num=int(cfg.test.sample_num))
                test_func_device(dfwd, dataset, save_path, logger=logger)
        else:
            dataset = TestDataset(cfg.test, args.data_dir)
            logger.info(f"{len(dataset)} test images")

            @jax.jit
            def forward(inputs):
                return model.apply(variables, inputs, train=False)

            n_devices = min(args.devices, jax.device_count()) if args.devices else 0
            if args.devices and n_devices != args.devices:
                logger.warning(f"--devices {args.devices} > available "
                               f"{jax.device_count()}; using {n_devices}")
            if n_devices >= 1 and (args.devices or 0) >= 1:
                # --devices N implies batched inference (even N=1)
                from istnet_tpu.eval.test_loop import test_func_batched
                from istnet_tpu.parallel import mesh as pmesh
                eval_batch = args.eval_batch or 64
                if eval_batch % n_devices:
                    raise SystemExit(f"--eval_batch {eval_batch} must divide "
                                     f"by the {n_devices} usable devices")
                fwd = forward if n_devices == 1 else pmesh.jit_eval_forward_dp(
                    lambda v, inp: model.apply(v, inp, train=False),
                    variables, pmesh.make_mesh(n_devices))
                logger.info(f"DP inference over {n_devices} device(s), "
                            f"batch {eval_batch}")
                test_func_batched(fwd, dataset, save_path, logger=logger,
                                  batch_size=eval_batch)
            elif args.eval_batch:
                from istnet_tpu.eval.test_loop import test_func_batched
                test_func_batched(forward, dataset, save_path, logger=logger,
                                  batch_size=args.eval_batch)
            else:
                test_func(forward, dataset, save_path, logger=logger)

        if args.vis:
            from istnet_tpu.data.dataset import REAL_INTRINSICS
            from istnet_tpu.eval.vis import draw_detections
            import pickle
            k = np.array([[REAL_INTRINSICS[0], 0, REAL_INTRINSICS[2]],
                          [0, REAL_INTRINSICS[1], REAL_INTRINSICS[3]],
                          [0, 0, 1]])
            vis_dir = os.path.join(save_path, "vis")
            for i in range(min(len(dataset), 50)):
                data = dataset[i]
                if data.get("empty"):
                    continue
                with open(os.path.join(save_path, os.path.basename(
                        dataset.result_pkl_list[i])), "rb") as f:
                    result = pickle.load(f)
                draw_detections(data["ori_img"].copy(), vis_dir, "real", i, k,
                                result["pred_RTs"], result["pred_scales"],
                                result["pred_class_ids"],
                                result["gt_RTs"], result["gt_scales"],
                                result["gt_class_ids"],
                                draw_axes=args.vis_axes,
                                draw_labels=args.vis_labels)

    evaluate(save_path, logger=logger)


if __name__ == "__main__":
    main()

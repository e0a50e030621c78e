"""Training CLI — `python -m istnet_tpu.cli.train --config config/ist_net_default.yaml`.

Same surface as the reference ``train.py:20-39`` (``--gpus`` becomes
``--devices``: how many mesh devices to use; data-parallel over all by
default). Wires config -> model -> datasets -> Solver, including the two-phase
frozen-world-enhancer recipe (``train.py:103-118``) and resume
(``--checkpoint_epoch``).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="IST-Net TPU training")
    p.add_argument("--config", default="config/ist_net_default.yaml")
    p.add_argument("--data_dir", default="data/NOCS")
    p.add_argument("--devices", type=int, default=None,
                   help="number of mesh devices (default: all)")
    p.add_argument("--checkpoint_epoch", type=int, default=-1,
                   help="resume from this epoch's checkpoint (-1: fresh)")
    p.add_argument("--pretrained_backbone", default=None,
                   help="npz from cli.convert_torch_resnet: initialize the RGB "
                        "encoder trunk with ImageNet weights (the reference "
                        "uses torchvision pretrained weights, resnet.py:205-214)")
    p.add_argument("--log_dir", default=None)
    return p.parse_args()


def build_model(cfg):
    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.models.posenet_gt import PoseNetGT
    from istnet_tpu.models.posenet_gt import supervised_loss as posenet_loss

    arch = cfg.get("model_arch", "ist_net")
    sa_npoints = tuple(cfg.get("sa_npoints", (512, 256, 128, 64)))
    if arch == "ist_net":
        freeze = bool(cfg.get("freeze_world_enhancer", False))
        model = ISTNet(nclass=cfg.num_category, freeze_world_enhancer=freeze,
                       sa_npoints=sa_npoints)

        def loss_fn(end_points, labels):
            return supervised_loss(end_points, labels,
                                   gamma1=float(cfg.loss.gamma1),
                                   gamma2=float(cfg.loss.gamma2),
                                   freeze_world_enhancer=freeze)

        return model, loss_fn, ("world_enhancer" if freeze else None)
    if arch == "posenet_gt":
        return PoseNetGT(nclass=cfg.num_category, sa_npoints=sa_npoints), posenet_loss, None
    raise ValueError(f"unknown model_arch {arch}")


def init_variables(model, cfg, seed: int):
    import jax.numpy as jnp
    n = int(cfg.train_dataset.sample_num)
    img = int(cfg.train_dataset.img_size)
    dummy = {
        "rgb": jnp.zeros((1, img, img, 3), jnp.float32),
        "pts": jnp.zeros((1, n, 3), jnp.float32),
        "choose": jnp.zeros((1, n), jnp.int32),
        "category_label": jnp.zeros((1,), jnp.int32),
        "qo": jnp.zeros((1, n, 3), jnp.float32),
    }
    return jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
        dummy, train=True)


def main():
    args = parse_args()

    # persistent compile cache: the train step costs minutes to build on a
    # small host; reuse it across process restarts (skip if the embedding
    # process — e.g. pytest's conftest — already configured one)
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    # multi-host rendezvous (pod slices): no-op single-process; a pod run
    # sets JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID (or
    # auto-detects on cloud TPU). MUST precede any backend use.
    from istnet_tpu.parallel import multihost
    multihost.initialize()

    from istnet_tpu.data import DataLoader, TrainingDataset
    from istnet_tpu.nn import precision
    from istnet_tpu.train import checkpoints
    from istnet_tpu.train.solver import Solver
    from istnet_tpu.train.train_state import create_train_state, make_optimizer
    from istnet_tpu.utils import Config, get_logger

    cfg = Config.fromfile(args.config)
    exp_name = os.path.splitext(os.path.basename(args.config))[0]
    log_dir = args.log_dir or os.path.join("log", exp_name)
    os.makedirs(log_dir, exist_ok=True)
    n_proc, proc_id = jax.process_count(), jax.process_index()
    suffix = f"_p{proc_id}" if n_proc > 1 else ""
    logger = get_logger(path_file=os.path.join(
        log_dir, f"train_{int(time.time())}{suffix}.log"))
    logger.info(f"config: {args.config} -> {log_dir}"
                + (f" (process {proc_id}/{n_proc})" if n_proc > 1 else ""))

    if cfg.get("compute_dtype", "float32") == "bfloat16":
        import jax.numpy as jnp
        precision.set_compute_dtype(jnp.bfloat16)

    model, loss_fn, frozen_prefix = build_model(cfg)
    variables = init_variables(model, cfg, int(cfg.get("rd_seed", 1)))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"#parameters: {n_params / 1e6:.2f}M")

    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.pretrained_backbone:
        from istnet_tpu.cli.convert_torch_resnet import load_into_params
        enc = ("rgb_cam_extractor" if cfg.get("model_arch", "ist_net") == "ist_net"
               else "rgb_extractor")
        params, batch_stats = load_into_params(
            params, batch_stats, args.pretrained_backbone, encoder_name=enc)
        logger.info(f"loaded ImageNet backbone from {args.pretrained_backbone}")

    # two-phase recipe: transplant + freeze the world enhancer (train.py:103-118)
    if cfg.get("freeze_world_enhancer", False) and cfg.get("world_enhancer_weights"):
        params, batch_stats = checkpoints.load_world_enhancer(
            cfg.world_enhancer_weights, int(cfg.get("world_enhancer_epoch", 30)),
            params, batch_stats)
        logger.info(f"loaded world enhancer from {cfg.world_enhancer_weights}")

    iters = int(cfg.get("num_mini_batch_per_epoch", 4000))
    tx, _ = make_optimizer(cfg, iters, params, frozen_prefix=frozen_prefix)

    start_epoch, start_state = 1, None
    resume_sharded = None
    par = cfg.get("parallel", {}) or {}
    if args.checkpoint_epoch >= 0 and int(par.get("fsdp", 1)) > 1:
        # FSDP runs saved a SHARDED checkpoint; the Solver restores it
        # straight into the FSDP placement (each process reads only its own
        # shards) after it has built the mesh — no full-state
        # materialization on every host
        resume_sharded = (os.path.join(log_dir, "ckpt"), args.checkpoint_epoch)
        logger.info(f"resuming from epoch {args.checkpoint_epoch} "
                    "(sharded, deferred to Solver)")
    elif args.checkpoint_epoch >= 0:
        template = jax.device_get(create_train_state(params, batch_stats, tx))
        payload = checkpoints.restore_checkpoint(
            os.path.join(log_dir, "ckpt"), args.checkpoint_epoch,
            {"params": template.params, "batch_stats": template.batch_stats,
             "opt_state": template.opt_state, "step": template.step,
             "meta": {"epoch": 0}})
        from istnet_tpu.train.train_state import TrainState
        start_state = TrainState(step=payload["step"], params=payload["params"],
                                 batch_stats=payload["batch_stats"],
                                 opt_state=payload["opt_state"])
        start_epoch = int(payload["meta"]["epoch"]) + 1
        logger.info(f"resumed from epoch {args.checkpoint_epoch}")

    if (cfg.train_dataset.get("use_device_aug", False)
            and cfg.train_dataset.get("use_shape_aug", False)):
        logger.warning("both use_device_aug and use_shape_aug enabled — "
                       "samples would be augmented twice; disable one")

    dl_cfg = cfg.train_dataloader
    iters_per_epoch = int(cfg.get("num_mini_batch_per_epoch", 4000))
    device_pre = bool(cfg.train_dataset.get("use_device_preprocess", False))
    # config batch sizes are GLOBAL; every host loads only its own shard
    # (reference solver feeds the whole batch from one process,
    # solver.py:163-174 — the pod extension divides it per host)
    syn_bs = multihost.per_host_batch_size(int(dl_cfg.syn_bs))
    real_bs = multihost.per_host_batch_size(int(dl_cfg.real_bs))
    # distinct per-host seeds so hosts sample disjoint data streams
    seed0 = int(cfg.get("rd_seed", 1)) + proc_id * 7919
    syn_ds = TrainingDataset(cfg.train_dataset, args.data_dir, data_type="syn",
                             num_img_per_epoch=iters_per_epoch * syn_bs,
                             use_fill_miss=bool(dl_cfg.use_fill_miss),
                             use_composed_img=bool(dl_cfg.use_composed_img),
                             per_obj=dl_cfg.get("per_obj", ""),
                             seed=seed0,
                             device_preprocess=device_pre)
    real_ds = TrainingDataset(cfg.train_dataset, args.data_dir,
                              data_type="real_withLabel",
                              num_img_per_epoch=iters_per_epoch * real_bs,
                              use_fill_miss=bool(dl_cfg.use_fill_miss),
                              use_composed_img=bool(dl_cfg.use_composed_img),
                              per_obj=dl_cfg.get("per_obj", ""),
                              seed=seed0 + 1,
                              device_preprocess=device_pre)
    syn_loader = DataLoader(syn_ds, syn_bs, shuffle=bool(dl_cfg.shuffle),
                            drop_last=bool(dl_cfg.drop_last),
                            num_workers=int(dl_cfg.num_workers))
    real_loader = DataLoader(real_ds, real_bs, shuffle=bool(dl_cfg.shuffle),
                             drop_last=bool(dl_cfg.drop_last),
                             num_workers=int(dl_cfg.num_workers))

    solver = Solver(model, loss_fn, tx, cfg,
                    {"params": params, "batch_stats": batch_stats},
                    syn_loader=syn_loader, real_loader=real_loader,
                    logger=logger, log_dir=log_dir,
                    start_epoch=start_epoch, start_state=start_state,
                    n_devices=args.devices, resume_sharded=resume_sharded)
    solver.solve()


if __name__ == "__main__":
    main()

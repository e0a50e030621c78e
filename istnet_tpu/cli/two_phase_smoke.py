"""One-command smoke run of the FULL two-phase training recipe on synthetic
data — phase-1 (PoseNetGT) -> world-enhancer transplant + freeze -> phase-2
(IST-Net) -> inference -> NOCS mAP evaluation.

The reference recipe (``/root/reference/train.py:103-118``,
``README.md:87-111``): train PoseNetGT 30 epochs, load its
``pts_gt_extractor`` into IST-Net's ``world_enhancer.extractor``, freeze it,
train IST-Net 30 epochs with ``config/ist_net_freeze_world_enhancer.yaml``
(gamma2=100), then ``test.py``. This CLI exercises every step of that path
end-to-end at tiny scale on a generated NOCS-format tree, so the recipe is
validated as a WHOLE (checkpoint format, transplant remap, freeze masking,
eval restore), not just its pieces.

Usage:
    python -m istnet_tpu.cli.two_phase_smoke [--work_dir DIR] [--cpu]

Prints per-phase progress and ``TWO_PHASE_SMOKE OK`` on success.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

PHASE1_CFG = """\
model_arch: posenet_gt
sa_npoints: [32, 16, 8, 8]
optimizer: {{name: Adam, lr: 0.01, betas: [0.5, 0.999], eps: 0.000001, weight_decay: 0}}
bn: {{bn_momentum: 0.9, bn_decay: 0.5, decay_step: 4000, bnm_clip: 0.01}}
max_epoch: 5
num_mini_batch_per_epoch: {iters}
num_category: 6
loss: {{}}
train_dataset:
  img_size: {img}
  sample_num: {pts}
  shift_range: 0.01
  use_shape_aug: True
  use_device_aug: False
  aug_bb_pro: 0.3
  aug_rt_pro: 0.3
  aug_bc_pro: 0.0
  aug_pc_pro: 0.0
  aug_pc_r: 0.002
  aug_nl_pro: 0.0
train_dataloader:
  syn_bs: 2
  real_bs: 2
  num_workers: 1
  shuffle: True
  drop_last: True
  use_fill_miss: True
  use_composed_img: True
  per_obj: ''
rd_seed: 1
per_write: 1
compute_dtype: float32
"""

PHASE2_CFG = """\
model_arch: ist_net
freeze_world_enhancer: True
world_enhancer_weights: {we_ckpt}
world_enhancer_epoch: 5
sa_npoints: [32, 16, 8, 8]
optimizer: {{name: Adam, lr: 0.01, betas: [0.5, 0.999], eps: 0.000001, weight_decay: 0}}
bn: {{bn_momentum: 0.9, bn_decay: 0.5, decay_step: 4000, bnm_clip: 0.01}}
max_epoch: 5
num_mini_batch_per_epoch: {iters}
num_category: 6
loss: {{gamma1: 1.0, gamma2: 100}}
train_dataset:
  img_size: {img}
  sample_num: {pts}
  shift_range: 0.01
  use_shape_aug: False
  use_device_aug: True
  use_device_preprocess: True
  aug_bb_pro: 0.3
  aug_rt_pro: 0.3
  aug_bc_pro: 0.0
  aug_pc_pro: 0.0
  aug_pc_r: 0.002
  aug_nl_pro: 0.0
train_dataloader:
  syn_bs: 2
  real_bs: 2
  num_workers: 1
  shuffle: True
  drop_last: True
  use_fill_miss: True
  use_composed_img: True
  per_obj: ''
test:
  img_size: {img}
  sample_num: {pts}
  test_path:
rd_seed: 1
per_write: 1
compute_dtype: float32
"""


def _run_argv(main_fn, argv: list[str]) -> None:
    old = sys.argv
    sys.argv = argv
    try:
        main_fn()
    finally:
        sys.argv = old


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", default=None,
                   help="where data/configs/logs go (default: a temp dir)")
    p.add_argument("--img_size", type=int, default=48)
    p.add_argument("--sample_num", type=int, default=128)
    p.add_argument("--iters", type=int, default=2, help="iters per epoch")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (8 virtual devices)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from istnet_tpu.cli import test as cli_test
    from istnet_tpu.cli import train as cli_train
    from istnet_tpu.data.synthetic import build_test_tree, build_train_trees

    work = args.work_dir or tempfile.mkdtemp(prefix="two_phase_smoke_")
    data_dir = os.path.join(work, "data")
    os.makedirs(data_dir, exist_ok=True)

    print(f"[two-phase] work dir: {work}", flush=True)
    print("[two-phase] generating synthetic NOCS trees ...", flush=True)
    build_train_trees(data_dir)
    build_test_tree(data_dir)

    fmt = dict(img=args.img_size, pts=args.sample_num, iters=args.iters)
    p1_cfg = os.path.join(work, "posenet_gt_smoke.yaml")
    with open(p1_cfg, "w") as f:
        f.write(PHASE1_CFG.format(**fmt))
    p1_log = os.path.join(work, "log_posenet_gt")

    print("[two-phase] phase 1: PoseNetGT training ...", flush=True)
    _run_argv(cli_train.main, ["train", "--config", p1_cfg,
                               "--data_dir", data_dir, "--log_dir", p1_log])
    we_ckpt = os.path.join(p1_log, "ckpt")
    assert os.path.isdir(we_ckpt), "phase-1 checkpoint missing"

    p2_cfg = os.path.join(work, "ist_net_freeze_smoke.yaml")
    with open(p2_cfg, "w") as f:
        f.write(PHASE2_CFG.format(we_ckpt=we_ckpt, **fmt))
    p2_log = os.path.join(work, "log_ist_net_freeze")

    print("[two-phase] phase 2: IST-Net training (world enhancer "
          "transplanted + frozen; device input pipeline) ...", flush=True)
    _run_argv(cli_train.main, ["train", "--config", p2_cfg,
                               "--data_dir", data_dir, "--log_dir", p2_log])

    print("[two-phase] inference + NOCS mAP evaluation ...", flush=True)
    _run_argv(cli_test.main, ["test", "--config", p2_cfg,
                              "--data_dir", data_dir, "--log_dir", p2_log,
                              "--test_epoch", "5"])

    eval_dir = os.path.join(p2_log, "eval_epoch5")
    pkls = [f for f in os.listdir(eval_dir) if f.endswith(".pkl")]
    assert pkls, "no result pkls written"
    print(f"[two-phase] {len(pkls)} result pkls in {eval_dir}", flush=True)
    print("TWO_PHASE_SMOKE OK", flush=True)


if __name__ == "__main__":
    main()

"""Phase-1 PoseNetGT + the PoseNetGT -> IST-Net world-enhancer transplant."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from istnet_tpu.models.ist_net import ISTNet
from istnet_tpu.models.posenet_gt import PoseNetGT, supervised_loss as posenet_loss
from istnet_tpu.train import checkpoints
from istnet_tpu.train.train_state import create_train_state, make_optimizer
from istnet_tpu.utils.config import Config

TINY = (32, 16, 8, 8)
B, N, IMG = 2, 128, 48


def _inputs():
    rng = np.random.RandomState(0)
    return {
        "rgb": jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32)),
        "pts": jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.1),
        "choose": jnp.asarray(rng.randint(0, IMG * IMG, (B, N)).astype(np.int32)),
        "category_label": jnp.asarray(rng.randint(0, 6, (B,)).astype(np.int32)),
        "qo": jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.1),
    }


def test_posenet_gt_forward_and_loss():
    model = PoseNetGT(nclass=6, sa_npoints=TINY)
    inputs = _inputs()
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, train=True)
    assert "pts_gt_extractor" in variables["params"]
    out, _ = model.apply(variables, inputs, train=True, mutable=["bn_batch"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["pred_rotation"].shape == (B, 3, 3)
    assert out["pts_local_w_gt"].shape == (B, N, 128)
    labels = {"rotation_label": jnp.tile(jnp.eye(3), (B, 1, 1)),
              "translation_label": jnp.zeros((B, 3)),
              "size_label": jnp.ones((B, 3))}
    total, parts = posenet_loss(out, labels)
    assert np.isfinite(float(total))


def test_world_enhancer_transplant(tmp_path):
    """Save a PoseNetGT checkpoint; transplant pts_gt_extractor into a frozen
    IST-Net's world_enhancer.extractor (reference train.py:103-118)."""
    cfg = Config({"optimizer": {"name": "Adam", "lr": 0.01, "betas": [0.5, 0.999],
                                "eps": 1e-6, "weight_decay": 0},
                  "max_epoch": 1,
                  "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": 4000,
                         "bnm_clip": 0.01}})
    inputs = _inputs()

    pose_model = PoseNetGT(nclass=6, sa_npoints=TINY)
    pose_vars = jax.jit(pose_model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        inputs, train=True)
    tx, _ = make_optimizer(cfg, 10, pose_vars["params"])
    state = create_train_state(pose_vars["params"], pose_vars["batch_stats"], tx)
    ckpt_dir = os.path.join(str(tmp_path), "posenet_ckpt")
    checkpoints.save_checkpoint(ckpt_dir, 30, jax.device_get(state))

    ist = ISTNet(nclass=6, freeze_world_enhancer=True, sa_npoints=TINY)
    ist_vars = jax.jit(ist.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        inputs, train=True)

    params, batch_stats = checkpoints.load_world_enhancer(
        ckpt_dir, 30, ist_vars["params"], ist_vars["batch_stats"])

    # transplanted params == saved pts_gt_extractor, for params AND BN stats
    src_p = jax.device_get(pose_vars["params"]["pts_gt_extractor"])
    dst_p = params["world_enhancer"]["extractor"]
    for a, b in zip(jax.tree_util.tree_leaves(src_p), jax.tree_util.tree_leaves(dst_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    src_s = jax.device_get(pose_vars["batch_stats"]["pts_gt_extractor"])
    dst_s = batch_stats["world_enhancer"]["extractor"]
    for a, b in zip(jax.tree_util.tree_leaves(src_s), jax.tree_util.tree_leaves(dst_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # other subtrees untouched
    for key in ("main_estimator", "implicit_transform"):
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ist_vars["params"][key])),
                        jax.tree_util.tree_leaves(params[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # transplanted model runs in the frozen-train branch
    out, _ = ist.apply({"params": params, "batch_stats": batch_stats}, inputs,
                       train=True, mutable=["bn_batch"],
                       rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(out["pts_w_local_gt"])).all()

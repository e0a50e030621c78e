"""IST-Net: prior-free category-level pose estimation — flax model + loss.

Rebuild of the reference top model (``model/ist_net.py:10-111``). One flax
module whose training/eval branches compile as single XLA graphs. Inputs are a
dict of arrays (channel-last):

  rgb            (B, 192, 192, 3)  normalized crop
  pts            (B, N, 3)         camera-space points (meters)
  choose         (B, N)            flat pixel indices into the crop
  category_label (B,)              int class id 0..5
  qo             (B, N, 3)         GT NOCS points (train only)

Outputs (end_points): pred_rotation (B,3,3), pred_translation (B,3),
pred_size (B,3), pred_qo (B,N,3), plus aux-head predictions in training.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from istnet_tpu.models import losses
from istnet_tpu.nn.estimators import HeavyEstimator, ImplicitTransformation, LightEstimator
from istnet_tpu.nn.pointnet2_msg import PointNet2MSG
from istnet_tpu.nn.resnet_psp import ModifiedResnet

Array = jax.Array

CAM_RADII = ((0.01, 0.02), (0.02, 0.04), (0.04, 0.08), (0.08, 0.16))
WORLD_RADII = ((0.05, 0.10), (0.10, 0.20), (0.20, 0.30), (0.30, 0.40))


def _gather_rows(flat: Array, choose: Array) -> Array:
    return jax.vmap(lambda f, idx: jnp.take(f, idx, axis=0))(
        flat, choose.astype(jnp.int32))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _make_onehot_gather(hw: int, dtype_name: str):
    """Row-gather with a blocked one-hot MXU backward.

    The AD transpose of the row-gather is a scatter-add of the (B, N, C)
    cotangent into the dense (B, HW, C) map — round-3 profiling measured it
    at 2.05 ms (B=24, a 11 GB/s fusion + a zero-broadcast) and 3.44 ms at
    the 2048-pt config. Here: dense[b, p, :] = sum_i [choose[b,i] == p] *
    ct[b, i, :], evaluated per contiguous p-block as an (PB, N) x (N, C)
    matmul whose one-hot LHS is an iota-compare (never materialized at full
    HW width; ``lax.map`` keeps one block in flight). Duplicate indices
    accumulate in the MXU like the scatter — same math, f32 accumulation.

    REJECTED A/B (round 5, device-time profiles of the full train step):
    B=24/1024-pt 53.69 -> 54.88 ms, 2048-pt config 325.99 -> 340.01 ms —
    the round-3 pencil (1.2-1.5 ms vs the 2.05 ms scatter) was wrong in
    graph: the blocked one-hot build + lax.map sequencing cost more than
    the scatter fusion it replaces at BOTH configs. Kept (with its
    correctness test) as the ledgered artifact; not reachable from the
    product path.
    """
    dtype = jnp.dtype(dtype_name)
    pb = min(hw, 4608)              # 8 blocks over 36864 (192x192)
    nb = -(-hw // pb)

    @jax.custom_vjp
    def f(flat, choose):
        return _gather_rows(flat, choose)

    def fwd(flat, choose):
        return _gather_rows(flat, choose), choose

    def bwd(choose, ct):
        b, _, c = ct.shape
        ch = choose.astype(jnp.int32)

        def block(pstart):
            cols = pstart + lax.iota(jnp.int32, pb)[None, None, :]
            oh = (ch[:, :, None] == cols).astype(ct.dtype)     # (B, N, PB)
            return lax.dot_general(
                oh, ct, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # (B, PB, C)

        blocks = lax.map(block, jnp.arange(0, nb * pb, pb, dtype=jnp.int32))
        dense = jnp.moveaxis(blocks, 0, 1).reshape(b, nb * pb, c)[:, :hw]
        return dense.astype(dtype), None

    f.defvjp(fwd, bwd)
    return f


def _gather_rows_onehot_bwd(flat: Array, choose: Array) -> Array:
    return _make_onehot_gather(flat.shape[1], jnp.dtype(flat.dtype).name)(
        flat, choose)

def gather_by_choose(feat_map: Array, choose: Array) -> Array:
    """(B, H, W, C), (B, N) -> (B, N, C): per-point pixel features
    (ist_net.py:41-45's gather, channel-last).

    vmapped row-take lowers ~1.5x faster on TPU than take_along_axis with a
    broadcast channel index (measured 4.4 vs 6.4 ms at production shapes).
    The AD scatter-add transpose is also the best measured backward — see
    the rejected one-hot alternative in ``_make_onehot_gather``.
    """
    b, h, w, c = feat_map.shape
    flat = feat_map.reshape(b, h * w, c)
    return _gather_rows(flat, choose)


class WorldSpaceEnhancer(nn.Module):
    """Train-only world-space feature extractor + optional aux pose head
    (ist_net.py:185-200)."""

    freeze: bool = False
    sa_npoints: tuple = (512, 256, 128, 64)

    @nn.compact
    def __call__(self, pts: Array, pts_w_gt: Array, rgb_local: Array,
                 pts_local: Array, train: bool):
        pts_w_local_gt = PointNet2MSG(radii_list=WORLD_RADII, npoints=self.sa_npoints,
                                      name="extractor")(pts_w_gt, train)
        if self.freeze:
            return None, None, None, pts_w_local_gt
        r, t, s = HeavyEstimator(name="pose_estimator")(
            pts, pts_w_gt, lax.stop_gradient(rgb_local), lax.stop_gradient(pts_local),
            pts_w_local_gt)
        return r, t, s, pts_w_local_gt


class ISTNet(nn.Module):
    """The IST-Net model (ist_net.py:10-76)."""

    nclass: int = 6
    freeze_world_enhancer: bool = False
    sa_npoints: tuple = (512, 256, 128, 64)
    # eval-only: run the encoder's final stage at chosen pixels instead of
    # densely + gather (numerically exact in eval; ~1.4x faster end to end)
    sparse_eval_head: bool = True

    @nn.compact
    def __call__(self, inputs: dict[str, Array], train: bool) -> dict[str, Array]:
        end_points: dict[str, Array] = {}
        rgb = inputs["rgb"]
        pts = inputs["pts"]
        choose = inputs["choose"]
        cls = inputs["category_label"].reshape(-1)

        c = jnp.mean(pts, axis=1, keepdims=True)
        pts = pts - c

        encoder = ModifiedResnet(name="rgb_cam_extractor")
        if not train and self.sparse_eval_head:
            rgb_local = encoder.sparse_points(rgb, choose, train)
        else:
            rgb_local = gather_by_choose(encoder(rgb, train), choose)

        pts_local = PointNet2MSG(radii_list=CAM_RADII, npoints=self.sa_npoints,
                                 name="pts_cam_extractor")(pts, train)
        implicit = ImplicitTransformation(self.nclass, name="implicit_transform")
        main_est = HeavyEstimator(name="main_estimator")

        if train:
            pts_w_gt = inputs["qo"]
            r_aux_cam, t_aux_cam, s_aux_cam = LightEstimator(name="cam_enhancer")(
                pts, rgb_local, pts_local)
            pts_w, pts_w_local = implicit(rgb_local, pts_local, pts, cls)
            r, t, s = main_est(pts, pts_w, rgb_local, pts_local, pts_w_local)
            r_aux_w, t_aux_w, s_aux_w, pts_w_local_gt = WorldSpaceEnhancer(
                freeze=self.freeze_world_enhancer, sa_npoints=self.sa_npoints,
                name="world_enhancer")(
                    pts, pts_w_gt, rgb_local, pts_local, train)

            end_points["pred_qo"] = pts_w
            end_points["pts_w_local"] = pts_w_local
            end_points["pts_w_local_gt"] = pts_w_local_gt
            end_points["pred_rotation"] = r
            end_points["pred_translation"] = t + c.squeeze(1)
            end_points["pred_size"] = s
            end_points["pred_rotation_aux_cam"] = r_aux_cam
            end_points["pred_translation_aux_cam"] = t_aux_cam + c.squeeze(1)
            end_points["pred_size_aux_cam"] = s_aux_cam
            if not self.freeze_world_enhancer:
                end_points["pred_rotation_aux_world"] = r_aux_w
                end_points["pred_translation_aux_world"] = t_aux_w + c.squeeze(1)
                end_points["pred_size_aux_world"] = s_aux_w
        else:
            pts_w, pts_w_local = implicit(rgb_local, pts_local, pts, cls)
            r, t, s = main_est(pts, pts_w, rgb_local, pts_local, pts_w_local)
            end_points["pred_qo"] = pts_w
            end_points["pred_rotation"] = r
            end_points["pred_translation"] = t + c.squeeze(1)
            end_points["pred_size"] = s
        return end_points


def supervised_loss(end_points: dict[str, Array], labels: dict[str, Array],
                    gamma1: float, gamma2: float,
                    freeze_world_enhancer: bool) -> tuple[Array, dict[str, Array]]:
    """IST-Net training loss (ist_net.py:78-111).

    loss = PoseDis(main) + PoseDis(aux_cam) + gamma1*SmoothL1(qo)
         + gamma2*MSE(pts_w_local, pts_w_local_gt) [+ PoseDis(aux_world)].
    """
    r_l, t_l, s_l = labels["rotation_label"], labels["translation_label"], labels["size_label"]
    loss_feat = losses.feature_mse(end_points["pts_w_local"],
                                   lax.stop_gradient(end_points["pts_w_local_gt"])
                                   if freeze_world_enhancer else end_points["pts_w_local_gt"])
    loss_qo = losses.smooth_l1_dis(end_points["pred_qo"], labels["qo"])
    loss_pose = losses.pose_dis(
        end_points["pred_rotation"], end_points["pred_translation"], end_points["pred_size"],
        r_l, t_l, s_l)
    loss_aux_cam = losses.pose_dis(
        end_points["pred_rotation_aux_cam"], end_points["pred_translation_aux_cam"],
        end_points["pred_size_aux_cam"], r_l, t_l, s_l)
    total = loss_pose + loss_aux_cam + gamma1 * loss_qo + gamma2 * loss_feat
    parts = {"pose": loss_pose, "aux_cam": loss_aux_cam, "qo": loss_qo, "feat": loss_feat}
    if not freeze_world_enhancer:
        loss_aux_world = losses.pose_dis(
            end_points["pred_rotation_aux_world"], end_points["pred_translation_aux_world"],
            end_points["pred_size_aux_world"], r_l, t_l, s_l)
        total = total + loss_aux_world
        parts["aux_world"] = loss_aux_world
    parts["total"] = total
    return total, parts

"""PoseNetGT — phase-1 model that trains the world-space extractor.

Rebuild of the reference ``model/posenet_gt.py:11-67``: ResNet+PSP rgb
features, camera-space PointNet2MSG, a world-space PointNet2MSG over GT NOCS
points, and a HeavyEstimator on detached rgb/pts features. Its
``pts_gt_extractor`` weights are later loaded into IST-Net's
``world_enhancer.extractor`` (reference ``train.py:106-114``; here
``istnet_tpu.train.checkpoints.load_world_enhancer``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from istnet_tpu.models import losses
from istnet_tpu.models.ist_net import CAM_RADII, WORLD_RADII, gather_by_choose
from istnet_tpu.nn.estimators import HeavyEstimator
from istnet_tpu.nn.pointnet2_msg import PointNet2MSG
from istnet_tpu.nn.resnet_psp import ModifiedResnet

Array = jax.Array


class PoseNetGT(nn.Module):
    nclass: int = 6
    sa_npoints: tuple = (512, 256, 128, 64)

    @nn.compact
    def __call__(self, inputs: dict[str, Array], train: bool) -> dict[str, Array]:
        rgb = inputs["rgb"]
        pts = inputs["pts"]
        choose = inputs["choose"]
        pts_w_gt = inputs["qo"]

        c = jnp.mean(pts, axis=1, keepdims=True)
        pts = pts - c

        rgb_feat = ModifiedResnet(name="rgb_extractor")(rgb, train)
        rgb_local = gather_by_choose(rgb_feat, choose)
        pts_local = PointNet2MSG(radii_list=CAM_RADII, npoints=self.sa_npoints,
                                 name="pts_extractor")(pts, train)
        pts_local_w_gt = PointNet2MSG(radii_list=WORLD_RADII, npoints=self.sa_npoints,
                                      name="pts_gt_extractor")(pts_w_gt, train)

        r, t, s = HeavyEstimator(name="pose_estimator_aux")(
            pts, pts_w_gt, lax.stop_gradient(rgb_local), lax.stop_gradient(pts_local),
            pts_local_w_gt)

        return {
            "pts_local_w_gt": pts_local_w_gt,
            "pred_rotation": r,
            "pred_translation": t + c.squeeze(1),
            "pred_size": s,
        }


def supervised_loss(end_points: dict[str, Array], labels: dict[str, Array]):
    """PoseNetGT loss = PoseDis only (posenet_gt.py:53-67)."""
    total = losses.pose_dis(
        end_points["pred_rotation"], end_points["pred_translation"], end_points["pred_size"],
        labels["rotation_label"], labels["translation_label"], labels["size_label"])
    return total, {"total": total, "pose": total}

"""Point-cloud ops: XLA reference implementations + fused Pallas TPU kernels.

``istnet_tpu.ops.pointnet2`` — pure-XLA, runs anywhere (CPU tests, TPU).
``istnet_tpu.ops.pallas_kernels`` — fused Pallas TPU kernels for the hot ops.
``select`` picks the best implementation for the current backend.
"""

from istnet_tpu.ops.dispatch import (ball_query, ball_query_group,
    ball_query_multi, fp_interpolate, furthest_point_sample,
    sa_msg_fused,
    three_interpolate, three_nn)
from istnet_tpu.ops.pointnet2 import (
    gather_points,
    group_points,
    three_interpolate_weights,
)

__all__ = [
    "ball_query",
    "ball_query_group",
    "ball_query_multi",
    "furthest_point_sample",
    "gather_points",
    "group_points",
    "fp_interpolate",
    "sa_msg_fused",
    "three_interpolate",
    "three_interpolate_weights",
    "three_nn",
]

"""Pallas kernels vs the XLA reference implementations (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from istnet_tpu.ops import pointnet2 as xla_ops
from istnet_tpu.ops.fps_pallas import furthest_point_sample_pallas


def test_fps_pallas_matches_xla():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(4, 128, 3).astype(np.float32) * 0.3)
    got = furthest_point_sample_pallas(xyz, 32, interpret=True)
    want = xla_ops.furthest_point_sample(xyz, 32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_pallas_degenerate_cloud():
    xyz = jnp.zeros((2, 128, 3), jnp.float32)
    got = furthest_point_sample_pallas(xyz, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0)

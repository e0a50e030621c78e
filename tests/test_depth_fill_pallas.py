"""Fused depth-fill kernel vs the XLA pipeline (interpret mode, CPU)."""

import jax.numpy as jnp
import numpy as np

from istnet_tpu.data.device_preprocess import fill_in_multiscale_tpu
from istnet_tpu.ops.depth_fill_pallas import fill_in_multiscale_pallas


def _synthetic_depth(rng, b, h, w):
    d = rng.uniform(0.3, 2.8, size=(b, h, w)).astype(np.float32)
    d[rng.rand(b, h, w) < 0.35] = 0.0           # holes
    d[:, : h // 5] = 0.0                        # empty sky band (top-mask)
    d[0, :, : w // 8] = 0.0                     # empty columns
    return d


def test_fill_pallas_matches_xla():
    rng = np.random.RandomState(0)
    depth = _synthetic_depth(rng, 2, 48, 128)
    got = fill_in_multiscale_pallas(jnp.asarray(depth), 3.0, True)
    want = fill_in_multiscale_tpu(jnp.asarray(depth))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fill_pallas_matches_xla_wide():
    """Multi-chunk width (384 = 3 column chunks) exercises chunk halos."""
    rng = np.random.RandomState(1)
    depth = _synthetic_depth(rng, 1, 40, 384)
    got = fill_in_multiscale_pallas(jnp.asarray(depth), 3.0, True)
    want = fill_in_multiscale_tpu(jnp.asarray(depth))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fill_pallas_all_empty_image():
    depth = np.zeros((1, 32, 128), np.float32)
    got = fill_in_multiscale_pallas(jnp.asarray(depth), 3.0, True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)

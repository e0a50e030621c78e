"""Device-side depth completion vs the cv2 reference pipeline."""

import jax.numpy as jnp
import numpy as np

from istnet_tpu.data.depth_utils import backproject, fill_missing
from istnet_tpu.data.device_preprocess import backproject_batch, fill_missing_tpu


def _synthetic_depth(seed, h=96, w=128):
    """Depths spanning ALL THREE distance bands (<1 m, 1-2 m, >2 m) with a
    hard band boundary — the band-dilation order is only observable there."""
    rng = np.random.RandomState(seed)
    depth = (1500 + 300 * rng.rand(h, w)).astype(np.float32)
    depth[:, w // 2:] = 2200 + 500 * rng.rand(h, w - w // 2)  # far band
    depth[h // 2:, : w // 4] = 600 + 300 * rng.rand(h - h // 2, w // 4)  # near band
    depth[rng.rand(h, w) < 0.3] = 0
    depth[: h // 8] = 0  # empty top band
    depth[:, :4] = 0  # empty columns
    return depth


def test_fill_matches_cv2_pipeline():
    depths = np.stack([_synthetic_depth(s) for s in range(3)])
    got = np.asarray(fill_missing_tpu(jnp.asarray(depths)))
    for i in range(3):
        want = fill_missing(depths[i].copy(), 1000.0, 1)
        diff = np.abs(got[i] - want)
        # sub-mm agreement (fp order-of-ops and sort-tie differences only)
        assert float(diff.max()) < 1.0, f"max diff {diff.max()} mm"
        assert float((diff > 0.1).mean()) < 0.01


def test_backproject_matches_numpy():
    depth = _synthetic_depth(7)
    intr = [577.5, 577.5, 63.5, 47.5]
    got = np.asarray(backproject_batch(jnp.asarray(depth[None]), jnp.asarray(intr)))
    want = backproject(depth, intr)
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-7)

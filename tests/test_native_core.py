"""Native C++ depth-completion core vs the cv2 reference pipeline."""

import numpy as np
import pytest

from istnet_tpu import native
from istnet_tpu.data.depth_utils import fill_missing

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native core not built (no g++?)")


def test_native_fill_matches_cv2():
    rng = np.random.RandomState(0)
    # span all three distance bands incl. a hard boundary (band-order matters)
    depth = (1500 + 300 * rng.rand(96, 128)).astype(np.float32)
    depth[:, 64:] = 2200 + 500 * rng.rand(96, 64)
    depth[48:, :32] = 600 + 300 * rng.rand(48, 32)
    depth[rng.rand(96, 128) < 0.3] = 0
    depth[:12] = 0

    want = fill_missing(depth.copy(), 1000.0, 1)
    got = native.fill_missing_native(depth.copy(), 1000.0, 1)
    diff = np.abs(want - got)
    assert float(diff.max()) < 0.01, f"max diff {diff.max()} mm"

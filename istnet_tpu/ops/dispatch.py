"""Backend dispatch: fused Pallas kernels on TPU, pure-XLA elsewhere."""

from __future__ import annotations

import jax

from istnet_tpu.ops import pointnet2 as _xla
from istnet_tpu.ops import fps_pallas as _fps_pl


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def furthest_point_sample(xyz, npoint: int):
    """FPS with automatic kernel selection (Pallas on TPU, lax.scan elsewhere)."""
    n = xyz.shape[1]
    if _on_tpu() and n % 128 == 0:
        return _fps_pl.furthest_point_sample_pallas(xyz, npoint)
    return _xla.furthest_point_sample(xyz, npoint)

"""6D-orthographic rotation representation -> rotation matrix.

Rebuild of the reference ``utils/rotation_utils.py:4-28`` (Gram-Schmidt via
cross products; same column convention), minus its hardcoded ``.cuda()``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def normalize_vector(v: Array, eps: float = 1e-8) -> Array:
    mag = jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True))
    return v / jnp.maximum(mag, eps)


def ortho6d_to_mat(x_raw: Array, y_raw: Array) -> Array:
    """(..., 3), (..., 3) -> (..., 3, 3) with columns [x, y, z].

    Matches rotation_utils.py:18-28: y = norm(y_raw); z = norm(x_raw x y);
    x = y x z.
    """
    y = normalize_vector(y_raw)
    z = normalize_vector(jnp.cross(x_raw, y))
    x = jnp.cross(y, z)
    return jnp.stack([x, y, z], axis=-1)

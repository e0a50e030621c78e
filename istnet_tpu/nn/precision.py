"""Compute-dtype policy (mixed precision).

TPU MXU peak throughput needs bfloat16 operands; parameters and optimizer
state stay float32, normalization statistics and the geometry ops (FPS, ball
query, three-NN — centimeter-scale distances with millimeter tolerances)
stay float32, and the pose/NOCS head outputs are cast back to float32.

Set the policy BEFORE tracing (it is read at module-construction/trace time):

    from istnet_tpu.nn import precision
    precision.set_compute_dtype(jnp.bfloat16)
"""

from __future__ import annotations

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE

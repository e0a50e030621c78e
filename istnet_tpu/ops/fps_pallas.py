"""Fused Pallas TPU kernel for furthest point sampling.

TPU-native replacement for the reference CUDA kernel
(``/root/reference/model/pointnet2/_ext_src/src/sampling_gpu.cu:74-178``),
with identical selection semantics (seed index 0, argmax of the running
min-squared-distance, first-occurrence tie-break) — but a different
parallelization: instead of one thread-block per cloud with a shared-memory
tree reduction, ONE kernel invocation processes the whole batch, mapping the
batch dim onto VPU sublanes and the N points onto lanes. The only sequential
dimension is the ``npoint`` selection loop (inherent to FPS); every step is a
handful of (B, N) vector ops entirely in registers/VMEM.

The selected index at step j is extracted with a one-hot reduction (no
dynamic-lane gathers), and indices are written row-wise ``(npoint, B)`` so the
per-step store is a well-supported dynamic-sublane store.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, *, npoint: int):
    b, n = x_ref.shape
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    lane = lax.broadcasted_iota(jnp.int32, (b, n), 1)

    # step 0: every cloud starts at index 0 (sampling_gpu.cu:91-92)
    out_ref[0:1, :] = jnp.zeros((1, b), jnp.int32)

    def pick_coords(old):
        onehot = (lane == old).astype(jnp.float32)
        x1 = jnp.sum(x * onehot, axis=1, keepdims=True)
        y1 = jnp.sum(y * onehot, axis=1, keepdims=True)
        z1 = jnp.sum(z * onehot, axis=1, keepdims=True)
        return x1, y1, z1

    def body(j, carry):
        min_d2, old = carry
        x1, y1, z1 = pick_coords(old)
        d2 = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        min_d2 = jnp.minimum(min_d2, d2)
        # first-occurrence argmax over lanes
        m = jnp.max(min_d2, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(min_d2 == m, lane, n), axis=1, keepdims=True)
        out_ref[pl.ds(j, 1), :] = nxt.astype(jnp.int32).reshape(1, b)
        return min_d2, nxt

    init = (jnp.full((b, n), 1e10, jnp.float32), jnp.zeros((b, 1), jnp.int32))
    lax.fori_loop(1, npoint, body, init)


@functools.partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample_pallas(xyz: Array, npoint: int, interpret: bool = False) -> Array:
    """FPS via the fused Pallas kernel. ``(B, N, 3) -> (B, npoint)`` int32.

    Requires N to be a multiple of 128 (lane tiling); all IST-Net shapes
    (1024/512/256/128, and the 2048-pt config) qualify.
    """
    b, n, _ = xyz.shape
    if n % 128 != 0:
        raise ValueError(f"fps_pallas requires N % 128 == 0, got N={n}")
    xyz = xyz.astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        out_shape=jax.ShapeDtypeStruct((npoint, b), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, y, z)
    return out.T

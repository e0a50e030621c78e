"""Fused Pallas TPU kernel for 3-nearest-neighbor search.

Replacement for the reference ``interpolate_gpu.cu:14-73`` (brute-force
running top-3) used by every FP stage. The (N, M) distance matrix is computed
on-chip as one MXU contraction and reduced to the 3 smallest
(first-occurrence ties, matching the CUDA strict ``<`` scan) by three masked
argmin passes — it never round-trips through HBM.

Grid: (B, N/TN); known set lives fully in VMEM (M <= 512 at all stages),
padded to a lane multiple with far-away dummy points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_PAD_COORD = 1e9  # dummy-point coordinate; d2 ~ 1e18 is never selected


def _three_nn_kernel(unk_ref, known_t_ref, dist_ref, idx_ref, *, m_real: int):
    tn = unk_ref.shape[1]
    m = known_t_ref.shape[2]
    a = unk_ref[0]            # (TN, 3)
    bt = known_t_ref[0]       # (3, M)

    an = jnp.sum(a * a, axis=1, keepdims=True)
    bn = jnp.sum(bt * bt, axis=0, keepdims=True)
    ab = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    d2 = jnp.maximum(an + bn - 2.0 * ab, 0.0)  # (TN, M)

    lane = lax.broadcasted_iota(jnp.int32, (tn, m), 1)
    dists = []
    idxs = []
    for _ in range(3):
        mn = jnp.min(d2, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(d2 == mn, lane, m), axis=1, keepdims=True)
        d2 = jnp.where(lane == sel, jnp.inf, d2)
        dists.append(mn)
        idxs.append(sel)
    dist_ref[0] = jnp.sqrt(jnp.concatenate(dists, axis=1))
    idx_ref[0] = jnp.concatenate(idxs, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def three_nn_pallas(unknown: Array, known: Array, interpret: bool = False):
    """``(B, N, 3), (B, M, 3) -> (dist (B, N, 3), idx (B, N, 3))``."""
    b, n, _ = unknown.shape
    m_real = known.shape[1]
    # one program per batch element when VMEM allows: (TN, M) f32 at the
    # largest stage (1024 x 512) is 2 MB; per-program launch overhead (~20us)
    # otherwise dominates these tiny kernels
    tn = min(n, 1024)
    if n % tn:
        raise ValueError(f"three_nn_pallas needs N%{tn}==0, got N={n}")
    m = -(-m_real // 128) * 128
    known = known.astype(jnp.float32)
    if m != m_real:
        pad = jnp.full((b, m - m_real, 3), _PAD_COORD, jnp.float32)
        known = jnp.concatenate([known, pad], axis=1)
    known_t = jnp.swapaxes(known, 1, 2)  # (B, 3, M)
    grid = (b, n // tn)
    dist, idx = pl.pallas_call(
        functools.partial(_three_nn_kernel, m_real=m_real),
        out_shape=(jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, 3), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tn, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(unknown.astype(jnp.float32), known_t)
    return dist, idx

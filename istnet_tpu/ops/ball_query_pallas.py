"""Fused Pallas TPU kernel for ball query.

TPU-native replacement for ``ball_query_gpu.cu:14-59`` with identical
semantics (first ``nsample`` in-radius indices in index order, padded with the
first hit, zeros when no hit). Design:

- distances computed on-chip as one (TM, 3) @ (3, N) MXU contraction — the
  (B, M, N) distance matrix never touches HBM;
- the CUDA kernel's sequential hit-counting loop becomes rank arithmetic:
  ``cs = inclusive-cumsum(hit)`` is monotone per row, so the s-th hit sits at
  ``searchsorted(cs, s+1) = sum(cs <= s)`` — one vectorized compare+reduce per
  output slot, no sort/top_k/scatter.

Grid: (B, M/TM) with TM = min(M, 128) centroids per program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ball_query_kernel(new_xyz_ref, xyz_t_ref, *out_refs,
                       radii: tuple, nsamples: tuple):
    tm = new_xyz_ref.shape[1]
    n = xyz_t_ref.shape[2]
    a = new_xyz_ref[0]            # (TM, 3)
    bt = xyz_t_ref[0]             # (3, N)

    an = jnp.sum(a * a, axis=1, keepdims=True)                    # (TM, 1)
    bn = jnp.sum(bt * bt, axis=0, keepdims=True)                  # (1, N)
    ab = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)                 # (TM, N)
    d2 = an + bn - 2.0 * ab       # shared by all radii

    # inclusive prefix sum along lanes (Mosaic has no cumsum):
    # - N <= 1024: int8 MXU matmul against an upper-triangular ones matrix
    #   (~10% faster than rolls; (N, N) tri stays small)
    # - larger N (the 2048-pt config): Hillis-Steele doubling with masked
    #   rolls — the O(N^2) triangle would strain VMEM there
    use_tri = n <= 1024
    if use_tri:
        r_ = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        c_ = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        tri = (r_ <= c_).astype(jnp.int8)
    else:
        lane = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    for radius, nsample, out_ref in zip(radii, nsamples, out_refs):
        hit = d2 < jnp.float32(radius) ** 2
        if use_tri:
            cs = lax.dot_general(hit.astype(jnp.int8), tri,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        else:
            cs = hit.astype(jnp.int32)
            shift = 1
            while shift < n:
                rolled = pltpu.roll(cs, shift, axis=1)
                cs = cs + jnp.where(lane >= shift, rolled, 0)
                shift *= 2

        cols = []
        for s in range(nsample):
            # index of the s-th hit; == n when fewer than s+1 hits
            cols.append(jnp.sum((cs <= s).astype(jnp.int32), axis=1, keepdims=True))
        idx = jnp.concatenate(cols, axis=1)                       # (TM, nsample)

        first = idx[:, :1]
        filled = idx < n
        pad = jnp.where(first < n, first, 0)                      # zero row if no hit
        out_ref[0] = jnp.where(filled, idx, pad).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def ball_query_multi_pallas(radii: tuple, nsamples: tuple, xyz: Array,
                            new_xyz: Array, interpret: bool = False) -> list:
    """Multi-radius ball query sharing ONE on-chip distance computation.

    ``(B, N, 3), (B, M, 3) -> [ (B, M, nsamples[i]) int32 per radius ]``.
    The SA-MSG modules query 2 radii per stage over the same centroids
    (modules.py:249-298); fusing them halves the distance work.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    # large tiles amortize per-program overhead, but the (TM, N) working set
    # (d2 f32 + cs i32 + temps) must stay under the ~16 MB VMEM scoped limit:
    # cap TM*N at 512*1024 (measured ~6 MB); N=2048 then runs at TM=256
    tm = min(m, max(128, (512 * 1024) // n))
    if m % tm or n % 128:
        raise ValueError(f"ball_query_pallas needs M%{tm}==0 and N%128==0, got M={m} N={n}")
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    grid = (b, m // tm)
    out = pl.pallas_call(
        functools.partial(_ball_query_kernel, radii=tuple(radii),
                          nsamples=tuple(nsamples)),
        out_shape=[jax.ShapeDtypeStruct((b, m, ns), jnp.int32) for ns in nsamples],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tm, ns), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM) for ns in nsamples],
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t)
    return list(out)


def ball_query_pallas(radius: float, nsample: int, xyz: Array, new_xyz: Array,
                      interpret: bool = False) -> Array:
    """Single-radius wrapper over the fused multi-radius kernel."""
    return ball_query_multi_pallas((radius,), (nsample,), xyz, new_xyz,
                                   interpret=interpret)[0]

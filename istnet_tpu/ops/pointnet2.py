"""Point-cloud set ops — pure-XLA (jax.numpy) implementations.

TPU-native re-design of the reference's CUDA L0 ops
(``/root/reference/model/pointnet2/_ext_src/src/*.cu``). Semantics match the
CUDA kernels exactly (verified by unit tests in ``tests/test_ops.py``):

- ``furthest_point_sample``  — ``sampling_gpu.cu:74-178``: seed index 0,
  iteratively pick the point maximizing the running min-squared-distance.
- ``ball_query``             — ``ball_query_gpu.cu:14-59``: for each centroid,
  the *first* ``nsample`` point indices (in index order) with
  ``d2 < radius**2``, padded by repeating the first hit; all-zero if no hit.
- ``three_nn``               — ``interpolate_gpu.cu:14-73`` +
  ``pointnet2_utils.py:142`` (sqrt applied): 3 smallest Euclidean distances
  and their indices, first-occurrence tie-breaking.
- ``gather_points`` / ``group_points`` / ``three_interpolate`` — plain gathers
  (``take_along_axis``); JAX autodiff gives the deterministic scatter-add
  backward that the reference implements with ``atomicAdd``
  (``sampling_gpu.cu:43-62``, ``group_points_gpu.cu:45-80``,
  ``interpolate_gpu.cu:120-159``).

Layout: channel-LAST — points ``(B, N, 3)``, features ``(B, N, C)``. The
reference uses ``(B, C, N)``; channel-last maps the feature dim onto TPU lanes.

All shapes are static; every op compiles once per (N, npoint, nsample) tuple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


# ---------------------------------------------------------------------------
# Furthest point sampling
# ---------------------------------------------------------------------------

def _fps_single(xyz: Array, npoint: int) -> Array:
    """FPS over one cloud ``(N, 3) -> (npoint,)`` int32 indices."""
    n = xyz.shape[0]
    xyz = xyz.astype(jnp.float32)

    def step(carry, _):
        min_d2, last = carry
        diff = xyz - xyz[last]
        d2 = jnp.sum(diff * diff, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        return (min_d2, nxt), nxt

    # CUDA seeds the temp distance buffer with 1e10 (sampling.cpp:70-91).
    init = (jnp.full((n,), 1e10, jnp.float32), jnp.int32(0))
    if npoint == 1:
        return jnp.zeros((1,), jnp.int32)
    (_, _), rest = lax.scan(step, init, None, length=npoint - 1)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), rest])


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample(xyz: Array, npoint: int) -> Array:
    """Iterative farthest point sampling.

    Args:
      xyz: ``(B, N, 3)`` point coordinates.
      npoint: number of samples (static).

    Returns:
      ``(B, npoint)`` int32 indices into N. Non-differentiable (the reference
      marks it non-differentiable too, ``pointnet2_utils.py:72-77``).
    """
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz)


# ---------------------------------------------------------------------------
# Pairwise squared distances — on the MXU
# ---------------------------------------------------------------------------

def pairwise_d2(a: Array, b: Array) -> Array:
    """``(B, M, 3), (B, N, 3) -> (B, M, N)`` squared distances.

    Computed as |a|^2 + |b|^2 - 2 a.b with a full-precision (HIGHEST) matmul —
    one MXU contraction instead of a (B, M, N, 3) broadcast tensor (which at
    production shapes is a 200 MB VPU-bound intermediate). HIGHEST precision is
    required: distances are ~1e-4 m^2 against radii^2 of 1e-4, beyond default
    bf16-pass resolution.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    an = jnp.sum(a * a, axis=-1)
    bn = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("bmc,bnc->bmn", a, b, precision=lax.Precision.HIGHEST)
    d2 = an[..., :, None] + bn[..., None, :] - 2.0 * ab
    return jnp.maximum(d2, 0.0)


# ---------------------------------------------------------------------------
# Ball query
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius: float, nsample: int, xyz: Array, new_xyz: Array) -> Array:
    """First-``nsample``-in-radius neighbor indices, CUDA-order semantics.

    Args:
      radius: ball radius (static).
      nsample: max neighbors (static).
      xyz: ``(B, N, 3)`` all points.
      new_xyz: ``(B, M, 3)`` query centroids.

    Returns:
      ``(B, M, nsample)`` int32 indices. Matches ``ball_query_gpu.cu:38-46``:
      hits kept in ascending index order, padded with the first hit; rows with
      zero hits are all-zero (the wrapper zero-initializes the buffer,
      ``ball_query.cpp:31``).

    Implementation: hit-rank scatter. rank = (exclusive cumsum of the hit
    mask) is each hit's output slot; one scatter writes all first-``nsample``
    hits in index order (out-of-range slots drop). No sort / top_k.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    d2 = pairwise_d2(new_xyz, xyz)  # (B, M, N)
    hit = d2 < jnp.float32(radius) ** 2
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1  # hit slot, -1 pre-first
    slot = jnp.where(hit & (rank < nsample), rank, nsample)  # nsample = drop bin

    src = lax.broadcasted_iota(jnp.int32, (b, m, n), 2)
    out = jnp.full((b, m, nsample + 1), -1, jnp.int32)
    # scatter along the last axis; duplicate slots can't collide (rank unique per row)
    out = jax.vmap(jax.vmap(lambda o, s, v: o.at[s].set(v)))(out, slot, src)
    out = out[..., :nsample]

    first_hit = out[..., :1]  # slot 0 = first hit (or -1 if no hits)
    filled = out >= 0
    pad = jnp.maximum(first_hit, 0)  # all-zero rows when no hit (zeroed buffer)
    return jnp.where(filled, out, pad)


def ball_query_group(radii, nsamples, xyz: Array, new_xyz: Array,
                     features: Array | None = None, use_xyz: bool = True) -> list:
    """Multi-radius ball query + grouping (QueryAndGroup semantics,
    ``pointnet2_utils.py:335-357``): per radius, the grouped tensor
    ``(B, M, ns, 3 + C)`` = [xyz - centroid, features] at the first-``ns``
    in-radius indices (CUDA pad semantics). Pure-XLA composition of
    ``ball_query`` + ``group_points``; the TPU path fuses everything into
    one Pallas kernel (``ball_query_pallas.ball_query_group_pallas``)."""
    outs = []
    for r, ns in zip(radii, nsamples):
        idx = ball_query(r, ns, xyz, new_xyz)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if features is not None:
            grouped = group_points(features, idx)
            if use_xyz:
                grouped = jnp.concatenate(
                    [grouped_xyz.astype(grouped.dtype), grouped], axis=-1)
        else:
            grouped = grouped_xyz
        outs.append(grouped)
    return outs


# ---------------------------------------------------------------------------
# Gathers (differentiable via JAX autodiff — deterministic scatter-add bwd)
# ---------------------------------------------------------------------------

def gather_points(points: Array, idx: Array) -> Array:
    """``(B, N, C), (B, M) -> (B, M, C)`` — reference ``sampling_gpu.cu:13-35``."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points: Array, idx: Array) -> Array:
    """``(B, N, C), (B, M, S) -> (B, M, S, C)`` — reference ``group_points_gpu.cu:13-40``."""
    b, m, s = idx.shape
    flat = gather_points(points, idx.reshape(b, m * s))
    return flat.reshape(b, m, s, points.shape[-1])


# ---------------------------------------------------------------------------
# Three-NN interpolation
# ---------------------------------------------------------------------------

@jax.jit
def three_nn(unknown: Array, known: Array) -> tuple[Array, Array]:
    """3 nearest neighbors of each ``unknown`` point among ``known`` points.

    Args:
      unknown: ``(B, N, 3)``.
      known: ``(B, M, 3)``.

    Returns:
      ``dist (B, N, 3)`` Euclidean distances (sqrt applied, matching
      ``pointnet2_utils.py:142``) and ``idx (B, N, 3)`` int32, both sorted by
      ascending distance with first-occurrence tie-breaking
      (``interpolate_gpu.cu:38-60`` uses strict ``<``).
    """
    m = known.shape[1]
    if unknown.dtype == jnp.float64:
        # double-precision parity runs: the MXU dot-form (|a|^2+|b|^2-2ab)
        # and the CUDA/golden direct form disagree at f32 rounding (~1e-7
        # rel), which leaks into the inverse-distance weights; compute the
        # direct form in f64 so torch-vs-flax comparisons are exact. The
        # production f32/bf16 path keeps the dot form (it IS the TPU win).
        d2 = jnp.sum((unknown[:, :, None, :] - known[:, None, :, :]) ** 2, -1)
    else:
        d2 = pairwise_d2(unknown, known)  # (B, N, M)
    lane = lax.broadcasted_iota(jnp.int32, d2.shape, 2)

    def take_min(carry, _):
        d = carry
        mn = jnp.min(d, axis=-1, keepdims=True)
        # first-occurrence argmin (strict < in the CUDA scan)
        idx = jnp.min(jnp.where(d == mn, lane, m), axis=-1)
        d = jnp.where(lane == idx[..., None], jnp.inf, d)
        return d, (mn[..., 0], idx)

    # 3 masked argmin passes beat a sort-based top_k at these shapes
    _, (dists, idxs) = lax.scan(take_min, d2, None, length=3)
    dist = jnp.moveaxis(dists, 0, -1)  # (B, N, 3)
    idx = jnp.moveaxis(idxs, 0, -1)
    # distances are DECIDED in f32 (pairwise_d2, the CUDA semantic) but the
    # sqrt runs in the caller's dtype so f64 parity runs stay double
    dist = dist.astype(unknown.dtype) if unknown.dtype == jnp.float64 else dist
    return jnp.sqrt(jnp.maximum(dist, 0.0)), idx.astype(jnp.int32)


def three_interpolate(points: Array, idx: Array, weight: Array) -> Array:
    """Weighted 3-neighbor feature interpolation.

    Args:
      points: ``(B, M, C)`` source features.
      idx: ``(B, N, 3)`` neighbor indices.
      weight: ``(B, N, 3)`` interpolation weights.

    Returns:
      ``(B, N, C)`` — reference ``interpolate_gpu.cu:77-117``. Differentiable
      in ``points`` (scatter-add bwd) and ``weight``; ``idx`` is integral.
    """
    gathered = group_points(points, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None].astype(gathered.dtype), axis=2)


def three_interpolate_mm(points: Array, idx: Array, weight: Array) -> Array:
    """``three_interpolate`` as one MXU contraction against a sparse
    interpolation matrix: ``P[b, n, m] = sum_k weight[b, n, k] *
    [idx[b, n, k] == m]``, ``out = P @ points``.

    2-3x faster than the gather on TPU (gathers are row-at-a-time there;
    the one-hot fuses into the matmul). Same math as the gather path, but
    the contraction accumulates over m instead of summing 3 gathered terms,
    so results differ from ``three_interpolate`` by fp association only
    (<= 1e-6 relative; tested in tests/test_ops.py). Differentiable in
    ``points`` and ``weight`` like the reference op.
    """
    m = points.shape[1]
    # explicit 3-term sum (same accumulation order as the one_hot().sum
    # formulation) fuses into ONE pass over (B, N, M); the one_hot variant
    # streamed a (B, N, 3, M) intermediate (~3x the HBM traffic, profiled
    # 0.5 ms extra at B=128, N=1024, M=512)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    w = weight.astype(jnp.float32)
    pm = sum((idx[..., k:k + 1] == lane).astype(jnp.float32) * w[..., k:k + 1]
             for k in range(3))  # (B, N, M)
    return jnp.einsum("bnm,bmc->bnc", pm, points.astype(jnp.float32),
                      precision=lax.Precision.HIGHEST).astype(points.dtype)


def three_interpolate_weights(dist: Array) -> Array:
    """Inverse-distance weights used by FP modules (``pointnet2_modules.py:185-189``)."""
    recip = 1.0 / (dist + 1e-8)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)

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


# ---------------------------------------------------------------------------
# Fused 3-NN + inverse-distance interpolation (the whole FP gather stage)
# ---------------------------------------------------------------------------

def _fp_interp_kernel(unk_ref, known_t_ref, feats_ref, out_ref, *,
                      feats_bf16: bool):
    """three_nn + three_interpolate_weights + three_interpolate in one pass.

    The (TN, M) distance matrix, the 3-NN indices, the weights, and the
    (TN, M) interpolation matrix all live in VMEM only; the output is one
    (TN, M) @ (M, C) contraction. With bf16 features the weight matrix is
    split bf16x3 (exact: weights reconstruct to their f32 values, products
    are bf16 x bf16 with f32 accumulation) — 3 DEFAULT-precision passes
    instead of a 6-pass HIGHEST f32 dot.

    Matches ``pointnet2.three_nn`` + ``three_interpolate_weights`` +
    ``three_interpolate_mm`` (association-level fp differences only;
    reference ``interpolate_gpu.cu:77-117``, ``pointnet2_modules.py:185-189``).
    """
    tn = unk_ref.shape[1]
    m = known_t_ref.shape[2]
    a = unk_ref[0]            # (TN, 3)
    bt = known_t_ref[0]       # (3, M)
    feats = feats_ref[0]      # (M, C)

    an = jnp.sum(a * a, axis=1, keepdims=True)
    bn = jnp.sum(bt * bt, axis=0, keepdims=True)
    ab = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    d2 = jnp.maximum(an + bn - 2.0 * ab, 0.0)  # (TN, M)

    lane = lax.broadcasted_iota(jnp.int32, (tn, m), 1)
    recips = []
    sels = []
    for _ in range(3):
        mn = jnp.min(d2, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(d2 == mn, lane, m), axis=1, keepdims=True)
        d2 = jnp.where(lane == sel, jnp.inf, d2)
        recips.append(1.0 / (jnp.sqrt(mn) + 1e-8))
        sels.append(sel)
    norm = (recips[0] + recips[1] + recips[2])
    w = jnp.zeros((tn, m), jnp.float32)
    for recip, sel in zip(recips, sels):
        w = w + jnp.where(lane == sel, recip / norm, 0.0)

    if feats_bf16:
        w_hi = w.astype(jnp.bfloat16)
        r1 = w - w_hi.astype(jnp.float32)
        w_mid = r1.astype(jnp.bfloat16)
        w_lo = (r1 - w_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        f16 = feats.astype(jnp.bfloat16)
        out = (jnp.dot(w_hi, f16, preferred_element_type=jnp.float32)
               + jnp.dot(w_mid, f16, preferred_element_type=jnp.float32)
               + jnp.dot(w_lo, f16, preferred_element_type=jnp.float32))
    else:
        out = jnp.dot(w, feats.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3,))
def fp_interpolate_pallas(unknown: Array, known: Array, feats: Array,
                          interpret: bool = False) -> Array:
    """``(B, N, 3), (B, M, 3), (B, M, C) -> (B, N, C)`` interpolated features.

    Output dtype follows ``feats``. Like the reference's non-differentiable
    ThreeNN (``pointnet2_utils.py:144-146``), gradients flow ONLY into
    ``feats`` — use :func:`fp_interpolate` for the custom-VJP wrapper.
    """
    b, n, _ = unknown.shape
    m_real = known.shape[1]
    c = feats.shape[-1]
    tn = min(n, 1024)
    if n % tn:
        raise ValueError(f"fp_interpolate_pallas needs N%{tn}==0, got N={n}")
    m = -(-m_real // 128) * 128
    known = known.astype(jnp.float32)
    if m != m_real:
        pad = jnp.full((b, m - m_real, 3), _PAD_COORD, jnp.float32)
        known = jnp.concatenate([known, pad], axis=1)
        feats = jnp.concatenate(
            [feats, jnp.zeros((b, m - m_real, c), feats.dtype)], axis=1)
    known_t = jnp.swapaxes(known, 1, 2)
    feats_bf16 = feats.dtype == jnp.bfloat16
    grid = (b, n // tn)
    out = pl.pallas_call(
        functools.partial(_fp_interp_kernel, feats_bf16=feats_bf16),
        out_shape=jax.ShapeDtypeStruct((b, n, c), feats.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(unknown.astype(jnp.float32), known_t, feats)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fp_interpolate(unknown: Array, known: Array, feats: Array,
                   interpret: bool = False) -> Array:
    """Differentiable fused FP interpolation (grad flows into feats only,
    matching the reference's non-diff ThreeNN + ThreeInterpolate's
    features-only backward, ``pointnet2_utils.py:144-146,181-203``)."""
    return fp_interpolate_pallas(unknown, known, feats, interpret)


def _fpi_fwd(unknown, known, feats, interpret):
    return fp_interpolate(unknown, known, feats, interpret), (unknown, known)


def _fpi_bwd(interpret, res, g):
    import istnet_tpu.ops.pointnet2 as _xla

    unknown, known = res
    dist, idx = three_nn_pallas(unknown, known, interpret=interpret)
    weight = _xla.three_interpolate_weights(dist)
    m = known.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    w = weight.astype(jnp.float32)
    pm = sum((idx[..., k:k + 1] == lane).astype(jnp.float32) * w[..., k:k + 1]
             for k in range(3))  # (B, N, M)
    g_feats = jnp.einsum("bnm,bnc->bmc", pm, g.astype(jnp.float32),
                         precision=lax.Precision.HIGHEST)
    return (jnp.zeros_like(unknown), jnp.zeros_like(known),
            g_feats.astype(g.dtype))


fp_interpolate.defvjp(_fpi_fwd, _fpi_bwd)

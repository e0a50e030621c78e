"""Fused Pallas TPU kernel for ip_basic multiscale depth completion.

The XLA pipeline (``data/device_preprocess.fill_in_multiscale_tpu``) is ~15
sequential full-image passes — every dilation/selection round-trips the
(B, 480, 640) f32 batch through HBM (profiled ~10 ms of the 73 ms train step
at B=24, dominated by ``reduce_window_max`` at ~185 GB/s). This kernel runs
the ENTIRE morphology chain on one image per program with every intermediate
plane resident in VMEM: one HBM read and one write per image.

Algorithm and edge semantics are copied 1:1 from the XLA version (itself
golden-tested against the cv2 reference, ``utils/data_utils.py:357-534``):

- dilations pad -inf (shift = static slice + -inf concat; separable for the
  9x9, fused footprint otherwise);
- the 5x5 median uses edge-replicate borders and the SAME rank-12 pruned
  Batcher selection network (``_MEDIAN25_CES``) — bit-identical min/max
  sequence; processed in 128-column chunks so only (H, 132)-sized tap
  planes are live (32 full planes would blow VMEM);
- the 5x5 disk bilateral uses reflect-101 borders;
- the top-mask is exact: full columns are present in every program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from istnet_tpu.data import device_preprocess as dp

Array = jax.Array

_VALID = dp._VALID
_NEG = -3.4e38  # effectively -inf; keeps the negate-for-erode trick finite
_CHUNK = 256    # median/bilateral column-chunk width (tap-liveness knob;
                # 256 measured ~9% faster than 128, 64 slower — fill_bench)


def _shift_rows(x: Array, dy: int, mode: str) -> Array:
    """tap[i, :] = x[i+dy, :] with out-of-range rows by ``mode``
    (neg: -inf, edge: replicate, reflect: reflect-101). Static slices only."""
    h = x.shape[0]
    if dy == 0:
        return x
    k = abs(dy)
    if mode == "neg":
        pad = jnp.full((k, x.shape[1]), _NEG, x.dtype)
    elif mode == "edge":
        row = x[h - 1:h] if dy > 0 else x[0:1]
        pad = jnp.concatenate([row] * k, axis=0)
    else:  # reflect-101
        rows = ([x[h - 2 - i:h - 1 - i] for i in range(k)] if dy > 0
                else [x[i + 1:i + 2] for i in range(k - 1, -1, -1)])
        pad = jnp.concatenate(rows, axis=0)
    if dy > 0:
        return jnp.concatenate([x[dy:], pad], axis=0)
    return jnp.concatenate([pad, x[:h - k]], axis=0)


def _shift_cols(x: Array, dx: int, mode: str) -> Array:
    """Column version of ``_shift_rows``.

    ``neg`` (the full-plane dilation taps) uses a lane roll + masked fill —
    one rotate + select instead of materializing concat(slice, pad) copies
    on the lane axis; ``edge``/``reflect`` keep the concat form (only used
    on narrow chunk halos)."""
    w = x.shape[1]
    if dx == 0:
        return x
    k = abs(dx)
    if mode == "neg":
        lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        rolled = pltpu.roll(x, (-dx) % w, axis=1)
        if dx > 0:
            return jnp.where(lane < w - k, rolled, _NEG)
        return jnp.where(lane >= k, rolled, _NEG)
    if mode == "edge":
        col = x[:, w - 1:w] if dx > 0 else x[:, 0:1]
        pad = jnp.concatenate([col] * k, axis=1)
    else:  # reflect-101
        cols = ([x[:, w - 2 - i:w - 1 - i] for i in range(k)] if dx > 0
                else [x[:, i + 1:i + 2] for i in range(k - 1, -1, -1)])
        pad = jnp.concatenate(cols, axis=1)
    if dx > 0:
        return jnp.concatenate([x[:, dx:], pad], axis=1)
    return jnp.concatenate([pad, x[:, :w - k]], axis=1)


def _row_max(x: Array, radius: int) -> Array:
    out = x
    for dy in range(-radius, radius + 1):
        if dy:
            out = jnp.maximum(out, _shift_rows(x, dy, "neg"))
    return out


def _col_max(x: Array, radius: int) -> Array:
    out = x
    for dx in range(-radius, radius + 1):
        if dx:
            out = jnp.maximum(out, _shift_cols(x, dx, "neg"))
    return out


def _dilate_full(x: Array, radius: int) -> Array:
    return _col_max(_row_max(x, radius), radius)  # rectangle max separates


def _dilate_cross(x: Array, radius: int) -> Array:
    return jnp.maximum(_row_max(x, radius), _col_max(x, radius))


def _erode_full(x: Array, radius: int) -> Array:
    return -_dilate_full(-x, radius)


def _median5_plane(x: Array, chunk: int | None = None) -> Array:
    """5x5 median, edge borders — same shared-column-sort + pruned-merge
    network as the XLA path (dp._SORT5_CES / dp._MEDIAN25_SC_CES): the
    vertical quintuples are sorted ONCE on full planes (9 CEs, shared by all
    horizontal shifts and chunks), then the 82-CE merge runs per column
    chunk to bound tap liveness. Bit-identical to any correct median."""
    chunk = chunk or _CHUNK
    w = x.shape[1]
    cols = [_shift_rows(x, dy, "edge") for dy in range(-2, 3)]
    _apply_ces(cols, dp._SORT5_CES)
    outs = []
    for c0 in range(0, w, chunk):
        c1 = min(c0 + chunk, w)
        xcs = []
        for p in cols:
            # edge-replicated 2-col halos (exact left/right border handling;
            # border-clamp commutes with the vertical sort)
            lcols = ([p[:, 0:1]] * 2 if c0 == 0
                     else [p[:, c0 - 2:c0 - 1], p[:, c0 - 1:c0]])
            rcols = ([p[:, w - 1:w]] * 2 if c1 == w
                     else [p[:, c1:c1 + 1], p[:, c1 + 1:c1 + 2]])
            xcs.append(jnp.concatenate(lcols + [p[:, c0:c1]] + rcols, axis=1))
        taps = [xc[:, 2 + dx:2 + dx + (c1 - c0)]
                for dx in range(-2, 3) for xc in xcs]
        _apply_ces(taps, dp._MEDIAN25_SC_CES)
        outs.append(taps[dp._MEDIAN25_SC_OUT])
    return jnp.concatenate(outs, axis=1)


def _apply_ces(taps: list, ces: list) -> None:
    for a, b in ces:
        lo = jnp.minimum(taps[a], taps[b])
        hi = jnp.maximum(taps[a], taps[b])
        taps[a], taps[b] = lo, hi


def _bilateral5_plane(x: Array, chunk: int | None = None,
                      sigma_color: float = 0.5,
                      sigma_space: float = 2.0) -> Array:
    """5x5 disk bilateral, reflect-101 borders (cv2.bilateralFilter)."""
    chunk = chunk or _CHUNK
    h, w = x.shape
    offs = dp._footprint_offsets("disk", 2)
    sws = [float(np.exp(-0.5 * (dy * dy + dx * dx) / sigma_space ** 2))
           for dy, dx in offs]
    outs = []
    for c0 in range(0, w, chunk):
        c1 = min(c0 + chunk, w)
        if c0 == 0:
            lcols = [x[:, 2:3], x[:, 1:2]]          # reflect-101 of -2, -1
        else:
            lcols = [x[:, c0 - 2:c0 - 1], x[:, c0 - 1:c0]]
        if c1 == w:
            rcols = [x[:, w - 2:w - 1], x[:, w - 3:w - 2]]  # w, w+1 reflected
        else:
            rcols = [x[:, c1:c1 + 1], x[:, c1 + 1:c1 + 2]]
        xc = jnp.concatenate(lcols + [x[:, c0:c1]] + rcols, axis=1)
        cen = xc[:, 2:2 + (c1 - c0)]
        num = jnp.zeros_like(cen)
        den = jnp.zeros_like(cen)
        for (dy, dx), sw in zip(offs, sws):
            t = _shift_rows(xc, dy, "reflect")[:, 2 + dx:2 + dx + (c1 - c0)]
            wgt = sw * jnp.exp(-0.5 * jnp.square(t - cen) / sigma_color ** 2)
            num = num + wgt * t
            den = den + wgt
        outs.append(num / den)
    return jnp.concatenate(outs, axis=1)


def _top_mask_plane(x: Array) -> Array:
    """rows >= first-valid-row per column; all-true for empty columns."""
    h = x.shape[0]
    valid = x > _VALID
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    first = jnp.min(jnp.where(valid, rows, h), axis=0, keepdims=True)
    first = jnp.where(first == h, 0, first)  # empty column -> all rows
    return rows >= first


def _fill_kernel(depth_ref, out_ref, *, max_depth: float):
    x0 = depth_ref[0].astype(jnp.float32)          # (H, W)

    near = (x0 > _VALID) & (x0 <= 1.0)
    med = (x0 > 1.0) & (x0 <= 2.0)
    far = x0 > 2.0
    x = jnp.where(x0 > _VALID, max_depth - x0, x0)

    inv0 = x
    for mask, r in ((far, 1), (med, 2), (near, 3)):
        d = _dilate_cross(jnp.where(mask, inv0, 0.0), r)
        x = jnp.where(d > _VALID, d, x)

    x = _erode_full(_dilate_full(x, 2), 2)         # 5x5 closing

    m = _median5_plane(x)
    x = jnp.where(x > _VALID, m, x)

    top = _top_mask_plane(x)
    d = _dilate_full(x, 4)                         # 9x9 hole fill
    x = jnp.where((~(x > _VALID)) & top, d, x)

    top = _top_mask_plane(x)
    for _ in range(6):
        d = _dilate_full(x, 2)
        x = jnp.where((x < _VALID) & top, d, x)

    m = _median5_plane(x)
    valid = (x > _VALID) & top
    x = jnp.where(valid, m, x)

    b = _bilateral5_plane(x)
    x = jnp.where(valid, b, x)                     # reference reuses the mask

    out_ref[0] = jnp.where(x > _VALID, max_depth - x, x)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fill_in_multiscale_pallas(depth: Array, max_depth: float = 3.0,
                              interpret: bool = False) -> Array:
    """Batched ip_basic depth completion, one fused kernel per image.

    ``(B, H, W) meters -> completed``; matches ``fill_in_multiscale_tpu``
    (same op sequence and border semantics, fp-identical min/max chains; the
    bilateral's exp/divide may differ in the last ulp)."""
    b, h, w = depth.shape
    if w % 128 or h % 8:
        # the chunked median/bilateral halo slices assume 128-col chunks
        raise ValueError(f"fill_in_multiscale_pallas needs W%128==0 and "
                         f"H%8==0, got H={h} W={w} (use the XLA path)")
    return pl.pallas_call(
        functools.partial(_fill_kernel, max_depth=max_depth),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # the unrolled morphology chain holds ~60 (H, W) f32 temporaries at
        # its liveness peak (~74 MB at 480x640) — raise Mosaic's 16 MB
        # scoped-vmem default toward the chip's 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(depth.astype(jnp.float32))

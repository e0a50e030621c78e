"""Device-side (TPU) preprocessing: batched morphological depth completion
and backprojection as one jitted XLA program.

The reference runs ip_basic depth completion per image on the CPU with a
dozen OpenCV calls (``utils/data_utils.py:199-510``) — ~25 ms/image, which at
the 24-image training batch makes the host the bottleneck. Here the same
pipeline is XLA: dilations are ``lax.reduce_window`` max-pools over kernel
footprints, the 5x5 median is a sort over a 25-tap patch tensor, the
bilateral filter is a direct 21-tap weighted sum — all batched over the image
axis and fused by XLA. Output matches the cv2 pipeline to sub-mm tolerance
(see tests/test_device_preprocess.py).

``backproject_batch`` converts completed depth to camera-space point maps on
device (``dataset.py:204-208``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

_VALID = 0.01


def _footprint_offsets(kind: str, radius: int) -> list[tuple[int, int]]:
    offs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if kind == "cross" and not (dy == 0 or dx == 0):
                continue
            if kind == "disk" and dy * dy + dx * dx > radius * radius:
                continue
            offs.append((dy, dx))
    return offs


def _dilate(x: Array, kind: str, radius: int) -> Array:
    """Max over a footprint; out-of-bounds contributes -inf (cv2 dilate)."""
    if kind == "full":
        return lax.reduce_window(
            x, -jnp.inf, lax.max,
            (1, 2 * radius + 1, 2 * radius + 1), (1, 1, 1),
            [(0, 0), (radius, radius), (radius, radius)])
    # cross: separable union of a horizontal and a vertical segment
    h = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2 * radius + 1),
                          (1, 1, 1), [(0, 0), (0, 0), (radius, radius)])
    v = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2 * radius + 1, 1),
                          (1, 1, 1), [(0, 0), (radius, radius), (0, 0)])
    return jnp.maximum(h, v)


def _erode(x: Array, radius: int) -> Array:
    return -lax.reduce_window(
        -x, -jnp.inf, lax.max, (1, 2 * radius + 1, 2 * radius + 1),
        (1, 1, 1), [(0, 0), (radius, radius), (radius, radius)])


def _patches(x: Array, offsets, pad_mode: str) -> Array:
    """Stack shifted copies: (B, H, W) -> (B, H, W, len(offsets))."""
    b, h, w = x.shape
    r = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode=pad_mode)
    taps = [lax.dynamic_slice(xp, (0, r + dy, r + dx), (b, h, w))
            for dy, dx in offsets]
    return jnp.stack(taps, axis=-1)


def _median5(x: Array) -> Array:
    """5x5 median with replicated borders (cv2.medianBlur)."""
    offs = _footprint_offsets("full", 2)
    p = _patches(x, offs, "edge")
    return jnp.sort(p, axis=-1)[..., 12]


def _bilateral5(x: Array, sigma_color: float = 0.5, sigma_space: float = 2.0) -> Array:
    """5x5 (disk) bilateral, reflect-101 borders (cv2.bilateralFilter)."""
    offs = _footprint_offsets("disk", 2)
    sw = jnp.asarray([np.exp(-0.5 * (dy * dy + dx * dx) / sigma_space ** 2)
                      for dy, dx in offs], jnp.float32)
    p = _patches(x, offs, "reflect")
    diff = p - x[..., None]
    w = sw * jnp.exp(-0.5 * jnp.square(diff) / sigma_color ** 2)
    return jnp.sum(w * p, axis=-1) / jnp.sum(w, axis=-1)


def _top_mask(x: Array) -> Array:
    """rows >= first-valid-row per column; all-true for empty columns."""
    valid = x > _VALID
    first = jnp.argmax(valid, axis=1)  # (B, W); 0 when column empty
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return rows >= first[:, None, :]


@jax.jit
def fill_in_multiscale_tpu(depth: Array, max_depth: float = 3.0) -> Array:
    """Batched ip_basic depth completion: (B, H, W) meters -> completed."""
    x = depth.astype(jnp.float32)
    near = (x > _VALID) & (x <= 1.0)
    med = (x > 1.0) & (x <= 2.0)
    far = x > 2.0

    x = jnp.where(x > _VALID, max_depth - x, x)

    # all three band dilations read the ORIGINAL inverted depths; results are
    # then combined farthest-to-nearest (data_utils.py:399-420)
    inv0 = x
    for mask, r in ((far, 1), (med, 2), (near, 3)):
        d = _dilate(jnp.where(mask, inv0, 0.0), "cross", r)
        x = jnp.where(d > _VALID, d, x)

    x = _erode(_dilate(x, "full", 2), 2)  # 5x5 closing

    m = _median5(x)
    x = jnp.where(x > _VALID, m, x)

    top = _top_mask(x)
    d = _dilate(x, "full", 4)  # 9x9 hole fill
    x = jnp.where((~(x > _VALID)) & top, d, x)

    top = _top_mask(x)
    for _ in range(6):
        d = _dilate(x, "full", 2)
        x = jnp.where((x < _VALID) & top, d, x)

    m = _median5(x)
    valid = (x > _VALID) & top
    x = jnp.where(valid, m, x)

    b = _bilateral5(x)
    x = jnp.where(valid, b, x)  # reference reuses the median-step mask

    return jnp.where(x > _VALID, max_depth - x, x)


@functools.partial(jax.jit, static_argnums=(2,))
def backproject_batch(depth: Array, intrinsics: Array, norm_scale: float = 1000.0) -> Array:
    """(B, H, W) depth (mm) + (4,) [fx, fy, cx, cy] -> (B, H, W, 3) meters."""
    b, h, w = depth.shape
    fx, fy, cx, cy = intrinsics
    z = depth.astype(jnp.float32) / norm_scale
    xs = lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ys = lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    return jnp.stack([(xs - cx) * z / fx, (ys - cy) * z / fy, z], axis=-1)


def fill_missing_tpu(depth_mm: Array, cam_scale: float = 1000.0,
                     scale_2_80m: float = 1.0) -> Array:
    """Drop-in for ``depth_utils.fill_missing`` running on device, batched."""
    x = depth_mm.astype(jnp.float32) / cam_scale * scale_2_80m
    out = fill_in_multiscale_tpu(x, 3.0)
    return out / scale_2_80m * cam_scale

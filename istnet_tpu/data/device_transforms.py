"""On-device (batched, jittable) ColorJitter.

The reference jitters each RGB crop on the host with torchvision's
ColorJitter(0.2, 0.2, 0.2, 0.05) (``provider/dataset.py:102-105``): four
adjustments — brightness, contrast, saturation, hue — each with a uniformly
sampled factor, applied in a random order. Here the same transform runs
batched on the TPU inside the train step, as float math on 0..255 images:

- brightness: ``img * f``                                  (PIL Brightness)
- contrast:   blend with the scalar mean of the grayscale  (PIL Contrast)
- saturation: blend with the per-pixel grayscale           (PIL Color)
- hue:        HSV hue rotation by ``f`` turns              (torchvision F.adjust_hue)

Differences from the host/PIL path (deliberate, training-noise level):
float pipeline (no uint8 quantization between ops, <1/255 per op) and an
exact float grayscale mean where PIL rounds to an int. Per-sample random
ORDER is preserved (a (B,) permutation index selects one of the 24 op
orders per sample).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

Array = jax.Array

_GRAY = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # ITU-R 601-2, PIL "L"
_ORDERS = tuple(itertools.permutations(range(4)))  # 24 orders of 4 ops


def adjust_brightness(img: Array, f: Array) -> Array:
    return jnp.clip(img * f, 0.0, 255.0)


def adjust_contrast(img: Array, f: Array) -> Array:
    gray_mean = jnp.mean(img @ _GRAY, axis=(-2, -1), keepdims=True)[..., None]
    return jnp.clip(gray_mean + f * (img - gray_mean), 0.0, 255.0)


def adjust_saturation(img: Array, f: Array) -> Array:
    gray = (img @ _GRAY)[..., None]
    return jnp.clip(gray + f * (img - gray), 0.0, 255.0)


def _rgb_to_hsv(rgb: Array) -> Array:
    """0..1 rgb -> h, s, v in 0..1 (h in turns)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    c = mx - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(mx == r, (g - b) / safe_c,
                  jnp.where(mx == g, 2.0 + (b - r) / safe_c,
                            4.0 + (r - g) / safe_c))
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(mx > 0, c / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: Array) -> Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img: Array, f: Array) -> Array:
    """Rotate hue by ``f`` turns (f in [-0.5, 0.5], broadcastable to the
    (..., H, W) hue plane); img 0..255."""
    hsv = _rgb_to_hsv(img / 255.0)
    h = (hsv[..., 0] + f) % 1.0
    out = _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    return jnp.clip(out * 255.0, 0.0, 255.0)


def color_jitter_batch(rgb: Array, key: Array, brightness: float = 0.2,
                       contrast: float = 0.2, saturation: float = 0.2,
                       hue: float = 0.05) -> Array:
    """Batched ColorJitter on (B, H, W, 3) float 0..255 images.

    Per-sample factors AND per-sample op order (torchvision semantics:
    factors ~ U(1-x, 1+x), hue ~ U(-hue, hue), order a random permutation).
    """
    b = rgb.shape[0]
    k_f, k_o = jax.random.split(key)
    kb, kc, ks, kh = jax.random.split(k_f, 4)
    f_b = jax.random.uniform(kb, (b, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    f_c = jax.random.uniform(kc, (b, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    f_s = jax.random.uniform(ks, (b, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    f_h = jax.random.uniform(kh, (b, 1, 1), minval=-hue, maxval=hue)
    order_id = jax.random.randint(k_o, (b,), 0, len(_ORDERS))
    # op id applied at step s for each sample: (B, 4) lookup table
    orders = jnp.asarray(_ORDERS, jnp.int32)  # (24, 4)
    per_sample = orders[order_id]  # (B, 4)

    img = rgb.astype(jnp.float32)
    for step in range(4):
        op = per_sample[:, step]  # (B,)
        cand = [adjust_brightness(img, f_b), adjust_contrast(img, f_c),
                adjust_saturation(img, f_s), adjust_hue(img, f_h)]
        img = cand[0]
        for op_id in range(1, 4):
            img = jnp.where((op == op_id)[:, None, None, None], cand[op_id], img)
    return img

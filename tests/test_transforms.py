"""Host ColorJitter parity pins (round-1 finding: only parity surface untested).

The reference jitters crops with torchvision ColorJitter(0.2, 0.2, 0.2, 0.05)
(``provider/dataset.py:102-105``); torchvision's PIL backend implements the
four adjustments with ImageEnhance + a uint8 HSV hue shift — exactly what
``istnet_tpu.data.transforms.color_jitter`` does. torchvision itself is not
installed in this image, so parity is pinned two ways:

1. each PIL op vs an INDEPENDENT float reimplementation of its documented
   math (error bounded by uint8 rounding, <= 1 LSB per op);
2. byte-exact golden checksums of the full jitter for fixed seeds — any
   drift in op order, factor sampling, or the PIL pipeline fails loudly.
"""

import hashlib

import numpy as np
from PIL import Image, ImageEnhance

from istnet_tpu.data.transforms import color_jitter

GRAY = np.array([0.299, 0.587, 0.114], np.float64)  # ITU-R 601-2 (PIL "L")


def _img(seed=0, h=24, w=24):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)


def test_brightness_matches_float_math():
    img = _img(1)
    for f in (0.8, 0.95, 1.0, 1.2):
        got = np.asarray(ImageEnhance.Brightness(Image.fromarray(img)).enhance(f),
                         np.float64)
        want = np.clip(img.astype(np.float64) * f, 0, 255)
        assert np.abs(got - want).max() <= 1.0, f"brightness {f}"


def test_contrast_matches_float_math():
    img = _img(2)
    # PIL contrast blends with the ROUNDED mean of the L (grayscale) image
    gray = (img.astype(np.float64) @ GRAY)
    mean = int(gray.round().mean() + 0.5)
    for f in (0.8, 1.0, 1.2):
        got = np.asarray(ImageEnhance.Contrast(Image.fromarray(img)).enhance(f),
                         np.float64)
        want = np.clip(mean + f * (img.astype(np.float64) - mean), 0, 255)
        assert np.abs(got - want).max() <= 1.5, f"contrast {f}"


def test_saturation_matches_float_math():
    img = _img(3)
    gray = (img.astype(np.float64) @ GRAY).round()[..., None]
    for f in (0.8, 1.0, 1.2):
        got = np.asarray(ImageEnhance.Color(Image.fromarray(img)).enhance(f),
                         np.float64)
        want = np.clip(gray + f * (img.astype(np.float64) - gray), 0, 255)
        assert np.abs(got - want).max() <= 1.5, f"saturation {f}"


def test_hue_shift_wraps_uint8_wheel():
    """Hue path: uint8 HSV roundtrip with (px + int(f*255)) % 256 — matches
    torchvision F_pil.adjust_hue's np_h += np.uint8(f*255) wraparound."""
    img = _img(4)
    pil = Image.fromarray(img)
    for f in (-0.05, 0.03):
        h, s, v = pil.convert("HSV").split()
        want_h = (np.asarray(h, np.int32) + int(f * 255)) % 256
        h2 = h.point(lambda px, d=int(f * 255): (px + d) % 256)
        np.testing.assert_array_equal(np.asarray(h2), want_h.astype(np.uint8))
        # full-pipeline shift preserves value channel exactly
        out = Image.merge("HSV", (h2, s, v)).convert("RGB")
        out_v = np.asarray(Image.fromarray(np.asarray(out)).convert("HSV"))[..., 2]
        np.testing.assert_allclose(out_v.astype(int), np.asarray(v, int), atol=2)


def test_color_jitter_identity_when_zero_ranges():
    img = _img(5)
    out = color_jitter(img, np.random.RandomState(0),
                       brightness=0, contrast=0, saturation=0, hue=0)
    np.testing.assert_array_equal(out, img)


def test_color_jitter_factor_and_order_sampling():
    """Factors drawn uniformly from the torchvision ranges, in the fixed
    draw order (b, c, s, h), then applied in a permuted order."""
    img = _img(6)

    class SpyRng:
        def __init__(self):
            self.calls = []
            self._r = np.random.RandomState(0)

        def uniform(self, lo, hi):
            self.calls.append(("uniform", lo, hi))
            return self._r.uniform(lo, hi)

        def permutation(self, n):
            self.calls.append(("permutation", n))
            return self._r.permutation(n)

    spy = SpyRng()
    color_jitter(img, spy)
    assert spy.calls[:4] == [("uniform", 0.8, 1.2), ("uniform", 0.8, 1.2),
                             ("uniform", 0.8, 1.2), ("uniform", -0.05, 0.05)]
    assert spy.calls[4] == ("permutation", 4)


def test_color_jitter_golden_regression():
    """Byte-exact pins: catches any silent drift in the jitter pipeline."""
    digests = []
    for seed in (0, 1, 2):
        out = color_jitter(_img(seed, 16, 16), np.random.RandomState(seed))
        digests.append(hashlib.sha256(out.tobytes()).hexdigest()[:16])
    assert digests == ["c8172d8e3d58ba95", "3b9bdd2bdabbc753", "89dfe18b4c09a6ee"], digests

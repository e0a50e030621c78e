"""Device-side instance preprocessing vs the host TestDataset math."""

import jax
import jax.numpy as jnp
import numpy as np

from istnet_tpu.data.dataset import update_choose_for_resize
from istnet_tpu.data.depth_utils import backproject, get_bbox
from istnet_tpu.data.device_preprocess import (
    preprocess_instances_tpu, square_crop_bounds)

INTR = [577.5, 577.5, 319.5, 239.5]


def _scene(rng, h=480, w=640):
    depth = np.zeros((h, w), np.float32)
    depth[100:300, 200:400] = 900 + 100 * rng.rand(200, 200)
    mask = np.zeros((h, w), bool)
    mask[120:280, 220:380] = True
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    bbox = [120, 220, 280, 380]
    return rgb, depth, mask, bbox


def test_square_crop_bounds_matches_get_bbox():
    rng = np.random.RandomState(0)
    boxes = []
    for _ in range(50):
        y1, x1 = rng.randint(0, 400), rng.randint(0, 560)
        y2 = y1 + rng.randint(10, 479 - y1) if y1 < 469 else 479
        x2 = x1 + rng.randint(10, 639 - x1) if x1 < 629 else 639
        boxes.append([y1, x1, min(y2, 479), min(x2, 639)])
    got = np.asarray(square_crop_bounds(jnp.asarray(np.array(boxes, np.int32))))
    for i, b in enumerate(boxes):
        want = get_bbox(b)
        np.testing.assert_array_equal(got[i], want, err_msg=f"box {b}")


def test_device_instance_preprocess_consistency():
    rng = np.random.RandomState(1)
    rgb, depth, mask, bbox = _scene(rng)
    out = jax.jit(lambda k: preprocess_instances_tpu(
        jnp.asarray(rgb[None]), jnp.asarray(depth[None]),
        jnp.asarray(mask[None]), jnp.asarray(np.array([bbox], np.int32)),
        jnp.asarray(INTR, jnp.float32), k, img_size=192, sample_num=256))(
            jax.random.PRNGKey(0))

    pts = np.asarray(out["pts"][0])
    choose = np.asarray(out["choose"][0])
    n_valid = int(out["n_valid"][0])

    # every sampled point must be a true in-mask backprojected pixel
    # (compare by distance: host/device backprojection differ in fp op order)
    full_pts = backproject(depth, INTR)
    valid_pts = full_pts[mask & (depth > 0)]
    assert n_valid == int((mask & (depth > 0)).sum())
    d = np.linalg.norm(pts[:, None, :] - valid_pts[None, :, :], axis=-1).min(axis=1)
    assert float(d.max()) < 1e-5, f"farthest sampled point {d.max()} m from mask"

    # choose indices lie inside the resized crop
    assert choose.min() >= 0 and choose.max() < 192 * 192

    # choose remap agrees with the host formula for recovered crop coords
    rmin, rmax, cmin, cmax = get_bbox(bbox)
    crop_w = rmax - rmin
    # recover crop-flat indices from the sampled points via the depth map
    # (host formula check on a synthetic index set instead):
    idx = rng.randint(0, crop_w * crop_w, 100)
    want = update_choose_for_resize(idx, crop_w, 192)
    ratio = 192 / crop_w
    got = (np.floor(idx // crop_w * ratio) * 192 + np.floor(idx % crop_w * ratio))
    np.testing.assert_array_equal(got.astype(np.int64), want)

    # without-replacement while enough pixels: all sampled indices distinct
    assert len(np.unique(choose)) > 200  # 256 samples, collisions only from resize rounding

    # normalized rgb is finite and centered
    r = np.asarray(out["rgb"][0])
    assert np.isfinite(r).all() and abs(float(r.mean())) < 3.0


def test_device_instance_preprocess_few_pixels_wraps():
    rng = np.random.RandomState(2)
    rgb, depth, mask, bbox = _scene(rng)
    small = np.zeros_like(mask)
    small[150:154, 250:254] = True  # 16 valid pixels < sample_num
    out = preprocess_instances_tpu(
        jnp.asarray(rgb[None]), jnp.asarray(depth[None]),
        jnp.asarray(small[None]), jnp.asarray(np.array([bbox], np.int32)),
        jnp.asarray(INTR, jnp.float32), jax.random.PRNGKey(1),
        img_size=192, sample_num=64)
    assert int(out["n_valid"][0]) == 16
    pts = np.asarray(out["pts"][0])
    assert np.isfinite(pts).all()
    assert len(np.unique(pts.round(6), axis=0)) == 16  # wrapped repeats


def test_train_preprocess_qo_matches_host_formula():
    rng = np.random.RandomState(5)
    rgb, depth, mask, bbox = _scene(rng)
    r = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.95], np.float32)
    s = np.array([0.1, 0.2, 0.1], np.float32)
    out = jax.jit(lambda k: __import__(
        "istnet_tpu.data.device_preprocess", fromlist=["x"]
    ).preprocess_train_instances_tpu(
        jnp.asarray(rgb[None]), jnp.asarray(depth[None]),
        jnp.asarray(mask[None]), jnp.asarray(np.array([bbox], np.int32)),
        jnp.asarray(INTR, jnp.float32), jnp.asarray(r[None]),
        jnp.asarray(t[None]), jnp.asarray(s[None]), k,
        img_size=192, sample_num=256))(jax.random.PRNGKey(3))
    pts = np.asarray(out["pts"][0])
    qo = np.asarray(out["qo"][0])
    want = (pts - t) / (np.linalg.norm(s) + 1e-8) @ r
    np.testing.assert_allclose(qo, want, rtol=1e-4, atol=1e-6)
    # jitter applied: points no longer exactly on the backprojection lattice
    z_mm = pts[:, 2] * 1000
    assert not np.allclose(z_mm, np.round(z_mm), atol=1e-4)


def test_searchsorted_blocked_matches_jnp():
    """Closed-form blocked search == jnp.searchsorted(side='left') on 0/1
    CDFs, incl. empty, sparse, and saturated masks."""
    import jax.numpy as jnp
    from istnet_tpu.data.device_preprocess import (_blocked_cdf,
                                                   _searchsorted_blocked)

    rng = np.random.RandomState(5)
    for n, p in [(1000, 0.3), (193_600, 0.02), (193_600, 0.9), (300, 0.0)]:
        ok = jnp.asarray(rng.rand(n) < p)
        cdf = jnp.cumsum(ok.astype(jnp.int32))
        count = int(cdf[-1])
        targets = jnp.asarray(
            np.unique(np.clip(rng.randint(1, max(count, 1) + 1, 256),
                              1, max(count, 1))).astype(np.int32))
        intra, block_end = _blocked_cdf(ok)
        got = _searchsorted_blocked(intra, block_end, targets, n=n)
        want = jnp.searchsorted(cdf, targets, side="left").astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_chunked_preprocess_is_bit_identical():
    """The memory-bound chunked path (vmap within chunks, lax.map across —
    prevents XLA's per-instance serialization at large B) must produce
    exactly the full-vmap outputs."""
    rng = np.random.RandomState(7)
    rgbs, depths, masks, boxes = [], [], [], []
    for _ in range(8):
        rgb, depth, mask, bbox = _scene(rng)
        rgbs.append(rgb); depths.append(depth); masks.append(mask); boxes.append(bbox)
    args = (jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(depths)),
            jnp.asarray(np.stack(masks)),
            jnp.asarray(np.array(boxes, np.int32)),
            jnp.asarray(INTR, jnp.float32), jax.random.PRNGKey(3))
    kw = dict(img_size=96, sample_num=128)
    full = preprocess_instances_tpu(*args, **kw, chunk=8)
    chunked = preprocess_instances_tpu(*args, **kw, chunk=2)
    # sampling indices and gathered points are exact; the resized rgb goes
    # through float resize matmuls whose accumulation order depends on the
    # batch shape — allclose there
    for k in ("pts", "choose", "n_valid"):
        np.testing.assert_array_equal(np.asarray(full[k]), np.asarray(chunked[k]),
                                      err_msg=k)
    np.testing.assert_allclose(np.asarray(full["rgb"]), np.asarray(chunked["rgb"]),
                               atol=1e-3)

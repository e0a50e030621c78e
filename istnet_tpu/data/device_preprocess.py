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
        if radius < 3:
            # one fused 2-D window: at small radii the op is HBM-bound, so a
            # separable pair (2 full read+write passes) measures SLOWER
            return lax.reduce_window(
                x, -jnp.inf, lax.max,
                (1, 2 * radius + 1, 2 * radius + 1), (1, 1, 1),
                [(0, 0), (radius, radius), (radius, radius)])
        # large radii: rectangle max separates exactly (rows then cols),
        # (2r+1)^2 -> 2(2r+1) comparisons per pixel
        h = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2 * radius + 1),
                              (1, 1, 1), [(0, 0), (0, 0), (radius, radius)])
        return lax.reduce_window(h, -jnp.inf, lax.max, (1, 2 * radius + 1, 1),
                                 (1, 1, 1), [(0, 0), (radius, radius), (0, 0)])
    # cross: union of a horizontal and a vertical segment
    h = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2 * radius + 1),
                          (1, 1, 1), [(0, 0), (0, 0), (radius, radius)])
    v = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2 * radius + 1, 1),
                          (1, 1, 1), [(0, 0), (radius, radius), (0, 0)])
    return jnp.maximum(h, v)


def _erode(x: Array, radius: int) -> Array:
    return -_dilate(-x, "full", radius)


def _patches(x: Array, offsets, pad_mode: str) -> Array:
    """Stack shifted copies: (B, H, W) -> (B, H, W, len(offsets))."""
    b, h, w = x.shape
    r = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode=pad_mode)
    taps = [lax.dynamic_slice(xp, (0, r + dy, r + dx), (b, h, w))
            for dy, dx in offsets]
    return jnp.stack(taps, axis=-1)


def _batcher_ces(n: int) -> list[tuple[int, int]]:
    """Batcher odd-even mergesort compare-exchange list for n inputs."""
    ces = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        ces.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return ces


def _selection_ces(n: int, rank: int) -> list[tuple[int, int]]:
    """CEs of Batcher's network that the output at ``rank`` depends on."""
    full = _batcher_ces(n)
    needed = {rank}
    kept = []
    for a, b in reversed(full):
        if a in needed or b in needed:
            kept.append((a, b))
            needed.update((a, b))
    return list(reversed(kept))


def _oem_merge(a: list, b: list, ces: list) -> list:
    """Batcher odd-even merge of sorted runs ``a``/``b`` (index lists);
    appends compare-exchanges, returns the sorted order as an index list."""
    if not a:
        return list(b)
    if not b:
        return list(a)
    if len(a) == 1 and len(b) == 1:
        ces.append((a[0], b[0]))
        return [a[0], b[0]]
    evens = _oem_merge(a[0::2], b[0::2], ces)
    odds = _oem_merge(a[1::2], b[1::2], ces)
    res = [evens[0]]
    i = 0
    while i < len(odds) or i + 1 < len(evens):
        o = odds[i] if i < len(odds) else None
        e = evens[i + 1] if i + 1 < len(evens) else None
        if o is not None and e is not None:
            ces.append((o, e))
            res += [o, e]
        elif o is not None:
            res.append(o)
        else:
            res.append(e)
        i += 1
    return res


def _median25_sorted_cols_network() -> tuple[list, int]:
    """Median-of-25 network for inputs laid out as FIVE pre-sorted 5-runs
    (positions 5k..5k+4): a merge tree ((5,5),(5,5))->(10,10)->(20,5),
    dependency-pruned to the median output. 82 CEs vs 153 for the pruned
    Batcher-32 selection on unsorted taps — the shared 9-CE column sort
    amortizes over the window's 5 horizontal shifts (sorting the vertical
    quintuples commutes with horizontal shifting). Exhaustively verified
    (0-1 principle over all 6^5 sorted-column patterns) in
    tests/test_median_network.py."""
    ces: list = []
    o01 = _oem_merge(list(range(0, 5)), list(range(5, 10)), ces)
    o23 = _oem_merge(list(range(10, 15)), list(range(15, 20)), ces)
    o03 = _oem_merge(o01, o23, ces)
    order = _oem_merge(o03, list(range(20, 25)), ces)
    out = order[12]
    needed = {out}
    kept = []
    for a, b in reversed(ces):
        if a in needed or b in needed:
            kept.append((a, b))
            needed.update((a, b))
    return list(reversed(kept)), out


# optimal 9-CE 5-element sorting network (ranks ascending)
_SORT5_CES = [(0, 1), (3, 4), (2, 4), (2, 3), (1, 4), (0, 3), (0, 2),
              (1, 3), (1, 2)]
_MEDIAN25_SC_CES, _MEDIAN25_SC_OUT = _median25_sorted_cols_network()


def _apply_ces(taps: list, ces: list) -> None:
    for a, b in ces:
        lo = jnp.minimum(taps[a], taps[b])
        hi = jnp.maximum(taps[a], taps[b])
        taps[a], taps[b] = lo, hi


def _median5(x: Array) -> Array:
    """5x5 median with replicated borders (cv2.medianBlur, exact).

    ``jnp.sort`` over the 25-tap axis costs ~40 ms at (24, 480, 640) on a
    v5e (XLA TPU sort is slow); a selection network fuses into elementwise
    min/max chains. The vertical quintuple at each pixel is sorted ONCE
    (9 CEs) and shared by the 5 horizontal window shifts, then the pruned
    sorted-runs merge network (82 CEs) extracts the median — the median is a
    unique order statistic, so this is bit-identical to any other correct
    network."""
    cols = list(jnp.moveaxis(
        _patches(x, [(dy, 0) for dy in range(-2, 3)], "edge"), -1, 0))
    _apply_ces(cols, _SORT5_CES)
    taps = []
    for dx in range(-2, 3):
        for j in range(5):
            taps.append(_patches(cols[j], [(0, dx)], "edge")[..., 0])
    _apply_ces(taps, _MEDIAN25_SC_CES)
    return taps[_MEDIAN25_SC_OUT]


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
    """(B, H, W) depth (mm) + intrinsics [fx, fy, cx, cy] -> (B, H, W, 3) m.

    ``intrinsics`` is either shared ``(4,)`` or per-sample ``(B, 4)`` (mixed
    CAMERA/REAL training batches use different cameras, ``dataset.py:36-37``).
    """
    b, h, w = depth.shape
    if intrinsics.ndim == 2:
        fx, fy, cx, cy = (intrinsics[:, i][:, None, None] for i in range(4))
    else:
        fx, fy, cx, cy = intrinsics
    z = depth.astype(jnp.float32) / norm_scale
    xs = lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ys = lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    return jnp.stack([(xs - cx) * z / fx, (ys - cy) * z / fy, z], axis=-1)


def fill_missing_tpu(depth_mm: Array, cam_scale: float = 1000.0,
                     scale_2_80m: float = 1.0) -> Array:
    """Drop-in for ``depth_utils.fill_missing`` running on device, batched.

    On TPU the whole morphology chain runs as ONE fused Pallas kernel per
    image (``ops.depth_fill_pallas``) — the XLA pipeline's ~15 full-batch
    HBM round-trips were the largest train-step preprocess cost (~10 ms at
    B=24). Same outputs (kernel parity-tested against this XLA path)."""
    x = depth_mm.astype(jnp.float32) / cam_scale * scale_2_80m
    from istnet_tpu.ops import dispatch
    h, w = x.shape[-2], x.shape[-1]
    if dispatch._on_tpu() and h % 8 == 0 and w % 128 == 0:
        from istnet_tpu.ops.depth_fill_pallas import fill_in_multiscale_pallas
        out = fill_in_multiscale_pallas(x, 3.0)
    else:
        out = fill_in_multiscale_tpu(x, 3.0)
    return out / scale_2_80m * cam_scale


# ---------------------------------------------------------------------------
# Fully device-side instance preprocessing (crop + sample + resize)
# ---------------------------------------------------------------------------

MAX_CROP = 440  # get_bbox's maximum square window (data_utils.py:48)

from istnet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


def square_crop_bounds(bboxes: Array, img_h: int = 480, img_w: int = 640) -> Array:
    """Vectorized ``get_bbox`` (data_utils.py:43-71): (B, 4) [y1, x1, y2, x2]
    -> (B, 4) [rmin, rmax, cmin, cmax], 40-px-quantized square windows."""
    y1, x1, y2, x2 = (bboxes[:, i].astype(jnp.int32) for i in range(4))
    win = (jnp.maximum(y2 - y1, x2 - x1) // 40 + 1) * 40
    win = jnp.minimum(win, MAX_CROP)
    cy = (y1 + y2) // 2
    cx = (x1 + x2) // 2
    rmin = cy - win // 2
    cmin = cx - win // 2
    rmax = rmin + win
    cmax = cmin + win
    # clamp-and-shift, matching the reference's four fixups
    shift = jnp.maximum(-rmin, 0)
    rmin, rmax = rmin + shift, rmax + shift
    shift = jnp.maximum(-cmin, 0)
    cmin, cmax = cmin + shift, cmax + shift
    shift = jnp.maximum(rmax - img_h, 0)
    rmin, rmax = rmin - shift, rmax - shift
    shift = jnp.maximum(cmax - img_w, 0)
    cmin, cmax = cmin - shift, cmax - shift
    return jnp.stack([rmin, rmax, cmin, cmax], axis=1)


def _resize_half_pixel(crop: Array, crop_w: Array, out_size: int) -> Array:
    """Per-instance variable-size bilinear resize (cv2 INTER_LINEAR semantics:
    half-pixel centers, border clamp) of the top-left (crop_w, crop_w) region
    of a padded (MAX_CROP, MAX_CROP, C) crop.

    Weight matrices are built from iota arithmetic with the traced crop size
    and applied as two MXU contractions — ``jax.image.scale_and_translate``
    under vmap is ~30x slower at these shapes.
    """
    n_in = crop.shape[0]
    cw = crop_w.astype(jnp.float32)
    out_pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (cw / out_size) - 0.5
    out_pos = jnp.clip(out_pos, 0.0, cw - 1.0)  # cv2 border clamp
    in_idx = jnp.arange(n_in, dtype=jnp.float32)
    # linear kernel: weight = max(0, 1 - |pos - j|), rows sum to 1
    w = jnp.maximum(0.0, 1.0 - jnp.abs(out_pos[:, None] - in_idx[None, :]))
    x = jnp.einsum("oh,hwc->owc", w, crop.astype(jnp.float32))
    return jnp.einsum("ow,hwc->hoc", w, x)


_CS_BLOCK = 128


def _blocked_cdf(ok: Array) -> tuple[Array, Array]:
    """Block-structured inclusive cumsum of a 0/1 vector.

    Returns ``intra (nb, 128) int32`` — within-block inclusive cumsums — and
    ``block_end (nb,) float32`` — the global cumsum at each block's last
    element (values <= 194k: exact in f32). The full CDF at flat index
    p = 128*b + c is ``block_end[b-1] + intra[b, c]``; it is never
    materialized. XLA's cumsum lowering is pathologically slow at these
    sizes under vmap (~38 ms for 24 x 194k); (128, 128) triangular int
    contractions run in ~1 ms.
    """
    n = ok.shape[0]
    nb = -(-n // _CS_BLOCK)
    pad = nb * _CS_BLOCK - n
    x = jnp.pad(ok.astype(jnp.int8), (0, pad)).reshape(nb, _CS_BLOCK)
    r_ = lax.broadcasted_iota(jnp.int32, (_CS_BLOCK, _CS_BLOCK), 0)
    c_ = lax.broadcasted_iota(jnp.int32, (_CS_BLOCK, _CS_BLOCK), 1)
    tri = (r_ <= c_).astype(jnp.int8)
    intra = lax.dot_general(x, tri, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)  # (nb, B)
    block_tot = intra[:, -1].astype(jnp.float32)
    block_end = jnp.cumsum(block_tot)  # tiny (nb,) cumsum
    return intra, block_end


def _searchsorted_blocked(intra: Array, block_end: Array, targets: Array,
                          n: int | None = None) -> Array:
    """``searchsorted(cdf, targets, side='left')`` on the blocked CDF.
    ``n`` (default nb*128) caps the result like searchsorted's out-of-range
    return (an all-zero CDF yields n, not nb*128+128).

    jnp.searchsorted under vmap lowers to a while-loop binary search with
    per-step dynamic gathers (~10 ms for 24 x 1024 targets over 194k cells);
    this closed form is two compare-reduces and one one-hot MXU contraction:

      block  b_j = #{b : block_end[b] < t_j}            (compare + row-sum)
      local  c_j = #{c : intra[b_j, c] < t_j - start[b_j]}
                   with the intra row + block start fetched by ONE one-hot
                   bf16 dot (exact: intra <= 128, start split bf16x3)

    All quantities are integers < 2^24 held in f32 — every compare is exact.
    """
    nb = intra.shape[0]
    t = targets.astype(jnp.float32)  # (S,)
    bi = jnp.sum((block_end[None, :] < t[:, None]).astype(jnp.float32),
                 axis=1)  # (S,) float block index, nb when t > total
    start = block_end - intra[:, -1].astype(jnp.float32)  # exclusive starts
    s_hi = start.astype(jnp.bfloat16)
    r1 = start - s_hi.astype(jnp.float32)
    s_mid = r1.astype(jnp.bfloat16)
    s_lo = (r1 - s_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    rhs = jnp.concatenate(
        [intra.astype(jnp.bfloat16),  # <= 128: bf16-exact
         s_hi[:, None], s_mid[:, None], s_lo[:, None]], axis=1)  # (nb, 131)
    onehot = (lax.broadcasted_iota(jnp.float32, (1, nb), 1)
              == bi[:, None]).astype(jnp.bfloat16)  # (S, nb)
    got = jnp.dot(onehot, rhs, preferred_element_type=jnp.float32)  # (S, 131)
    introw = got[:, :_CS_BLOCK]
    tloc = t - (got[:, _CS_BLOCK] + got[:, _CS_BLOCK + 1] + got[:, _CS_BLOCK + 2])
    ci = jnp.sum((introw < tloc[:, None]).astype(jnp.float32), axis=1)
    out = (bi * _CS_BLOCK + ci).astype(jnp.int32)
    return jnp.minimum(out, nb * _CS_BLOCK if n is None else n)


def _preprocess_chunk(b: int) -> int:
    """Instance-chunk size for the batched preprocess vmap.

    The per-instance bodies materialize (MAX_CROP, MAX_CROP, 3) f32 crop
    buffers; at B=128 that is ~300 MB per intermediate and XLA's memory-bound
    scheduler SERIALIZES the whole vmapped region into a per-instance while
    loop (profiled: 986 ms/step at B=128 — a 350 ms unrolled gather plus a
    304 ms while, vs 55 ms at B=24 where the buffers fit and the vmap stays
    vectorized). Chunking the vmap at <=32 instances (~75 MB of live crop
    buffers) keeps every chunk vectorized and scales linearly.
    """
    if b <= 64:
        return b
    for c in (32, 16, 8, 4, 2, 1):
        if b % c == 0:
            return c
    return 1


def preprocess_instances_tpu(rgb: Array, depth_mm: Array, masks: Array,
                             bboxes: Array, intrinsics: Array, key: Array,
                             img_size: int = 192, sample_num: int = 1024,
                             norm_scale: float = 1000.0,
                             normalize: bool = True,
                             chunk: int | None = None) -> dict:
    """Device-side equivalent of the per-instance test preprocessing
    (``dataset.py:380-404``): square crop, in-mask point sampling,
    backprojection, RGB resize + ImageNet normalization — one jitted program,
    instances batched.

    Args:
      rgb: (B, H, W, 3) uint8 full images (one row per INSTANCE; repeat the
        image for multi-instance frames).
      depth_mm: (B, H, W) float32 completed depth in mm (fill_missing_tpu).
      masks: (B, H, W) bool instance masks.
      bboxes: (B, 4) [y1, x1, y2, x2] detection boxes.
      intrinsics: (4,) [fx, fy, cx, cy].
      key: PRNG key for point sampling (Gumbel top-k without replacement,
        wrap-around repeats when fewer than sample_num valid pixels — the
        reference's with-replacement refill, dataset.py:388-391, is a random
        multiset; this is its deterministic-coverage analogue).

    Returns:
      dict(rgb (B, img, img, 3) normalized, pts (B, N, 3) meters,
           choose (B, N) int32 indices into the resized crop,
           n_valid (B,) in-mask pixel counts).
    """
    b, h, w = depth_mm.shape
    bounds = square_crop_bounds(bboxes, h, w)
    crop_w = bounds[:, 1] - bounds[:, 0]  # (B,) variable window sizes

    pts_map = backproject_batch(depth_mm, intrinsics, norm_scale)
    valid_full = masks & (depth_mm > 0)

    # pad bottom/right so a MAX_CROP dynamic_slice never clamps its start
    # (windows smaller than MAX_CROP can begin past H - MAX_CROP); the padded
    # region is outside every window and masked by the `inside` predicate
    rgb = jnp.pad(rgb, ((0, 0), (0, MAX_CROP), (0, MAX_CROP), (0, 0)))
    pts_map = jnp.pad(pts_map, ((0, 0), (0, MAX_CROP), (0, MAX_CROP), (0, 0)))
    valid_full = jnp.pad(valid_full, ((0, 0), (0, MAX_CROP), (0, MAX_CROP)))

    keys = jax.random.split(key, b)
    body = jax.vmap(functools.partial(_instance_body, img_size=img_size,
                                      sample_num=sample_num,
                                      normalize=normalize))
    args = (rgb, pts_map, valid_full, bounds, crop_w, keys)
    c = _preprocess_chunk(b) if chunk is None else chunk
    if c < b and b % c == 0:
        # vectorize within fixed-size chunks, lax.map (sequential, but each
        # iteration fully vectorized) across them — see _preprocess_chunk
        stacked = tuple(a.reshape((b // c, c) + a.shape[1:]) for a in args)
        outs = lax.map(lambda xs: body(*xs), stacked)
        rgb_o, pts_o, choose_o, count_o = (
            o.reshape((b,) + o.shape[2:]) for o in outs)
    else:
        rgb_o, pts_o, choose_o, count_o = body(*args)
    return {"rgb": rgb_o, "pts": pts_o, "choose": choose_o, "n_valid": count_o}


def _instance_body(rgb_i, pts_i, valid_i, bound, cw, k, *, img_size, sample_num,
                   normalize=True):
    """One instance: crop, sample, backprojected points, resized rgb.

    rgb_i/pts_i/valid_i are (H+MAX_CROP, W+MAX_CROP[, C]) padded maps.
    With ``normalize=False`` the resized rgb stays in 0..255 float (the train
    path inserts device ColorJitter before normalization).
    """
    rmin, cmin = bound[0], bound[2]
    crop_rgb = lax.dynamic_slice(rgb_i, (rmin, cmin, 0), (MAX_CROP, MAX_CROP, 3))
    crop_pts = lax.dynamic_slice(pts_i, (rmin, cmin, 0), (MAX_CROP, MAX_CROP, 3))
    crop_valid = lax.dynamic_slice(valid_i, (rmin, cmin), (MAX_CROP, MAX_CROP))
    rows = lax.broadcasted_iota(jnp.int32, (MAX_CROP, MAX_CROP), 0)
    cols = lax.broadcasted_iota(jnp.int32, (MAX_CROP, MAX_CROP), 1)
    inside = (rows < cw) & (cols < cw)
    ok = (crop_valid & inside).reshape(-1)

    # stratified inverse-CDF sample of valid flat indices: one uniform per
    # stratum of the valid-cell CDF -> (near-)duplicate-free when
    # count >= sample_num, full coverage with repeats when count <
    # sample_num (the reference's with/without-replacement split,
    # dataset.py:388-391). O(cells) blocked cumsum + closed-form blocked
    # search — a Gumbel top-k over the 440^2 cells is ~40x slower on TPU,
    # and jnp.searchsorted's while-loop lowering costs ~10 ms at B=24.
    intra, block_end = _blocked_cdf(ok)
    count = block_end[-1].astype(jnp.int32)
    v = jax.random.uniform(k, (sample_num,))
    slot = lax.broadcasted_iota(jnp.float32, (sample_num, 1), 0).squeeze(-1)
    u = (slot + v) / sample_num * count.astype(jnp.float32)
    targets = jnp.floor(u).astype(jnp.int32) + 1
    flat_idx = _searchsorted_blocked(
        intra, block_end, jnp.minimum(targets, jnp.maximum(count, 1)),
        n=ok.shape[0])

    pts = crop_pts.reshape(-1, 3)[flat_idx]
    # choose remap for the resized crop (dataset.py:400-404)
    row_idx = flat_idx // MAX_CROP  # crop rows (window is top-left aligned)
    col_idx = flat_idx % MAX_CROP
    ratio = img_size / cw.astype(jnp.float32)
    choose = (jnp.floor(row_idx * ratio) * img_size
              + jnp.floor(col_idx * ratio)).astype(jnp.int32)

    rgb_out = _resize_half_pixel(crop_rgb, cw, img_size)
    if normalize:
        rgb_out = ((rgb_out / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    return rgb_out, pts, choose, count


def preprocess_shared_image_tpu(rgb: Array, depth_mm: Array, masks: Array,
                                bboxes: Array, intrinsics: Array, key: Array,
                                img_size: int = 192, sample_num: int = 1024,
                                norm_scale: float = 1000.0) -> dict:
    """Instance preprocessing when all K instances come from ONE image
    (the test-time case): the image is backprojected and padded ONCE and
    shared across instances — the per-instance-image variant would
    materialize K identical (H+440, W+440, 3) maps (~760 MB at K=64).

    rgb (H, W, 3) uint8, depth_mm (H, W), masks (K, H, W) bool, bboxes (K, 4).
    """
    k_inst = masks.shape[0]
    bounds = square_crop_bounds(bboxes, depth_mm.shape[0], depth_mm.shape[1])
    crop_w = bounds[:, 1] - bounds[:, 0]

    pts_map = backproject_batch(depth_mm[None], intrinsics, norm_scale)[0]
    rgb_p = jnp.pad(rgb, ((0, MAX_CROP), (0, MAX_CROP), (0, 0)))
    pts_p = jnp.pad(pts_map, ((0, MAX_CROP), (0, MAX_CROP), (0, 0)))
    valid_p = jnp.pad(masks & (depth_mm > 0)[None],
                      ((0, 0), (0, MAX_CROP), (0, MAX_CROP)))

    keys = jax.random.split(key, k_inst)
    rgb_o, pts_o, choose_o, count_o = jax.vmap(
        functools.partial(_instance_body, img_size=img_size, sample_num=sample_num),
        in_axes=(None, None, 0, 0, 0, 0))(
        rgb_p, pts_p, valid_p, bounds, crop_w, keys)
    return {"rgb": rgb_o, "pts": pts_o, "choose": choose_o, "n_valid": count_o}


def preprocess_train_instances_tpu(rgb: Array, depth_mm: Array, masks: Array,
                                   bboxes: Array, intrinsics: Array,
                                   rotation: Array, translation: Array,
                                   size: Array, key: Array,
                                   img_size: int = 192, sample_num: int = 1024,
                                   norm_scale: float = 1000.0,
                                   shift_range: float = 0.005,
                                   normalize: bool = True) -> dict:
    """Training-side device preprocessing: the test pipeline plus the point
    jitter (``dataset.py:210``: clip(0.001*randn, +-0.005)) and the GT NOCS
    target ``qo = (pts - t)/||s|| @ R`` (``dataset.py:249``; R must already be
    symmetry-canonicalized on the host, ``sym_canonical_rotation``).

    Composes with ``fill_missing_tpu`` (pass completed depth) and
    ``data.device_augment`` (FS-Net augs inside the train step) for a fully
    device-resident train input path.
    """
    out = preprocess_instances_tpu(rgb, depth_mm, masks, bboxes, intrinsics,
                                   key, img_size=img_size,
                                   sample_num=sample_num,
                                   norm_scale=norm_scale, normalize=normalize)
    k_j, _ = jax.random.split(jax.random.fold_in(key, 1))
    jitter = jnp.clip(0.001 * jax.random.normal(k_j, out["pts"].shape),
                      -shift_range, shift_range)
    pts = out["pts"] + jitter
    qo = jnp.einsum(
        "bnc,bcd->bnd",
        (pts - translation[:, None, :])
        / (jnp.linalg.norm(size, axis=-1)[:, None, None] + 1e-8),
        rotation)
    out["pts"] = pts
    out["qo"] = qo
    return out


def make_train_preprocess(img_size: int = 192, sample_num: int = 1024,
                          use_fill_miss: bool = True, norm_scale: float = 1000.0,
                          shift_range: float = 0.005,
                          jitter=(0.2, 0.2, 0.2, 0.05)):
    """Build the fully-device training input pipeline.

    Returns ``preprocess(raw_batch, key) -> {"inputs", "labels"}`` — the
    device-side replacement for the host work in
    ``TrainingDataset.__getitem__`` (reference ``dataset.py:162-296``): depth
    completion, square crop, in-mask sampling, backprojection, point jitter,
    RGB resize + ColorJitter + ImageNet normalization, GT NOCS ``qo``. Runs
    inside the jitted (and DP-sharded) train step, so each device
    preprocesses its own batch shard.

    ``raw_batch`` is the collated output of
    ``TrainingDataset(device_preprocess=True)``: depth_raw (B, H, W) f32 mm,
    rgb_raw (B, H, W, 3) u8, mask_raw (B, H, W) bool, bbox (B, 4) i32,
    intrinsics (B, 4) f32, plus the pose labels (rotation already
    symmetry-canonicalized on the host) and category/sym_info.
    """
    from istnet_tpu.data.device_transforms import color_jitter_batch
    from istnet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    def preprocess(raw: dict, key: Array) -> dict:
        depth = raw["depth_raw"].astype(jnp.float32)
        if use_fill_miss:
            depth = fill_missing_tpu(depth, norm_scale, 1.0)
        k_pre, k_cj = jax.random.split(key)
        out = preprocess_train_instances_tpu(
            raw["rgb_raw"], depth, raw["mask_raw"], raw["bbox"],
            raw["intrinsics"].astype(jnp.float32),
            raw["rotation_label"], raw["translation_label"], raw["size_label"],
            k_pre, img_size=img_size, sample_num=sample_num,
            norm_scale=norm_scale, shift_range=shift_range, normalize=False)
        rgb = color_jitter_batch(out["rgb"], k_cj, *jitter)
        rgb = ((rgb / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
        inputs = {"rgb": rgb, "pts": out["pts"],
                  "choose": out["choose"].astype(jnp.int32),
                  "category_label": raw["category_label"].astype(jnp.int32),
                  "qo": out["qo"], "sym_info": raw["sym_info"]}
        labels = {"rotation_label": raw["rotation_label"],
                  "translation_label": raw["translation_label"],
                  "size_label": raw["size_label"], "qo": out["qo"]}
        return {"inputs": inputs, "labels": labels}

    return preprocess

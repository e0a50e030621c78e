"""On-device (real TPU) kernel-parity tier — ``pytest -m tpu``.

Every Pallas kernel is pinned against the XLA reference path in interpret
mode by the regular suite (``test_pallas_kernels.py`` et al.), but interpret
mode cannot catch a *Mosaic* regression: a changed accumulation order, a
different bf16 FMA contraction, a retiled reduction. This tier runs the same
parity contracts THROUGH THE REAL COMPILER on the chip the bench numbers
come from. Run manually before each bench:

    ISTNET_TPU_TESTS=1 python -m pytest -m tpu tests/ -q

(The env var keeps ``conftest.py`` from forcing the virtual-CPU platform;
the default ``addopts = -m 'not tpu'`` keeps these out of CPU runs.)

Reference (much weaker) counterpart: the reference's single gradcheck,
``model/pointnet2/pointnet2_test.py:18-33``.

Bitwise-parity methodology: selection kernels (FPS, ball query, grouping)
are compared with ``assert_array_equal``. To make that robust against
*legitimate* float reassociation at radius/argmax boundaries, point
coordinates are snapped to a dyadic grid (multiples of 2^-8 in
[-0.25, 0.25)): every pairwise squared distance is then a multiple of 2^-16
below 1.0 — exactly representable in f32 (and in the kernels' bf16x3 split
form, whose leading bf16 term already holds a 6-bit-mantissa coordinate
exactly) — so d^2 is EXACT under any accumulation order, and the query
radius is placed halfway between adjacent representable d^2 values. Any
remaining disagreement is a real kernel bug, not float noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip("needs a real TPU backend (ISTNET_TPU_TESTS=1, see module "
                "docstring)", allow_module_level=True)

from istnet_tpu.ops import pointnet2 as xla_ops  # noqa: E402

RADII, NS = (0.15, 0.4), (4, 8)


def _dyadic_cloud(rng, b, n, spread=1):
    """Coords on the 2^-8 grid; squared distances exact in f32 (see module
    docstring). ``spread`` > 1 widens via exact power-of-two scaling."""
    return (rng.randint(-64, 64, size=(b, n, 3)).astype(np.float32)
            / 256.0 * spread)


def _safe_radius(r0: float) -> float:
    """Nearest radius whose r^2 lies halfway between adjacent representable
    dyadic squared distances (multiples of 2^-16) — no boundary ties."""
    return float(np.sqrt((np.round(r0 * r0 * 65536.0) + 0.5) / 65536.0))


def test_fps_on_device_bit_matches_xla():
    from istnet_tpu.ops.fps_pallas import furthest_point_sample_pallas
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(_dyadic_cloud(rng, 8, 1024))
    got = jax.jit(furthest_point_sample_pallas,
                  static_argnums=1)(xyz, 512)
    want = jax.jit(xla_ops.furthest_point_sample, static_argnums=1)(xyz, 512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ball_query_on_device_bit_matches_xla():
    from istnet_tpu.ops.ball_query_pallas import ball_query_pallas
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(_dyadic_cloud(rng, 4, 1024))
    cent = jnp.asarray(_dyadic_cloud(rng, 4, 512))
    for r0, ns in [(0.15, 8), (0.4, 16)]:
        r = _safe_radius(r0)
        got = jax.jit(ball_query_pallas, static_argnums=(0, 1))(r, ns, xyz, cent)
        want = jax.jit(xla_ops.ball_query, static_argnums=(0, 1))(r, ns, xyz, cent)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ball_query_group_on_device_bit_matches_xla():
    """The fused query+group kernel (rank arithmetic + blocked one-hot MXU
    extraction, bf16 output) against ball_query -> group on device. Grouping
    is pure selection, so bf16 outputs must agree BITWISE — this is the
    bf16x3-exactness invariant (one-hot LHS bf16 dots must extract exactly;
    CLAUDE.md round-3 caveat) asserted on real Mosaic."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(_dyadic_cloud(rng, 4, 1024))
    cent = jnp.asarray(_dyadic_cloud(rng, 4, 512))
    feats = jnp.asarray(rng.randn(4, 1024, 32).astype(np.float32)
                        ).astype(jnp.bfloat16)
    radii = tuple(_safe_radius(r) for r in RADII)

    got = jax.jit(ball_query_group_pallas,
                  static_argnums=(0, 1, 5))(radii, NS, xyz, cent, feats, True)
    idxs = [jax.jit(xla_ops.ball_query, static_argnums=(0, 1))(r, ns, xyz, cent)
            for r, ns in zip(radii, NS)]
    for g, idx, ns in zip(got, idxs, NS):
        take = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))
        rel = take(xyz, idx.reshape(4, -1)).reshape(4, 512, ns, 3) \
            - cent[:, :, None, :]
        f = take(feats, idx.reshape(4, -1)).reshape(4, 512, ns, -1)
        want = jnp.concatenate([rel, f.astype(jnp.float32)], axis=-1
                               ).astype(g.dtype)
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(want, np.float32))


def test_sa_fused_identity_mlp_bit_parity_on_device():
    """Fused SA stage with an identity MLP reduces to relu(max(grouped)) —
    bitwise equal to the grouping kernel's bf16 output on real Mosaic
    (the fused path's scratch-batched extraction must stay exact)."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas
    from istnet_tpu.ops.sa_fused_pallas import sa_msg_fused_pallas
    rng = np.random.RandomState(9)
    xyz = jnp.asarray(_dyadic_cloud(rng, 2, 1024))
    cent = jnp.asarray(_dyadic_cloud(rng, 2, 256))
    feats = jnp.asarray(rng.randn(2, 1024, 125).astype(np.float32)
                        ).astype(jnp.bfloat16)
    radii = tuple(_safe_radius(r) for r in RADII)
    c = 3 + 125
    eye = (jnp.eye(c, dtype=jnp.float32), jnp.zeros((c,), jnp.float32))
    folded = ((eye,), (eye,))

    got = jax.jit(sa_msg_fused_pallas, static_argnums=(0, 1)
                  )(radii, NS, xyz, cent, feats, folded)
    grouped = jax.jit(ball_query_group_pallas, static_argnums=(0, 1, 5, 6, 7)
                      )(radii, NS, xyz, cent, feats, True, False,
                        jnp.bfloat16)
    for g, gr in zip(got, grouped):
        want = jnp.maximum(jnp.max(gr.astype(jnp.float32), axis=2), 0.0
                           ).astype(jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(want, np.float32))


def test_fold_upsample_epilogue_bit_matches_unfused_on_device():
    """ADVICE r4: the in-kernel BN-eval+PReLU epilogue's bit-exactness claim
    was pinned only in interpret mode; on real Mosaic an FMA contraction of
    t*scale + bias could differ by a ulp. Assert exact equality on-chip."""
    from istnet_tpu.ops.fold_upsample_pallas import fold_upsample_conv_pallas

    b, h, w, cin, cout = 2, 24, 24, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.bfloat16)
    k = (jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.1).astype(jnp.bfloat16)
    bias = jax.random.normal(ks[2], (cout,), jnp.bfloat16)
    mean = jax.random.normal(ks[3], (cout,), jnp.float32) * 0.5
    var = jax.random.uniform(ks[4], (cout,), jnp.float32, 0.25, 2.0)
    scale = jax.random.normal(ks[5], (cout,), jnp.float32) * 0.8 + 1.0
    bn_bias = jax.random.normal(ks[6], (cout,), jnp.float32) * 0.3
    alpha = jnp.asarray([0.25], jnp.float32)

    plain = jax.jit(fold_upsample_conv_pallas)(x, k, bias)
    t = (plain.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
    t = (t * scale + bn_bias).astype(plain.dtype)
    want = jnp.where(t >= 0, t, alpha.astype(t.dtype) * t)

    ep = jnp.stack([mean, jax.lax.rsqrt(var + 1e-5), scale, bn_bias,
                    jnp.broadcast_to(alpha, (cout,))])
    got = jax.jit(fold_upsample_conv_pallas)(x, k, bias, epilogue=ep)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_fold_upsample_kernel_close_to_xla_fold_on_device():
    """The kernel's conv itself vs the XLA fold — f32-accumulation rounding
    only (the documented on-hardware tolerance, ops/dispatch.py)."""
    from istnet_tpu.nn.layers import conv3x3_on_doubled
    from istnet_tpu.ops.fold_upsample_pallas import fold_upsample_conv_pallas
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (2, 24, 24, 256), jnp.bfloat16)
    k = (jax.random.normal(ks[1], (3, 3, 256, 64)) * 0.05).astype(jnp.bfloat16)
    b = jax.random.normal(ks[2], (64,), jnp.bfloat16)
    got = jax.jit(fold_upsample_conv_pallas)(x, k, b)
    want = jax.jit(conv3x3_on_doubled)(x, k, b)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_three_nn_on_device_bit_matches_xla():
    from istnet_tpu.ops.three_nn_pallas import three_nn_pallas
    rng = np.random.RandomState(5)
    unknown = jnp.asarray(_dyadic_cloud(rng, 4, 1024))
    known = jnp.asarray(_dyadic_cloud(rng, 4, 256))
    gd, gi = jax.jit(three_nn_pallas)(unknown, known)
    wd, wi = jax.jit(xla_ops.three_nn)(unknown, known)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    # d^2 is exact on the dyadic grid and IEEE sqrt is correctly rounded
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))


def test_fp_interpolate_on_device_close_to_xla():
    """Fused FP kernel vs the 3-op XLA composition: association differs
    (interp-matrix MXU contraction), so tolerance, not bits."""
    from istnet_tpu.ops.three_nn_pallas import fp_interpolate_pallas
    from jax import lax
    rng = np.random.RandomState(6)
    unknown = jnp.asarray(_dyadic_cloud(rng, 4, 1024))
    known = jnp.asarray(_dyadic_cloud(rng, 4, 256))
    feats = jnp.asarray(rng.randn(4, 256, 64).astype(np.float32))
    got = jax.jit(fp_interpolate_pallas)(unknown, known, feats)
    dist, idx = xla_ops.three_nn(unknown, known)
    weight = xla_ops.three_interpolate_weights(lax.stop_gradient(dist))
    want = jax.jit(xla_ops.three_interpolate)(feats, idx, weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_depth_fill_pallas_on_device_matches_xla():
    from istnet_tpu.data.device_preprocess import fill_in_multiscale_tpu
    from istnet_tpu.ops.depth_fill_pallas import fill_in_multiscale_pallas
    rng = np.random.RandomState(0)
    d = rng.uniform(0.3, 2.8, size=(2, 48, 128)).astype(np.float32)
    d[rng.rand(2, 48, 128) < 0.35] = 0.0
    d[:, :9] = 0.0
    got = jax.jit(fill_in_multiscale_pallas, static_argnums=(1,)
                  )(jnp.asarray(d), 3.0)
    want = jax.jit(fill_in_multiscale_tpu)(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_device_batched_compaction_buffer_on_device():
    """The device-resident compaction buffer (test_func_device_batched's
    append/forward programs) through the REAL compiler: the compacting
    scatter lands instances at the device cursor in order, the trash slot
    swallows invalid rows, and the post-forward shift moves the overflow
    region intact — with buffer donation live. CPU interpret coverage:
    tests/test_e2e_synthetic.py."""
    import numpy as np

    from istnet_tpu.data.dataset import REAL_INTRINSICS
    from istnet_tpu.eval.test_loop import make_device_batched
    from istnet_tpu.models.ist_net import ISTNet

    img_size, npts, kb, bsz = 48, 128, 4, 8
    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    dummy = {
        "rgb": jnp.zeros((1, img_size, img_size, 3)),
        "pts": jnp.zeros((1, npts, 3)),
        "choose": jnp.zeros((1, npts), jnp.int32),
        "category_label": jnp.zeros((1,), jnp.int32),
        "qo": jnp.zeros((1, npts, 3)),
    }
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    init_buffers, append, forward = make_device_batched(
        model, ev, REAL_INTRINSICS, img_size=img_size, sample_num=npts,
        batch_size=bsz, kb=kb, lag=1, min_points=16)
    buffers, pos = init_buffers()

    rng = np.random.RandomState(0)
    h, w = 480, 640

    def synth_image(seed, n_valid_instances):
        r = np.random.RandomState(seed)
        depth = np.zeros((h, w), np.float32)
        masks = np.zeros((kb, h, w), bool)
        bboxes = np.zeros((kb, 4), np.int32)
        cats = r.randint(0, 6, kb).astype(np.int64)
        for i in range(kb):
            y0, x0 = r.randint(60, 240), r.randint(60, 340)
            hh, ww = 120, 120
            if i < n_valid_instances:
                depth[y0:y0 + hh, x0:x0 + ww] = 900 + 300 * r.rand(hh, ww)
                masks[i, y0 + 5:y0 + hh - 5, x0 + 5:x0 + ww - 5] = True
            bboxes[i] = [y0, x0, y0 + hh, x0 + ww]
        rgb = (r.rand(h, w, 3) * 255).astype(np.uint8)
        return rgb, depth, masks, bboxes, cats

    # 3 chunks with 3/2/4 valid instances -> 9 valid rows, one flush at 8
    expect_cats = []
    key = jax.random.PRNGKey(3)
    for ci, nv in enumerate((3, 2, 4)):
        rgb, depth, masks, bboxes, cats = synth_image(10 + ci, nv)
        key, sub = jax.random.split(key)
        buffers, pos, n_valid = append(buffers, pos, rgb, depth, masks,
                                       bboxes, cats, sub)
        nv_host = np.asarray(n_valid)
        got_valid = nv_host > 16
        assert got_valid.sum() == nv, (ci, nv_host)
        expect_cats.extend(cats[got_valid].tolist())
    assert int(np.asarray(pos)) == 9
    # rows 0..8 hold the valid instances' categories in stream order
    np.testing.assert_array_equal(
        np.asarray(buffers["category_label"])[:9], expect_cats)

    pre_overflow = np.asarray(buffers["category_label"])[bsz:bsz + 1].copy()
    ep, buffers, pos = forward(buffers, pos)
    assert int(np.asarray(pos)) == 1
    # overflow row shifted to the front intact
    np.testing.assert_array_equal(
        np.asarray(buffers["category_label"])[:1], pre_overflow)
    for k in ("pred_rotation", "pred_translation", "pred_size"):
        assert np.isfinite(np.asarray(ep[k])).all()


def test_sa_fused_l1_matches_unfused_composition_on_device():
    """The L1-fused SA kernel (round-5 default) vs the unfused XLA
    composition at the real stage-2 shape, THROUGH the real compiler —
    tolerance contract (the kernel's U rounds to bf16 pre-extraction)."""
    from istnet_tpu.ops import pointnet2 as xo
    from istnet_tpu.ops.sa_fused_pallas import sa_msg_fused_pallas

    rng = np.random.RandomState(21)
    radii, ns = (0.05, 0.1), (16, 32)
    xyz = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32) * 0.1)
    cent = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.1)
    feats = jnp.asarray(rng.randn(2, 512, 64).astype(np.float32)
                        ).astype(jnp.bfloat16)

    def rand_folded(seed, c_in, channels):
        r = np.random.RandomState(seed)
        layers = []
        for c_out in channels:
            layers.append((jnp.asarray(r.randn(c_in, c_out).astype(np.float32) * 0.2),
                           jnp.asarray(r.randn(c_out).astype(np.float32) * 0.1)))
            c_in = c_out
        return tuple(layers)

    folded = tuple(rand_folded(30 + i, 64 + 3, (64, 64, 128))
                   for i in range(2))
    got = jax.jit(sa_msg_fused_pallas, static_argnums=(0, 1)
                  )(radii, ns, xyz, cent, feats, folded)

    grouped = xo.ball_query_group(radii, ns, xyz, cent, feats, True)
    for g, gr, layers in zip(got, grouped, folded):
        h = gr.astype(jnp.bfloat16)
        for li, (w, b) in enumerate(layers):
            z = jnp.dot(h, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b
            h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        want = jnp.max(jnp.maximum(z, 0.0), axis=2)
        # calibrated on-device: at 2e-2/2e-2 only 13/65536 elements (0.02%)
        # violate, max abs 0.034 — the L1 path's extra bf16 rounding of U
        # compounding through 3 layers; bounds carry ~2x headroom over that
        # measured tail (a wrong formulation shifts whole rows, not a
        # 0.02% fringe)
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=6e-2, atol=6e-2)

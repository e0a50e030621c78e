"""Pallas kernels vs the XLA reference implementations (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from istnet_tpu.ops import pointnet2 as xla_ops
from istnet_tpu.ops.fps_pallas import furthest_point_sample_pallas


def test_fps_pallas_matches_xla():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(4, 128, 3).astype(np.float32) * 0.3)
    got = furthest_point_sample_pallas(xyz, 32, interpret=True)
    want = xla_ops.furthest_point_sample(xyz, 32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_pallas_degenerate_cloud():
    xyz = jnp.zeros((2, 128, 3), jnp.float32)
    got = furthest_point_sample_pallas(xyz, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0)


def test_ball_query_pallas_matches_xla():
    from istnet_tpu.ops.ball_query_pallas import ball_query_pallas
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(3, 128, 3).astype(np.float32) * 0.2)
    cent = xyz[:, :128]
    for radius, ns in [(0.2, 8), (0.5, 16), (0.02, 4)]:
        got = ball_query_pallas(radius, ns, xyz, cent, interpret=True)
        want = xla_ops.ball_query(radius, ns, xyz, cent)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ball_query_pallas_no_hits():
    from istnet_tpu.ops.ball_query_pallas import ball_query_pallas
    xyz = jnp.ones((1, 128, 3), jnp.float32) * 50
    cent = jnp.zeros((1, 128, 3), jnp.float32)
    got = ball_query_pallas(0.1, 8, xyz, cent, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0)


def test_ball_query_group_pallas_matches_xla():
    """Fused query+group == ball_query -> group_points composition, incl.
    pad-with-first-hit rows and features concat."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas

    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    cent = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    feats = jnp.asarray(rng.randn(2, 128, 5).astype(np.float32))
    radii, nsamples = (0.15, 0.4), (4, 8)

    for features, use_xyz in ((None, True), (feats, True), (feats, False)):
        got = ball_query_group_pallas(radii, nsamples, xyz, cent,
                                      features, use_xyz, interpret=True)
        want = xla_ops.ball_query_group(radii, nsamples, xyz, cent,
                                        features, use_xyz)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6, atol=1e-6)


def test_ball_query_group_pallas_n256_no_hit_image():
    """N > 128 tile path with an all-no-hit image (point-0 rows) and
    pad-with-first-hit rows at two radii."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas

    rng = np.random.RandomState(7)
    xyz = np.asarray(rng.randn(2, 256, 3), np.float32) * 0.2
    xyz[1, :, :] += 100.0          # image 1: no hits anywhere -> point-0 rows
    cent = np.asarray(rng.randn(2, 128, 3), np.float32) * 0.2
    got = ball_query_group_pallas((0.15, 0.02), (4, 8), jnp.asarray(xyz),
                                  jnp.asarray(cent), interpret=True)
    want = xla_ops.ball_query_group((0.15, 0.02), (4, 8), jnp.asarray(xyz),
                                    jnp.asarray(cent))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)


def test_ball_query_group_pallas_no_hits_selects_point0():
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas

    xyz = jnp.ones((1, 128, 3), jnp.float32) * 50
    cent = jnp.zeros((1, 128, 3), jnp.float32)
    got = ball_query_group_pallas((0.1,), (4,), xyz, cent, interpret=True)[0]
    want = xla_ops.ball_query_group((0.1,), (4,), xyz, cent)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # CUDA zero-buffer semantics: grouped = point 0 relative to the centroid
    np.testing.assert_allclose(np.asarray(got), 50.0)


def test_ball_query_group_vjp_matches_xla_autodiff():
    """The fused kernel's custom VJP == autodiff through ball_query ->
    group_points (scatter-add to values, -sum to centroids, pad slots
    routing grads to the first hit)."""
    import jax

    from istnet_tpu.ops.ball_query_pallas import ball_query_group

    rng = np.random.RandomState(4)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    cent = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    feats = jnp.asarray(rng.randn(2, 128, 5).astype(np.float32))
    radii, nsamples = (0.15, 0.4), (4, 8)

    def loss_fused(x, c, f):
        outs = ball_query_group(radii, nsamples, True, True, x, c, f)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    def loss_xla(x, c, f):
        outs = xla_ops.ball_query_group(radii, nsamples, x, c, f, True)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(xyz, cent, feats)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(xyz, cent, feats)
    for gf, gx, name in zip(g_fused, g_xla, ("xyz", "new_xyz", "features")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_ball_query_group_vjp_bf16_cotangents():
    """out_dtype=bf16 (the production train path) takes the bf16 one-hot
    scatter branch in ``_bqg_bwd``; its grads must match autodiff through the
    XLA gather path with the same bf16 output rounding (scatter-adds of
    identical bf16 cotangents, ALL reductions f32-accumulated — differences
    are pure summation order, hence the tight rtol). Two pinned invariants:

    1. every reduction in ``_bqg_bwd`` accumulates in f32 (``jnp.sum`` of a
       bf16 array reduces IN bf16 — the slot-sum for new_xyz_bar must upcast
       first; regression caught here in round 2);
    2. the bf16 one-hot MXU scatter is exact (products are 1.0 x g).

    CPU-only caveat (why this comparison is made on the pytest CPU backend):
    on TPU, XLA folds the baseline's f32->bf16->f32 convert pair in the
    BACKWARD graph, so the XLA-path cotangents silently skip the bf16
    rounding a genuine bf16-output op applies — the two sides then differ by
    up to one bf16 ulp (2^-9 rel) through no fault of the kernel. The
    TPU-side invariant was verified directly instead (round 3): given
    identical cotangents, the one-hot bf16 einsum and XLA's scatter-add are
    BITWISE equal on TPU at production shapes (b=2, n=1024, m=256, ns=32)."""
    import jax

    from istnet_tpu.ops.ball_query_pallas import ball_query_group

    rng = np.random.RandomState(11)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    cent = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    feats = jnp.asarray(rng.randn(2, 128, 5).astype(np.float32))
    radii, nsamples = (0.15, 0.4), (4, 8)

    def loss_fused(x, c, f):
        outs = ball_query_group(radii, nsamples, True, True, x, c, f,
                                jnp.bfloat16)
        return sum(jnp.sum(jnp.sin(o.astype(jnp.float32))) for o in outs)

    def loss_xla(x, c, f):
        outs = xla_ops.ball_query_group(radii, nsamples, x, c, f, True)
        return sum(jnp.sum(jnp.sin(o.astype(jnp.bfloat16).astype(jnp.float32)))
                   for o in outs)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(xyz, cent, feats)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(xyz, cent, feats)
    for gf, gx, name in zip(g_fused, g_xla, ("xyz", "new_xyz", "features")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_three_nn_pallas_matches_xla():
    from istnet_tpu.ops.three_nn_pallas import three_nn_pallas
    rng = np.random.RandomState(2)
    unknown = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.3)
    for m in (128, 100, 64):  # incl. non-128-multiple known sets (padded)
        known = jnp.asarray(rng.randn(2, m, 3).astype(np.float32) * 0.3)
        gd, gi = three_nn_pallas(unknown, known, interpret=True)
        wd, wi = xla_ops.three_nn(unknown, known)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
        np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), rtol=1e-4, atol=1e-6)


def test_ball_query_group_pallas_bf16_out_is_rounded_f32():
    """out_dtype=bf16 must equal the f32 kernel output rounded post-hoc
    (the math stays f32; only the final store rounds)."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas

    rng = np.random.RandomState(7)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    cent = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    feats = jnp.asarray(rng.randn(2, 128, 5).astype(np.float32))
    radii, nsamples = (0.15, 0.4), (4, 8)

    f32 = ball_query_group_pallas(radii, nsamples, xyz, cent, feats, True,
                                  interpret=True)
    bf16 = ball_query_group_pallas(radii, nsamples, xyz, cent, feats, True,
                                   interpret=True, out_dtype=jnp.bfloat16)
    for a, b in zip(f32, bf16):
        assert b.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(a.astype(jnp.bfloat16), dtype=np.float32),
            np.asarray(b, dtype=np.float32))


def test_ball_query_group_pallas_bf16_features_compact_split():
    """bf16 features take the compact split layout (exact_c=3); results must
    still exactly match the XLA composition on the f32-upcast features."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas

    rng = np.random.RandomState(11)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    cent = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    feats = jnp.asarray(rng.randn(2, 128, 5), jnp.bfloat16)
    radii, nsamples = (0.15, 0.4), (4, 8)

    for use_xyz in (True, False):
        got = ball_query_group_pallas(radii, nsamples, xyz, cent, feats,
                                      use_xyz, interpret=True)
        want = xla_ops.ball_query_group(radii, nsamples, xyz, cent,
                                        feats.astype(jnp.float32), use_xyz)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fp_interpolate_pallas_matches_xla_composition():
    """Fused 3-NN+weights+interpolate == the three-op XLA composition
    (association-level fp tolerance), f32 and bf16 features, padded M."""
    from istnet_tpu.ops.three_nn_pallas import fp_interpolate_pallas

    rng = np.random.RandomState(6)
    unknown = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.3)
    for m, dtype in [(128, jnp.float32), (100, jnp.float32), (64, jnp.bfloat16)]:
        known = jnp.asarray(rng.randn(2, m, 3).astype(np.float32) * 0.3)
        feats = jnp.asarray(rng.randn(2, m, 6), dtype)
        got = fp_interpolate_pallas(unknown, known, feats, interpret=True)
        dist, idx = xla_ops.three_nn(unknown, known)
        weight = xla_ops.three_interpolate_weights(dist)
        want = xla_ops.three_interpolate(feats.astype(jnp.float32), idx, weight)
        assert got.dtype == dtype
        np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                                   np.asarray(want),
                                   rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
                                   atol=1e-5)


def test_fp_interpolate_vjp_feats_only():
    """Custom VJP routes gradients into feats exactly like autodiff through
    the interpolation matrix, and into NOTHING else (reference ThreeNN
    backward is None, pointnet2_utils.py:144-146)."""
    import jax

    from istnet_tpu.ops.three_nn_pallas import fp_interpolate

    rng = np.random.RandomState(8)
    unknown = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.3)
    known = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32) * 0.3)
    feats = jnp.asarray(rng.randn(2, 64, 6).astype(np.float32))

    def loss_fused(u, k, f):
        return jnp.sum(jnp.sin(fp_interpolate(u, k, f, True)))

    def loss_xla(f):
        dist, idx = xla_ops.three_nn(unknown, known)
        w = xla_ops.three_interpolate_weights(dist)
        return jnp.sum(jnp.sin(xla_ops.three_interpolate(f, idx, w)))

    gu, gk, gf = jax.grad(loss_fused, argnums=(0, 1, 2))(unknown, known, feats)
    gf_want = jax.grad(loss_xla)(feats)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(gu), 0.0)
    np.testing.assert_array_equal(np.asarray(gk), 0.0)


def test_ball_query_group_pallas_t_bit_matches_direct():
    """The transposed-layout kernel (production path) is bit-identical to the
    direct-layout kernel across feature/use_xyz variants."""
    import jax.numpy as jnp
    from istnet_tpu.ops.ball_query_pallas import (ball_query_group_pallas,
                                                  ball_query_group_pallas_t)

    rng = np.random.RandomState(3)
    b, n, m = 2, 256, 128
    xyz = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    cent = jnp.asarray(rng.rand(b, m, 3).astype(np.float32))
    for cf, use_xyz, dt in [(None, True, jnp.float32), (16, True, jnp.bfloat16),
                            (16, False, jnp.float32)]:
        feats = None if cf is None else jnp.asarray(
            rng.randn(b, n, cf).astype(np.float32)).astype(jnp.bfloat16)
        want = ball_query_group_pallas((0.15, 0.3), (4, 8), xyz, cent, feats,
                                       use_xyz, interpret=True, out_dtype=dt)
        got = ball_query_group_pallas_t((0.15, 0.3), (4, 8), xyz, cent, feats,
                                        use_xyz, interpret=True, out_dtype=dt)
        for a, c in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_ball_query_group_pallas_n2048_hillis_steele_path():
    """N > 1024 drops the triangular-matmul cumsum for Hillis-Steele rolls
    (make_tri -> None) — the 2048-pt config's path. Also exercises ranks far
    above the 48-slot window, where the blocked one-hot's block plane leaves
    bf16's exact-integer range (>=256 rounds, but every rounded value stays
    >= 1 away from all slot targets, so indicators are still exactly 0)."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas

    rng = np.random.RandomState(11)
    # tight cluster: one centroid sees ~2000 hits -> ranks up to N
    xyz = np.asarray(rng.randn(1, 2048, 3), np.float32) * 0.02
    cent = np.zeros((1, 128, 3), np.float32)
    cent[0, 1:] = rng.randn(127, 3).astype(np.float32) * 0.2
    got = ball_query_group_pallas((0.5, 0.05), (4, 16), jnp.asarray(xyz),
                                  jnp.asarray(cent), interpret=True)
    want = xla_ops.ball_query_group((0.5, 0.05), (4, 16), jnp.asarray(xyz),
                                    jnp.asarray(cent))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)


def test_ball_query_group_pallas_t_n2048_matches_normal_layout():
    """Transposed production kernel at N=2048 (sublane Hillis-Steele) is
    bit-identical to the normal layout."""
    from istnet_tpu.ops.ball_query_pallas import (ball_query_group_pallas,
                                                  ball_query_group_pallas_t)

    rng = np.random.RandomState(12)
    xyz = jnp.asarray(np.asarray(rng.randn(1, 2048, 3), np.float32) * 0.05)
    cent = jnp.asarray(np.asarray(rng.randn(1, 128, 3), np.float32) * 0.05)
    a = ball_query_group_pallas((0.2, 0.05), (4, 16), xyz, cent, interpret=True)
    b = ball_query_group_pallas_t((0.2, 0.05), (4, 16), xyz, cent, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bqg_tile_lane_legal_all_stage_shapes():
    """The transposed kernel carries TM on the lane axis: every tile must be
    a multiple of 128 or the whole M (Mosaic block rule). Regression: at
    N=2048 the VMEM budget shrink used to pick 64 < M and the 2048-pt config
    stopped compiling on TPU (interpret-mode tests can't see this)."""
    from istnet_tpu.ops.ball_query_pallas import bqg_tile

    for n, m, c in ((1024, 512, 3), (512, 256, 67), (256, 128, 131),
                    (128, 64, 259), (2048, 512, 3), (1024, 256, 67),
                    (512, 128, 131), (256, 64, 259)):
        tm = bqg_tile(m, n, c, (16, 32))
        assert m % tm == 0
        assert tm == m or tm % 128 == 0, (n, m, c, tm)

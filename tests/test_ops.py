"""Unit tests: XLA point ops vs the loop-based golden spec of the CUDA kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from istnet_tpu.ops import pointnet2 as ops
from istnet_tpu.ops import golden


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(0)
    return rng.randn(3, 64, 3).astype(np.float32) * 0.3


def test_fps_matches_golden(clouds):
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(clouds), 16))
    want = golden.fps_golden(clouds, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_first_index_zero(clouds):
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(clouds), 8))
    assert (got[:, 0] == 0).all()
    # all indices distinct per batch (no repeats while npoint < N)
    for row in got:
        assert len(set(row.tolist())) == len(row)


@pytest.mark.parametrize("radius,nsample", [(0.2, 8), (0.5, 4), (0.05, 8)])
def test_ball_query_matches_golden(clouds, radius, nsample):
    centroids = clouds[:, :10]
    got = np.asarray(ops.ball_query(radius, nsample, jnp.asarray(clouds), jnp.asarray(centroids)))
    want = golden.ball_query_golden(radius, nsample, clouds, centroids)
    np.testing.assert_array_equal(got, want)


def test_ball_query_no_hits_is_zero():
    xyz = np.ones((1, 8, 3), np.float32) * 100.0
    new_xyz = np.zeros((1, 2, 3), np.float32)
    got = np.asarray(ops.ball_query(0.1, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    np.testing.assert_array_equal(got, 0)


def test_three_nn_matches_golden(clouds):
    known = clouds[:, :20]
    dist, idx = ops.three_nn(jnp.asarray(clouds), jnp.asarray(known))
    wdist, widx = golden.three_nn_golden(clouds, known)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-5, atol=1e-6)


def test_gather_group_shapes(clouds):
    feats = jnp.asarray(np.random.RandomState(1).randn(3, 64, 7).astype(np.float32))
    idx = ops.furthest_point_sample(jnp.asarray(clouds), 16)
    g = ops.gather_points(feats, idx)
    assert g.shape == (3, 16, 7)
    np.testing.assert_allclose(np.asarray(g)[0, 0], np.asarray(feats)[0, idx[0, 0]])

    gidx = ops.ball_query(0.5, 4, jnp.asarray(clouds), ops.gather_points(jnp.asarray(clouds), idx))
    grouped = ops.group_points(feats, gidx)
    assert grouped.shape == (3, 16, 4, 7)
    np.testing.assert_allclose(
        np.asarray(grouped)[1, 2, 3], np.asarray(feats)[1, gidx[1, 2, 3]])


def test_three_interpolate_values():
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    idx = jnp.asarray(np.array([[[0, 1, 2], [3, 3, 3]]], np.int32))
    w = jnp.asarray(np.array([[[0.5, 0.25, 0.25], [1 / 3, 1 / 3, 1 / 3]]], np.float32))
    out = ops.three_interpolate(feats, idx, w)
    want0 = 0.5 * np.arange(3) + 0.25 * np.arange(3, 6) + 0.25 * np.arange(6, 9)
    np.testing.assert_allclose(np.asarray(out)[0, 0], want0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[0, 1], np.arange(9, 12), rtol=1e-6)


def test_gather_backward_is_scatter_add():
    feats = jnp.ones((1, 5, 2), jnp.float32)
    idx = jnp.asarray(np.array([[0, 0, 3]], np.int32))

    def f(x):
        return jnp.sum(ops.gather_points(x, idx))

    g = jax.grad(f)(feats)
    want = np.zeros((1, 5, 2), np.float32)
    want[0, 0] = 2.0  # index 0 gathered twice -> grad accumulates
    want[0, 3] = 1.0
    np.testing.assert_allclose(np.asarray(g), want)


def test_three_interpolate_grad():
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(1, 6, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 6, size=(1, 5, 3)).astype(np.int32))
    w = jax.nn.softmax(jnp.asarray(rng.randn(1, 5, 3).astype(np.float32)), axis=-1)

    def f(p, w_):
        return jnp.sum(ops.three_interpolate(p, idx, w_) ** 2)

    # finite-difference check on a single coordinate
    gp, gw = jax.grad(f, argnums=(0, 1))(feats, w)
    eps = 1e-3
    e = np.zeros_like(np.asarray(feats)); e[0, 2, 1] = eps
    fd = (f(feats + e, w) - f(feats - e, w)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(gp)[0, 2, 1], fd, rtol=1e-2, atol=1e-3)


def test_three_interpolate_mm_matches_gather():
    """The TPU interp-matrix path == the gather path (fp association only;
    also differentiable, same grads to finite-difference tolerance)."""
    from istnet_tpu.ops import pointnet2 as xla_ops

    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(2, 16, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 16, size=(2, 9, 3)).astype(np.int32))
    w = jax.nn.softmax(jnp.asarray(rng.randn(2, 9, 3).astype(np.float32)), axis=-1)

    a = xla_ops.three_interpolate(feats, idx, w)
    b = xla_ops.three_interpolate_mm(feats, idx, w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(xla_ops.three_interpolate(p, idx, w) ** 2))(feats)
    gb = jax.grad(lambda p: jnp.sum(xla_ops.three_interpolate_mm(p, idx, w) ** 2))(feats)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-6)

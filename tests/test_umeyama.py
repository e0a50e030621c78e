"""Umeyama + RANSAC similarity fit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from istnet_tpu.ops.umeyama import estimate_similarity_transform, ransac_similarity, umeyama


def _random_similarity(rng):
    q = rng.randn(4); q /= np.linalg.norm(q)
    w, x, y, z = q
    r = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
    s = rng.uniform(0.5, 2.0)
    t = rng.randn(3)
    return s, r, t


def test_umeyama_exact_recovery():
    rng = np.random.RandomState(0)
    s, r, t = _random_similarity(rng)
    src = rng.randn(50, 3)
    tgt = src @ (s * r).T + t
    es, er, et, etf = umeyama(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(float(es), s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(er), r, atol=1e-5)
    np.testing.assert_allclose(np.asarray(et), t, atol=1e-5)


def test_umeyama_weighted_equals_subset():
    rng = np.random.RandomState(1)
    s, r, t = _random_similarity(rng)
    src = rng.randn(40, 3)
    tgt = src @ (s * r).T + t
    tgt[30:] += rng.randn(10, 3) * 5  # corrupt a subset
    w = np.zeros(40); w[:30] = 1.0
    es_w, er_w, _, _ = umeyama(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    es_s, er_s, _, _ = umeyama(jnp.asarray(src[:30]), jnp.asarray(tgt[:30]))
    np.testing.assert_allclose(float(es_w), float(es_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(er_w), np.asarray(er_s), atol=1e-6)


def test_ransac_rejects_outliers():
    rng = np.random.RandomState(2)
    s, r, t = _random_similarity(rng)
    src = rng.randn(200, 3) * 0.3
    tgt = src @ (s * r).T + t
    out_idx = rng.choice(200, 40, replace=False)
    tgt[out_idx] += rng.randn(40, 3) * 3.0  # 20% outliers
    res = ransac_similarity(jnp.asarray(src), jnp.asarray(tgt), jax.random.PRNGKey(0))
    assert bool(res["valid"])
    np.testing.assert_allclose(float(res["scale"]), s, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(res["rotation"]), r, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res["translation"]), t, atol=1e-2)


def test_wrapper_api():
    rng = np.random.RandomState(3)
    s, r, t = _random_similarity(rng)
    src = rng.randn(60, 3)
    tgt = src @ (s * r).T + t
    es, er, et, etf = estimate_similarity_transform(src, tgt)
    assert es is not None
    np.testing.assert_allclose(etf[:3, :3], s * np.asarray(er), rtol=1e-4)


def test_batched_over_instances():
    rng = np.random.RandomState(4)
    srcs, tgts = [], []
    for _ in range(4):
        s, r, t = _random_similarity(rng)
        src = rng.randn(100, 3)
        srcs.append(src)
        tgts.append(src @ (s * r).T + t)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    out = jax.vmap(lambda s_, t_, k: ransac_similarity(s_, t_, k))(
        jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(tgts)), keys)
    assert bool(out["valid"].all())
    assert out["rotation"].shape == (4, 3, 3)

"""Umeyama similarity fit + RANSAC — batched, on-device (JAX).

Rebuild of the reference ``utils/align.py`` (itself from NOCS_CVPR2019):

- ``umeyama``: weighted similarity (s, R, t) fit via SVD
  (``align.py:10-41``: cov = centered_target @ centered_source^T / n, det sign
  fix, scale = sum(singular values)/var(source), t = mean_t - s R mean_s).
  Weights generalize the reference's subset refit: fitting on an inlier mask
  is exactly the weighted fit.
- ``ransac_similarity``: the reference's RANSAC (``align.py:44-101``: 5-point
  hypotheses, adaptive inlier threshold = scale * source_diameter/10, best
  inlier ratio, refit on inliers) — redesigned TPU-first: all ``max_iter``
  hypotheses are evaluated in PARALLEL via vmap (the reference's sequential
  early-break at 0.99 confidence is a CPU-latency optimization; evaluating
  all 128 is one batched SVD and strictly no worse statistically).
  ``valid=False`` replaces the None return for inlier ratio < 0.1.

Both are vmap-able over instances and jit-compile to a single XLA program —
the "Umeyama/SVD pose alignment runs batched on-device" item of the north star.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def umeyama(source: Array, target: Array, weights: Array | None = None):
    """Weighted similarity fit: find (s, R, t) with target ~= s R source + t.

    Args:
      source, target: ``(N, 3)``.
      weights: optional ``(N,)`` nonnegative; None = uniform.

    Returns:
      (scale, rotation (3,3), translation (3,), transform (4,4)).
    """
    source = source.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones(source.shape[0], jnp.float32)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)

    mu_s = jnp.sum(source * w[:, None], axis=0)
    mu_t = jnp.sum(target * w[:, None], axis=0)
    cs = source - mu_s
    ct = target - mu_t
    cov = (ct * w[:, None]).T @ cs  # (3, 3), target-major like the reference

    u, d, vh = jnp.linalg.svd(cov, full_matrices=True)
    sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vh))
    d = d.at[-1].multiply(sign)
    u = u.at[:, -1].multiply(sign)
    rotation = u @ vh

    var_s = jnp.sum(jnp.sum(cs * cs * w[:, None], axis=0))
    scale = jnp.sum(d) / jnp.maximum(var_s, 1e-12)
    translation = mu_t - scale * (rotation @ mu_s)

    transform = jnp.eye(4)
    transform = transform.at[:3, :3].set(scale * rotation)
    transform = transform.at[:3, 3].set(translation)
    return scale, rotation, translation, transform


@functools.partial(jax.jit, static_argnums=(3,))
def ransac_similarity(source: Array, target: Array, key: Array,
                      max_iter: int = 128):
    """RANSAC similarity fit, all hypotheses in parallel.

    Args:
      source, target: ``(N, 3)`` correspondences (e.g. NOCS coords -> camera pts).
      key: PRNG key.
      max_iter: number of 5-point hypotheses (static).

    Returns:
      dict(scale, rotation, translation, transform, inlier_ratio, valid).
    """
    n = source.shape[0]
    diameter = 2.0 * jnp.max(jnp.linalg.norm(
        source - jnp.mean(source, axis=0), axis=-1))
    inlier_t = diameter / 10.0

    idx = jax.random.randint(key, (max_iter, 5), 0, n)

    def hypothesis(sub_idx):
        s, r, t, tf = umeyama(source[sub_idx], target[sub_idx])
        resid = jnp.linalg.norm(
            target - (source @ (s * r).T + t), axis=-1)
        inlier = resid < s * inlier_t
        return jnp.mean(inlier.astype(jnp.float32)), inlier

    ratios, inliers = jax.vmap(hypothesis)(idx)
    best = jnp.argmax(ratios)
    best_ratio = ratios[best]
    best_mask = inliers[best].astype(jnp.float32)

    scale, rotation, translation, transform = umeyama(source, target, best_mask)
    return {
        "scale": scale,
        "rotation": rotation,
        "translation": translation,
        "transform": transform,
        "inlier_ratio": best_ratio,
        "valid": best_ratio >= 0.1,
    }


def estimate_similarity_transform(source, target, seed: int = 0, max_iter: int = 128):
    """numpy-friendly wrapper matching the reference API (align.py:44-101).

    Returns (scale, rotation, translation, transform) or all-None when the
    fit is degenerate, like the reference.
    """
    import numpy as np

    out = ransac_similarity(jnp.asarray(source), jnp.asarray(target),
                            jax.random.PRNGKey(seed), max_iter)
    if not bool(out["valid"]):
        return None, None, None, None
    return (float(out["scale"]), np.asarray(out["rotation"]),
            np.asarray(out["translation"]), np.asarray(out["transform"]))

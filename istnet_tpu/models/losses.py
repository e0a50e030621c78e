"""Loss primitives — rebuild of the reference ``model/losses.py``."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def smooth_l1_dis(p1: Array, p2: Array, threshold: float = 0.1) -> Array:
    """Smooth-L1 point distance (losses.py:3-22): per-coordinate smooth L1,
    summed over xyz, mean over batch*points."""
    diff = jnp.abs(p1.astype(jnp.float32) - p2.astype(jnp.float32))
    less = jnp.square(diff) / (2.0 * threshold)
    higher = diff - threshold / 2.0
    dis = jnp.where(diff > threshold, higher, less)
    return jnp.mean(jnp.sum(dis, axis=-1))


def chamfer_dis(p1: Array, p2: Array) -> Array:
    """Symmetric Chamfer distance (losses.py:25-34). Defined for parity;
    unused by IST-Net (as in the reference)."""
    dis = jnp.linalg.norm(p1[:, :, None, :] - p2[:, None, :, :], axis=-1)
    dis1 = jnp.min(dis, axis=2)
    dis2 = jnp.min(dis, axis=1)
    return jnp.mean(0.5 * jnp.mean(dis1, axis=1) + 0.5 * jnp.mean(dis2, axis=1))


def _norm_zero_subgrad(d: Array, axis: int) -> Array:
    """L2 norm whose gradient at an EXACT-zero vector is 0, like torch.

    ``torch.norm``'s backward returns 0 at the zero vector (verified:
    ``torch.norm(zeros, dim=0).backward()`` -> zeros) while jnp.linalg.norm's
    is NaN (d sqrt(0)). A converged training run CAN produce an exact-zero
    pose diff — the synthetic-convergence test hit NaN at step ~78 through
    exactly this — so the reference's subgradient convention is load-bearing,
    not cosmetic. Standard double-where keeps the backward NaN-free."""
    sq = jnp.sum(jnp.square(d), axis=axis)
    return jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)


def pose_dis(r1: Array, t1: Array, s1: Array, r2: Array, t2: Array, s2: Array) -> Array:
    """Pose distance (losses.py:37-49): mean column norms of R diff + mean
    norms of t and s diffs."""
    dis_r = jnp.mean(_norm_zero_subgrad(r1 - r2, axis=1))  # norm over rows -> per-column
    dis_t = jnp.mean(_norm_zero_subgrad(t1 - t2, axis=1))
    dis_s = jnp.mean(_norm_zero_subgrad(s1 - s2, axis=1))
    return dis_r + dis_t + dis_s


def feature_mse(a: Array, b: Array) -> Array:
    """nn.functional.mse_loss equivalent (ist_net.py:99); accumulated in f32."""
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))

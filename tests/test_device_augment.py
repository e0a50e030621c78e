"""On-device augmentation vs the numpy (host) reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from istnet_tpu.data import augment as host_aug
from istnet_tpu.data.device_augment import (
    _euler_rotation, defor_3d_bb_batch, defor_3d_rt_batch, device_augment)


def _sample(rng, b=4, n=64):
    q = rng.randn(b, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    r = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(b, 3, 3).astype(np.float32)
    return {
        "pc": rng.randn(b, n, 3).astype(np.float32) * 0.1,
        "r": r,
        "t": rng.randn(b, 3).astype(np.float32) * 0.2,
        "s": rng.uniform(0.1, 0.4, (b, 3)).astype(np.float32),
        "nocs": rng.randn(b, n, 3).astype(np.float32) * 0.3,
    }


def test_euler_rotation_matches_host():
    rng = np.random.RandomState(0)
    angles = rng.uniform(-15, 15, (5, 3)).astype(np.float32)
    got = np.asarray(_euler_rotation(jnp.asarray(angles)))
    for i in range(5):
        want = host_aug.get_rotation(*angles[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_bb_batch_matches_host():
    rng = np.random.RandomState(1)
    d = _sample(rng)
    aug_bb = rng.uniform(0.8, 1.2, (4, 3)).astype(np.float32)
    sym0 = np.array([1, 0, 1, 0], np.int32)
    pc_new, s_new, nocs_new = defor_3d_bb_batch(
        jnp.asarray(d["pc"]), jnp.asarray(d["r"]), jnp.asarray(d["t"]),
        jnp.asarray(d["s"]), jnp.asarray(d["nocs"]), jnp.asarray(sym0),
        jnp.asarray(aug_bb))
    for i in range(4):
        model = d["nocs"][i].copy()  # any (M, 3) works; unused by assertions
        w_pc, w_s, w_nocs, _ = host_aug.defor_3d_bb(
            d["pc"][i], d["r"][i], d["t"][i], d["s"][i].copy(),
            d["nocs"][i].copy(), model, sym=[sym0[i]], aug_bb=aug_bb[i])
        np.testing.assert_allclose(np.asarray(pc_new)[i], w_pc, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_new)[i], w_s, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(nocs_new)[i], w_nocs, rtol=1e-4, atol=1e-6)


def test_rt_batch_matches_host():
    rng = np.random.RandomState(2)
    d = _sample(rng)
    aug_t = (rng.rand(4, 3) * 0.1 - 0.05).astype(np.float32)
    aug_r = np.stack([host_aug.get_rotation(*rng.uniform(-15, 15, 3))
                      for _ in range(4)])
    pc_new, r_new, t_new = defor_3d_rt_batch(
        jnp.asarray(d["pc"]), jnp.asarray(d["r"]), jnp.asarray(d["t"]),
        jnp.asarray(aug_t), jnp.asarray(aug_r))
    for i in range(4):
        w_pc, w_r, w_t = host_aug.defor_3d_rt(
            d["pc"][i].copy(), d["r"][i], d["t"][i].copy(), aug_t[i], aug_r[i])
        np.testing.assert_allclose(np.asarray(pc_new)[i], w_pc, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r_new)[i], w_r, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_new)[i], w_t, rtol=1e-5, atol=1e-6)


def test_device_augment_jits_and_preserves_consistency():
    """qo must track pts: the pose equation qo = (pts - t)/||s|| @ R holds
    before and after augmentation."""
    rng = np.random.RandomState(3)
    b, n = 8, 64
    d = _sample(rng, b, n)
    # construct consistent qo from the pose
    qo = ((d["pc"] - d["t"][:, None]) / np.linalg.norm(
        d["s"], axis=1)[:, None, None]) @ d["r"]
    batch = {
        "inputs": {"pts": jnp.asarray(d["pc"]), "qo": jnp.asarray(qo),
                   "sym_info": jnp.zeros((b, 4), jnp.int32)},
        "labels": {"qo": jnp.asarray(qo), "rotation_label": jnp.asarray(d["r"]),
                   "translation_label": jnp.asarray(d["t"]),
                   "size_label": jnp.asarray(d["s"])},
    }
    out = jax.jit(lambda bt, k: device_augment(bt, k, 1.0, 1.0))(
        batch, jax.random.PRNGKey(0))
    pc = np.asarray(out["inputs"]["pts"])
    r = np.asarray(out["labels"]["rotation_label"])
    t = np.asarray(out["labels"]["translation_label"])
    s = np.asarray(out["labels"]["size_label"])
    qo_new = np.asarray(out["labels"]["qo"])
    # rt aug preserves the pose equation; bb scales qo consistently with s
    recon = ((pc - t[:, None]) / np.linalg.norm(s, axis=1)[:, None, None]) @ r
    np.testing.assert_allclose(recon, qo_new, rtol=1e-3, atol=1e-5)
    assert not np.allclose(pc, d["pc"])  # something actually changed

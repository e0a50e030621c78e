"""On-device (batched, jittable) FS-Net shape augmentation.

The reference applies ``defor_3D_bb``/``defor_3D_rt`` per sample on CPU inside
dataloader workers (``provider/data_augmentation.py:208-235``); here the same
transforms run batched on the TPU as part of the (jitted) train step — the
"on-device augmentation" of BASELINE config #4. Only the augs the shipped
configs enable (bb + rt at p=0.3; ``config/ist_net_default.yaml:38-42``) are
implemented on device; bc/pc/nl remain host-side (their config probability is
0.0).

Semantics per sample match ``istnet_tpu.data.augment`` exactly (verified in
tests/test_device_augment.py); randomness comes from a JAX PRNG key, applied
per-sample with per-sample Bernoulli gates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _euler_rotation(angles_deg: Array) -> Array:
    """(..., 3) XYZ euler degrees -> (..., 3, 3), Rz @ Ry @ Rx
    (data_augmentation.py:8-24)."""
    rad = jnp.deg2rad(angles_deg)
    cx, cy, cz = jnp.cos(rad[..., 0]), jnp.cos(rad[..., 1]), jnp.cos(rad[..., 2])
    sx, sy, sz = jnp.sin(rad[..., 0]), jnp.sin(rad[..., 1]), jnp.sin(rad[..., 2])
    z = jnp.zeros_like(cx)
    o = jnp.ones_like(cx)
    rx = jnp.stack([o, z, z, z, cx, -sx, z, sx, cx], -1).reshape(*cx.shape, 3, 3)
    ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], -1).reshape(*cx.shape, 3, 3)
    rz = jnp.stack([cz, -sz, z, sz, cz, z, z, z, o], -1).reshape(*cx.shape, 3, 3)
    return rz @ ry @ rx


def defor_3d_bb_batch(pc: Array, r: Array, t: Array, s: Array, nocs: Array,
                      sym0: Array, aug_bb: Array):
    """Batched bbox stretch (data_augmentation.py:45-90). All args batched."""
    ex, ey, ez = aug_bb[..., 0], aug_bb[..., 1], aug_bb[..., 2]
    exz = (ex + ez) / 2
    scale_vec = jnp.where(
        (sym0 == 1)[..., None],
        jnp.stack([exz, ey, exz], -1),
        jnp.stack([ex, ey, ez], -1))  # (B, 3)
    nocs_scale_aug = (jnp.linalg.norm(s * scale_vec, axis=-1)
                      / jnp.linalg.norm(s, axis=-1))
    pc_obj = jnp.einsum("bnc,bcd->bnd", pc - t[:, None], r)
    pc_obj = pc_obj * scale_vec[:, None]
    pc_new = jnp.einsum("bnc,bdc->bnd", pc_obj, r) + t[:, None]
    s_new = s * scale_vec
    nocs_new = nocs * scale_vec[:, None] / nocs_scale_aug[:, None, None]
    return pc_new, s_new, nocs_new


def defor_3d_rt_batch(pc: Array, r: Array, t: Array, aug_t: Array, aug_r: Array):
    """Batched random rigid motion (data_augmentation.py:94-130)."""
    pc = pc + aug_t[:, None]
    t = t + aug_t
    pc = jnp.einsum("bnc,bdc->bnd", pc, aug_r)  # pc @ Rm^T
    r = aug_r @ r
    t = jnp.einsum("bdc,bc->bd", aug_r, t)
    return pc, r, t


def device_augment(batch: dict, rng: Array, aug_bb_pro: float = 0.3,
                   aug_rt_pro: float = 0.3, s_range=(0.8, 1.2),
                   a_trans: float = 50.0, a_rot: float = 15.0) -> dict:
    """Apply bb+rt augmentation to a training batch on device.

    batch needs: inputs.pts/qo, labels.rotation_label/translation_label/
    size_label/qo, and inputs must carry ``sym_info`` (first component only is
    used by bb). Returns a new batch dict (functional).
    """
    inputs = dict(batch["inputs"])
    labels = dict(batch["labels"])
    pc = inputs["pts"]
    nocs = labels["qo"]
    r = labels["rotation_label"]
    t = labels["translation_label"]
    s = labels["size_label"]
    sym0 = inputs.get("sym_info", jnp.zeros(pc.shape[0], jnp.int32))
    if sym0.ndim > 1:
        sym0 = sym0[:, 0]
    b = pc.shape[0]

    k_bbp, k_rtp, k_e, k_a, k_t = jax.random.split(rng, 5)

    # bbox stretch
    ex = jax.random.uniform(k_e, (b, 3), minval=s_range[0], maxval=s_range[1])
    pc_bb, s_bb, nocs_bb = defor_3d_bb_batch(pc, r, t, s, nocs, sym0, ex)
    take_bb = (jax.random.uniform(k_bbp, (b,)) < aug_bb_pro)
    pc = jnp.where(take_bb[:, None, None], pc_bb, pc)
    s = jnp.where(take_bb[:, None], s_bb, s)
    nocs = jnp.where(take_bb[:, None, None], nocs_bb, nocs)

    # rigid motion
    angles = jax.random.uniform(k_a, (b, 3), minval=-a_rot, maxval=a_rot)
    aug_r = _euler_rotation(angles)
    aug_t = jax.random.uniform(k_t, (b, 3), minval=-a_trans, maxval=a_trans) / 1000.0
    pc_rt, r_rt, t_rt = defor_3d_rt_batch(pc, r, t, aug_t, aug_r)
    take_rt = (jax.random.uniform(k_rtp, (b,)) < aug_rt_pro)
    pc = jnp.where(take_rt[:, None, None], pc_rt, pc)
    r = jnp.where(take_rt[:, None, None], r_rt, r)
    t = jnp.where(take_rt[:, None], t_rt, t)

    inputs["pts"] = pc
    inputs["qo"] = nocs
    labels["qo"] = nocs
    labels["rotation_label"] = r
    labels["translation_label"] = t
    labels["size_label"] = s
    return {"inputs": inputs, "labels": labels}

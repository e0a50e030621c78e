"""Fully-device training input pipeline: raw-array dataset -> jitted step.

Covers the round-2 integration of ``data.device_preprocess`` into the
TRAINING path (reference semantics: ``provider/dataset.py:162-296``):
raw-mode TrainingDataset output contract, the on-device preprocess fn, its
composition with device augmentation inside one jitted DP train step, and
the device ColorJitter vs the host (PIL) implementation per-op.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from istnet_tpu.data import DataLoader, TrainingDataset
from istnet_tpu.utils.config import Config
from tests.test_e2e_synthetic import _write_scene

IMG_SIZE = 48
N_PTS = 128


def _cfg(device_pre=True):
    return Config({"img_size": IMG_SIZE, "sample_num": N_PTS, "shift_range": 0.01,
                   "use_shape_aug": False, "use_device_aug": True,
                   "use_device_preprocess": device_pre,
                   "aug_bb_pro": 0.3, "aug_rt_pro": 0.3, "aug_bc_pro": 0.0,
                   "aug_pc_pro": 0.0, "aug_pc_r": 0.002, "aug_nl_pro": 0.0})


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    import os
    import pickle
    root = tmp_path_factory.mktemp("nocs_raw")
    data_dir = root / "data"
    real_dir = data_dir / "Real" / "train" / "scene_1"
    stems = ["0000", "0001"]
    for i, stem in enumerate(stems):
        _write_scene(str(real_dir), stem, seed=i)
    with open(data_dir / "Real" / "train_list.txt", "w") as f:
        f.writelines(f"train/scene_1/{s}\n" for s in stems)
    models = {f"model_{i}": np.random.RandomState(i).rand(64, 3).astype(np.float32) - 0.5
              for i in range(2)}
    os.makedirs(data_dir / "obj_models", exist_ok=True)
    with open(data_dir / "obj_models" / "real_train.pkl", "wb") as f:
        pickle.dump(models, f)
    return str(data_dir)


def test_raw_mode_sample_contract(train_root):
    ds = TrainingDataset(_cfg(), train_root, data_type="real_withLabel",
                         num_img_per_epoch=4, seed=0, device_preprocess=True)
    ds.reset()
    s = ds[0]
    assert s["depth_raw"].shape == (480, 640) and s["depth_raw"].dtype == np.float32
    assert s["rgb_raw"].shape == (480, 640, 3) and s["rgb_raw"].dtype == np.uint8
    assert s["mask_raw"].shape == (480, 640) and s["mask_raw"].dtype == bool
    assert s["mask_raw"].any()
    assert s["bbox"].shape == (4,)
    assert s["intrinsics"].shape == (4,)
    assert s["rotation_label"].shape == (3, 3)
    # no host-preprocessed keys in raw mode
    assert "pts" not in s and "qo" not in s and "choose" not in s


def test_raw_mode_refuses_host_shape_aug(train_root):
    cfg = _cfg()
    cfg.use_shape_aug = True
    with pytest.raises(ValueError, match="use_device_aug"):
        TrainingDataset(cfg, train_root, device_preprocess=True)


def test_device_preprocess_matches_host_geometry(train_root):
    """Device pipeline output agrees with the host pipeline on everything
    deterministic: crop window, backprojected point lattice, qo formula."""
    from istnet_tpu.data.depth_utils import backproject, fill_missing, get_bbox
    from istnet_tpu.data.device_preprocess import make_train_preprocess

    cfg = _cfg()
    ds_raw = TrainingDataset(cfg, train_root, data_type="real_withLabel",
                             num_img_per_epoch=2, seed=0, device_preprocess=True)
    ds_raw.reset()
    loader = DataLoader(ds_raw, batch_size=2, num_workers=1, shuffle=False, seed=0)
    raw = next(iter(loader))

    pre = make_train_preprocess(img_size=IMG_SIZE, sample_num=N_PTS)
    out = jax.jit(pre)(jax.tree_util.tree_map(jnp.asarray, raw),
                       jax.random.PRNGKey(0))
    pts = np.asarray(out["inputs"]["pts"])
    qo = np.asarray(out["labels"]["qo"])
    rgb = np.asarray(out["inputs"]["rgb"])
    choose = np.asarray(out["inputs"]["choose"])

    assert pts.shape == (2, N_PTS, 3) and qo.shape == (2, N_PTS, 3)
    assert rgb.shape == (2, IMG_SIZE, IMG_SIZE, 3)
    assert np.isfinite(pts).all() and np.isfinite(qo).all() and np.isfinite(rgb).all()
    assert choose.min() >= 0 and choose.max() < IMG_SIZE * IMG_SIZE

    for b in range(2):
        # host reference: same fill -> backproject -> mask
        filled = fill_missing(raw["depth_raw"][b], 1000.0, 1)
        pts_map = backproject(filled, raw["intrinsics"][b])
        valid = raw["mask_raw"][b] & (filled > 0)
        assert valid.any()
        vp = pts_map[valid]
        # device points = host lattice + jitter (|jitter| <= 0.005 per axis)
        d = np.abs(pts[b][:, None, :] - vp[None, :, :]).max(axis=-1).min(axis=1)
        assert float(d.max()) <= 0.005 + 1e-5, f"sample {b}: {d.max()}"
        # all sampled points inside the reference crop window
        rmin, rmax, cmin, cmax = get_bbox(raw["bbox"][b])
        inside = ((pts_map[rmin:rmax, cmin:cmax].reshape(-1, 3)[None] - pts[b][:, None])
                  ** 2).sum(-1).min(1)
        assert float(inside.max()) < (0.01) ** 2
        # qo formula vs labels
        t = raw["translation_label"][b]
        s = raw["size_label"][b]
        r = raw["rotation_label"][b]
        want = (pts[b] - t) / (np.linalg.norm(s) + 1e-8) @ r
        np.testing.assert_allclose(qo[b], want, rtol=1e-4, atol=1e-5)


def test_full_device_train_step_with_aug(train_root):
    """Raw batch -> preprocess + bb/rt aug + model fwd/bwd in ONE jitted step."""
    from istnet_tpu.data.device_augment import device_augment
    from istnet_tpu.data.device_preprocess import make_train_preprocess
    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.train.train_state import (create_train_state, make_optimizer,
                                              make_train_step)

    cfg = _cfg()
    ds = TrainingDataset(cfg, train_root, data_type="real_withLabel",
                         num_img_per_epoch=2, seed=0, device_preprocess=True)
    ds.reset()
    raw = next(iter(DataLoader(ds, batch_size=2, num_workers=1, shuffle=False)))

    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    dummy = {"rgb": jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
             "pts": jnp.zeros((1, N_PTS, 3)),
             "choose": jnp.zeros((1, N_PTS), jnp.int32),
             "category_label": jnp.zeros((1,), jnp.int32),
             "qo": jnp.zeros((1, N_PTS, 3))}
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    tcfg = Config({"optimizer": {"name": "Adam", "lr": 0.01, "betas": [0.5, 0.999],
                                 "eps": 1e-6, "weight_decay": 0},
                   "max_epoch": 1,
                   "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": 4000,
                          "bnm_clip": 0.01}})
    tx, _ = make_optimizer(tcfg, 4000, variables["params"])
    step = jax.jit(make_train_step(
        model, lambda e, l: supervised_loss(e, l, 1.0, 10.0, False), tx, tcfg.bn,
        augment_fn=lambda b, r: device_augment(b, r),
        preprocess_fn=make_train_preprocess(img_size=IMG_SIZE, sample_num=N_PTS)))
    state = create_train_state(variables["params"], variables["batch_stats"], tx)
    state, metrics = step(state, jax.tree_util.tree_map(jnp.asarray, raw),
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_device_color_jitter_ops_match_pil():
    """Each device adjustment matches its PIL/torchvision counterpart."""
    from PIL import Image, ImageEnhance

    from istnet_tpu.data import device_transforms as dt

    rng = np.random.RandomState(7)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    pil = Image.fromarray(img)
    x = jnp.asarray(img, jnp.float32)[None]

    for f in (0.8, 1.0, 1.2):
        want = np.asarray(ImageEnhance.Brightness(pil).enhance(f), np.float32)
        got = np.asarray(dt.adjust_brightness(x, jnp.full((1, 1, 1, 1), f)))[0]
        assert np.abs(got - want).max() <= 1.0, f"brightness {f}"

        want = np.asarray(ImageEnhance.Contrast(pil).enhance(f), np.float32)
        got = np.asarray(dt.adjust_contrast(x, jnp.full((1, 1, 1, 1), f)))[0]
        assert np.abs(got - want).max() <= 1.5, f"contrast {f}"

        want = np.asarray(ImageEnhance.Color(pil).enhance(f), np.float32)
        got = np.asarray(dt.adjust_saturation(x, jnp.full((1, 1, 1, 1), f)))[0]
        assert np.abs(got - want).max() <= 1.5, f"saturation {f}"

    # hue: PIL shifts the 256-step uint8 hue wheel by int(f*255) steps
    # (= int(f*255)/256 turns); the device op rotates by exactly f turns.
    # Compare at the equivalent quantized angle; residual error is the
    # uint8-HSV round-trip quantization (a few LSBs).
    for f in (-0.05, 0.02, 0.05):
        h, s, v = pil.convert("HSV").split()
        h = h.point(lambda px, d=int(f * 255): (px + d) % 256)
        want = np.asarray(Image.merge("HSV", (h, s, v)).convert("RGB"), np.float32)
        f_eq = int(f * 255) / 256.0
        got = np.asarray(dt.adjust_hue(x, jnp.full((1, 1, 1), f_eq)))[0]
        err = np.abs(got - want)
        assert err.max() <= 10.0, f"hue {f}: {err.max()}"  # saturated-pixel LSBs
        assert np.percentile(err, 99) <= 5.5, f"hue {f}"
        assert err.mean() <= 1.0, f"hue {f}"


def test_color_jitter_affine_composition_matches_sequential():
    """The composed prefix/hue/suffix pipeline equals naive sequential op
    application (on non-saturating images, where per-op clipping is inert)."""
    from istnet_tpu.data import device_transforms as dt

    rng = np.random.RandomState(3)
    # keep pixels in [40, 200] so no op saturates (factors <= 1.2)
    img = jnp.asarray(40 + rng.rand(5, 16, 16, 3).astype(np.float32) * 160)
    key = jax.random.PRNGKey(11)
    got = np.asarray(dt.color_jitter_batch(img, key))

    # reproduce the exact factor/order draws
    b = img.shape[0]
    k_f, k_o = jax.random.split(key)
    kb, kc, ks, kh = jax.random.split(k_f, 4)
    f_b = np.asarray(jax.random.uniform(kb, (b,), minval=0.8, maxval=1.2))
    f_c = np.asarray(jax.random.uniform(kc, (b,), minval=0.8, maxval=1.2))
    f_s = np.asarray(jax.random.uniform(ks, (b,), minval=0.8, maxval=1.2))
    f_h = np.asarray(jax.random.uniform(kh, (b,), minval=-0.05, maxval=0.05))
    order_id = np.asarray(jax.random.randint(k_o, (b,), 0, len(dt._ORDERS)))

    for i in range(b):
        x = img[i:i + 1]
        for op in dt._ORDERS[order_id[i]]:
            if op == 0:
                x = dt.adjust_brightness(x, jnp.full((1, 1, 1, 1), f_b[i]))
            elif op == 1:
                x = dt.adjust_contrast(x, jnp.full((1, 1, 1, 1), f_c[i]))
            elif op == 2:
                x = dt.adjust_saturation(x, jnp.full((1, 1, 1, 1), f_s[i]))
            else:
                x = dt.adjust_hue(x, jnp.full((1, 1, 1), f_h[i]))
        np.testing.assert_allclose(got[i], np.asarray(x[0]), atol=0.05,
                                   err_msg=f"sample {i} order {dt._ORDERS[order_id[i]]}")


def test_device_color_jitter_batch_variety():
    from istnet_tpu.data.device_transforms import color_jitter_batch

    rng = np.random.RandomState(0)
    img = jnp.asarray((rng.rand(4, 16, 16, 3) * 255).astype(np.float32))
    out = jax.jit(color_jitter_batch)(img, jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    # each sample got a different jitter
    deltas = [np.abs(out[i] - np.asarray(img[i])).mean() for i in range(4)]
    assert len({round(d, 3) for d in deltas}) == 4
    # identity factors => identity transform
    from istnet_tpu.data.device_transforms import (adjust_contrast,
                                                   adjust_saturation)
    ident = np.asarray(adjust_contrast(img, jnp.ones((4, 1, 1, 1))))
    np.testing.assert_allclose(ident, np.asarray(img), atol=1e-3)
    ident = np.asarray(adjust_saturation(img, jnp.ones((4, 1, 1, 1))))
    np.testing.assert_allclose(ident, np.asarray(img), atol=1e-3)

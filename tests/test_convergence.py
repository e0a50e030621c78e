"""Synthetic-data convergence in PRODUCTION precision (bf16).

The accuracy-parity insurance available in this image (VERDICT r4 item 1):
real NOCS data cannot be downloaded here, so the remaining risk after the
f64 forward/gradient/optimizer-trajectory parity tests is a *silent
bf16/schedule/BN-EMA bug* that only shows up over many real update steps.
This test drives the FULL two-phase recipe (reference ``train.py:63-191``,
``README.md:87-111``) for a few hundred bf16 steps on a synthetic NOCS tree
and asserts the losses actually DESCEND below calibrated thresholds:

- phase 1 (PoseNetGT, ``posenet_gt.py:53-67`` loss): PoseDis falls;
- transplant: phase-1 ``pts_gt_extractor`` -> ``world_enhancer.extractor``
  (params AND BN stats, ``train.py:106-114``), frozen;
- phase 2 (IST-Net, gamma2=100 freeze config): total, pose and qo parts fall.

Thresholds are calibrated from healthy runs (see the assert messages) with
~2x headroom — a schedule off-by-one (LR stuck at base 1e-5), a bf16
accumulation bug, or a broken BN EMA each push the final-window losses far
above them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istnet_tpu.data import DataLoader, TrainingDataset
from istnet_tpu.utils.config import Config

pytestmark = pytest.mark.slow

IMG, NPTS = 48, 128
SA_NPOINTS = (32, 16, 8, 8)
BATCH = 4


@pytest.fixture(scope="module")
def batches(tmp_path_factory):
    """A fixed cycle of REAL TrainingDataset batches off a synthetic tree."""
    from istnet_tpu.data.synthetic import build_train_trees

    data_dir = str(tmp_path_factory.mktemp("nocs_conv") / "data")
    build_train_trees(data_dir)
    cfg = Config({"img_size": IMG, "sample_num": NPTS, "shift_range": 0.01,
                  "use_shape_aug": False})
    ds = TrainingDataset(cfg, data_dir, data_type="real_withLabel",
                         num_img_per_epoch=BATCH * 4, seed=0)
    ds.reset()
    loader = DataLoader(ds, batch_size=BATCH, num_workers=2, seed=0)
    out = []
    for b in loader:
        inputs = {k: jnp.asarray(b[k]) for k in
                  ("rgb", "pts", "choose", "category_label", "qo")}
        labels = {k: jnp.asarray(b[k]) for k in
                  ("rotation_label", "translation_label", "size_label", "qo")}
        out.append({"inputs": inputs, "labels": labels})
    assert len(out) >= 2
    return out


def _train(model, loss_fn, batches, n_steps, frozen_prefix=None,
           init_params=None, init_stats=None):
    """Run n_steps of the production train step (bf16 policy) and return
    (per-step parts, final state)."""
    from istnet_tpu.train.train_state import (create_train_state,
                                              make_optimizer, make_train_step)

    cfg = Config({
        # the production optimizer recipe at the reference's LR band,
        # compressed: step_size_up = 1 * n_steps // 6 so the triangular
        # cyclic LR actually sweeps 1e-5 -> 1e-3 -> ... within the run
        "optimizer": {"name": "Adam", "lr": 1e-4, "weight_decay": 0.0},
        "max_epoch": 1,
        "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": max(n_steps // 4, 1),
               "bnm_clip": 0.01},
    })
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batches[0]["inputs"], train=True)
    params = init_params or variables["params"]
    stats = init_stats or variables["batch_stats"]
    tx, _ = make_optimizer(cfg, n_steps, params, frozen_prefix=frozen_prefix)
    step = jax.jit(make_train_step(model, loss_fn, tx, cfg.bn))
    state = create_train_state(params, stats, tx)
    history = []
    rng = jax.random.PRNGKey(7)
    for k in range(n_steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batches[k % len(batches)], sub)
        history.append(metrics)
    history = [{k: float(v) for k, v in m.items()} for m in history]
    assert all(np.isfinite(m["loss"]) for m in history)
    return history, state


def _window(history, key, lo, hi):
    return float(np.mean([m[key] for m in history[lo:hi]]))


def test_two_phase_bf16_convergence(batches):
    """Both phases of the recipe, in production bf16, loss descending."""
    from istnet_tpu.models import posenet_gt as pg
    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.nn import precision

    precision.set_compute_dtype(jnp.bfloat16)
    try:
        # ---- phase 1: PoseNetGT -----------------------------------------
        n1 = 180
        h1, s1 = _train(pg.PoseNetGT(nclass=6, sa_npoints=SA_NPOINTS),
                        lambda e, l: pg.supervised_loss(e, l),
                        batches, n1)
        first1 = _window(h1, "loss", 0, 20)
        last1 = _window(h1, "loss", -30, None)
        # calibrated: healthy ~ first 4.6 -> last 0.66 (ratio 0.14)
        assert last1 < 0.5 * first1, (h1[0], h1[-1])
        assert last1 < 1.6, f"phase-1 PoseDis stuck at {last1:.3f}"

        # ---- transplant + freeze (train.py:106-118) ---------------------
        p1 = jax.device_get(s1.params)
        b1 = jax.device_get(s1.batch_stats)

        # ---- phase 2: IST-Net, frozen world enhancer --------------------
        n2 = 220
        model2 = ISTNet(nclass=6, sa_npoints=SA_NPOINTS,
                        freeze_world_enhancer=True)
        variables2 = jax.jit(model2.init, static_argnames="train")(
            {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            batches[0]["inputs"], train=True)
        params2 = dict(variables2["params"])
        we = dict(params2["world_enhancer"])
        we["extractor"] = p1["pts_gt_extractor"]
        params2["world_enhancer"] = we
        stats2 = dict(variables2["batch_stats"])
        wes = dict(stats2["world_enhancer"])
        wes["extractor"] = b1["pts_gt_extractor"]
        stats2["world_enhancer"] = wes

        h2, _ = _train(model2,
                       lambda e, l: supervised_loss(
                           e, l, gamma1=1.0, gamma2=100.0,
                           freeze_world_enhancer=True),
                       batches, n2, frozen_prefix="world_enhancer",
                       init_params=params2, init_stats=stats2)
        first2 = _window(h2, "total", 0, 20)
        last2 = _window(h2, "total", -30, None)
        assert last2 < 0.5 * first2, (h2[0], h2[-1])
        # per-part floors, calibrated with ~2x headroom over healthy runs
        assert _window(h2, "pose", -30, None) < 1.6, h2[-1]
        assert _window(h2, "qo", -30, None) < 0.30, h2[-1]
    finally:
        precision.set_compute_dtype(jnp.float32)

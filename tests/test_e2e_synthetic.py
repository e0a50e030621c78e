"""End-to-end on a synthetic on-disk NOCS-format dataset.

Synthesizes the reference's exact file formats (color/depth/mask PNGs,
_label.pkl, obj_models pkl, segmentation result pkls), then drives:

  TrainingDataset -> DataLoader -> real jitted train step (loss decreases
  finite), and TestDataset -> test_func -> result pkls -> evaluate().

This is the pipeline the real NOCS data flows through; only pixels differ.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from istnet_tpu.data import DataLoader, TestDataset, TrainingDataset
from istnet_tpu.data.synthetic import write_scene as _write_scene
from istnet_tpu.utils.config import Config

IMG_SIZE = 48
N_PTS = 128


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nocs")
    data_dir = root / "data"

    # -- Real train ---------------------------------------------------------
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

    # -- Real test + segmentation results ------------------------------------
    test_dir = data_dir / "data" / "Real" / "test" / "scene_1"
    seg_dir = data_dir / "data" / "segmentation_results" / "test_trainedwithMask"
    os.makedirs(seg_dir, exist_ok=True)
    for i, stem in enumerate(stems):
        gts = _write_scene(str(test_dir), stem, seed=10 + i, coord=True)
        n = len(gts["class_ids"])
        pred_masks = np.zeros((480, 640, n), np.uint8)
        for j, (y0, x0, y1, x1) in enumerate(gts["bboxes"]):
            pred_masks[y0:y1, x0:x1, j] = 1
        rts = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        rts[:, :3, 3] = gts["translations"]
        result = {
            "image_path": f"data/real/test/scene_1/{stem}",
            "pred_masks": pred_masks,
            "pred_class_ids": np.asarray(gts["class_ids"]),
            "pred_bboxes": gts["bboxes"],
            "pred_scores": np.ones(n, np.float32),
            "gt_class_ids": np.asarray(gts["class_ids"]),
            "gt_bboxes": gts["bboxes"],
            "gt_RTs": rts,
            "gt_scales": np.tile(np.asarray([0.1, 0.2, 0.1], np.float32), (n, 1)),
            "gt_handle_visibility": np.ones(n, np.int64),
        }
        with open(seg_dir / f"results_test_scene_1_{stem}.pkl", "wb") as f:
            pickle.dump(result, f)
    return str(data_dir)


def _cfg():
    return Config({"img_size": IMG_SIZE, "sample_num": N_PTS, "shift_range": 0.01,
                   "use_shape_aug": True, "aug_bb_pro": 0.3, "aug_rt_pro": 0.3,
                   "aug_bc_pro": 0.0, "aug_pc_pro": 0.0, "aug_pc_r": 0.002,
                   "aug_nl_pro": 0.0})


def test_training_dataset_and_step(synthetic_root):
    ds = TrainingDataset(_cfg(), synthetic_root, data_type="real_withLabel",
                         num_img_per_epoch=4, seed=0)
    ds.reset()
    sample = ds[0]
    assert sample["pts"].shape == (N_PTS, 3)
    assert sample["rgb"].shape == (IMG_SIZE, IMG_SIZE, 3)
    assert sample["qo"].shape == (N_PTS, 3)
    assert 0 <= int(sample["choose"].max()) < IMG_SIZE * IMG_SIZE
    assert np.isfinite(sample["pts"]).all() and np.isfinite(sample["qo"]).all()

    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    batch = batches[0]
    assert batch["pts"].shape == (2, N_PTS, 3)

    # one real train step over the loaded batch
    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.train.train_state import (create_train_state, make_optimizer,
                                              make_train_step)

    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    inputs = {k: jnp.asarray(batch[k]) for k in
              ("rgb", "pts", "choose", "category_label", "qo")}
    labels = {k: jnp.asarray(batch[k]) for k in
              ("rotation_label", "translation_label", "size_label", "qo")}
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, train=True)
    cfg = Config({"optimizer": {"name": "Adam", "lr": 0.01, "betas": [0.5, 0.999],
                                "eps": 1e-6, "weight_decay": 0},
                  "max_epoch": 1,
                  "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": 4000,
                         "bnm_clip": 0.01}})
    tx, _ = make_optimizer(cfg, 4000, variables["params"])
    step = jax.jit(make_train_step(
        model, lambda e, l: supervised_loss(e, l, 1.0, 10.0, False), tx, cfg.bn))
    state = create_train_state(variables["params"], variables["batch_stats"], tx)
    state, metrics = step(state, {"inputs": inputs, "labels": labels},
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_test_dataset_and_full_eval(synthetic_root, tmp_path):
    from istnet_tpu.eval.nocs_map import evaluate
    from istnet_tpu.eval.test_loop import test_func
    from istnet_tpu.models.ist_net import ISTNet

    cfg = _cfg()
    ds = TestDataset(cfg, synthetic_root)
    assert len(ds) == 2
    data = ds[0]
    assert not data["empty"]
    assert data["pts"].shape[1:] == (N_PTS, 3)
    assert data["nocs"].shape == data["pts"].shape

    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    dummy = {
        "rgb": jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
        "pts": jnp.zeros((1, N_PTS, 3)),
        "choose": jnp.zeros((1, N_PTS), jnp.int32),
        "category_label": jnp.zeros((1,), jnp.int32),
        "qo": jnp.zeros((1, N_PTS, 3)),
    }
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    eval_vars = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    @jax.jit
    def forward(inputs):
        return model.apply(eval_vars, inputs, train=False)

    save = str(tmp_path / "results")
    test_func(forward, ds, save, progress=False, max_bucket=4)

    pkls = sorted(os.listdir(save))
    assert len(pkls) == 2
    with open(os.path.join(save, pkls[0]), "rb") as f:
        result = pickle.load(f)
    assert result["pred_RTs"].shape[1:] == (4, 4)
    # normalized sizes: unit norm
    np.testing.assert_allclose(np.linalg.norm(result["pred_scales"], axis=1), 1.0,
                               rtol=1e-5)

    iou_aps, pose_aps = evaluate(save, plot_figure=False)
    assert np.isfinite(iou_aps).all() and np.isfinite(pose_aps).all()


from istnet_tpu.data.synthetic import write_seg_result as _write_seg_result


def test_missing_depth_self_heals_to_empty_result(tmp_path):
    """A corrupt/missing depth PNG must yield an empty-prediction result, not
    a crash (round-1 finding: dataset.py device path threw AttributeError)."""
    data_dir = tmp_path / "data"
    test_dir = data_dir / "data" / "Real" / "test" / "scene_1"
    seg_dir = data_dir / "data" / "segmentation_results" / "test_trainedwithMask"
    gts = _write_scene(str(test_dir), "0000", seed=3, coord=True)
    _write_seg_result(str(seg_dir), gts, "0000")
    os.remove(str(test_dir / "0000_depth.png"))

    cfg = _cfg()
    for device_preprocess in (False, True):
        ds = TestDataset(cfg, str(data_dir), device_preprocess=device_preprocess)
        data = ds[0]
        assert data["empty"]
        assert "masks" not in data and "pts" not in data

    # and the device loop writes a valid zero-pred pkl for it
    from istnet_tpu.eval.test_loop import test_func_device

    ds = TestDataset(cfg, str(data_dir), device_preprocess=True)
    save = str(tmp_path / "res")
    test_func_device(lambda *a: (_ for _ in ()).throw(AssertionError("no fwd")),
                     ds, save, progress=False)
    with open(os.path.join(save, os.listdir(save)[0]), "rb") as f:
        result = pickle.load(f)
    assert result["pred_RTs"].shape == (0, 4, 4)
    assert len(result["pred_class_ids"]) == 0
    assert len(result["gt_class_ids"]) == 2


def test_batched_eval_matches_per_image(synthetic_root, tmp_path):
    """Cross-image batched inference writes the same results as the
    per-image bucketed loop (one compiled shape, full device batches)."""
    from istnet_tpu.eval.test_loop import test_func, test_func_batched
    from istnet_tpu.models.ist_net import ISTNet

    cfg = _cfg()
    ds = TestDataset(cfg, synthetic_root)
    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    dummy = {"rgb": jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
             "pts": jnp.zeros((1, N_PTS, 3)),
             "choose": jnp.zeros((1, N_PTS), jnp.int32),
             "category_label": jnp.zeros((1,), jnp.int32),
             "qo": jnp.zeros((1, N_PTS, 3))}
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    @jax.jit
    def forward(inputs):
        return model.apply(ev, inputs, train=False)

    save_a = str(tmp_path / "per_image")
    save_b = str(tmp_path / "batched")
    test_func(forward, ds, save_a, progress=False, max_bucket=4)
    # batch 3 < total instances (4): forces an image to span two flushes
    test_func_batched(forward, ds, save_b, progress=False, batch_size=3)

    pkls = sorted(os.listdir(save_a))
    assert sorted(os.listdir(save_b)) == pkls and len(pkls) == 2
    for name in pkls:
        with open(os.path.join(save_a, name), "rb") as f:
            a = pickle.load(f)
        with open(os.path.join(save_b, name), "rb") as f:
            b = pickle.load(f)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float64), np.asarray(b[k], np.float64),
                rtol=2e-4, atol=2e-5, err_msg=f"{name}:{k}")


def test_batched_eval_dp_over_mesh(synthetic_root, tmp_path):
    """DP-sharded eval forward (instance batch over a 4-device mesh) writes
    the same results as the single-device per-image loop — the serving path
    behind ``cli.test --devices N`` (reference counterpart: the DataParallel
    wrap in ``test.py:91-92``)."""
    from istnet_tpu.eval.test_loop import test_func, test_func_batched
    from istnet_tpu.models.ist_net import ISTNet
    from istnet_tpu.parallel import mesh as pmesh

    cfg = _cfg()
    ds = TestDataset(cfg, synthetic_root)
    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    dummy = {"rgb": jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
             "pts": jnp.zeros((1, N_PTS, 3)),
             "choose": jnp.zeros((1, N_PTS), jnp.int32),
             "category_label": jnp.zeros((1,), jnp.int32),
             "qo": jnp.zeros((1, N_PTS, 3))}
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    m = pmesh.make_mesh(4)
    dp_forward = pmesh.jit_eval_forward_dp(
        lambda v, inp: model.apply(v, inp, train=False), ev, m)

    @jax.jit
    def forward(inputs):
        return model.apply(ev, inputs, train=False)

    save_a = str(tmp_path / "single")
    save_b = str(tmp_path / "dp")
    test_func(forward, ds, save_a, progress=False, max_bucket=4)
    # 2 images x 2 instances -> one full batch of 4, sharded 1/device
    test_func_batched(dp_forward, ds, save_b, progress=False, batch_size=4)

    pkls = sorted(os.listdir(save_a))
    assert sorted(os.listdir(save_b)) == pkls and len(pkls) == 2
    for name in pkls:
        with open(os.path.join(save_a, name), "rb") as f:
            a = pickle.load(f)
        with open(os.path.join(save_b, name), "rb") as f:
            b = pickle.load(f)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float64), np.asarray(b[k], np.float64),
                rtol=2e-4, atol=2e-5, err_msg=f"{name}:{k}")


def test_device_preprocess_test_path(synthetic_root, tmp_path):
    """The fully-device test pipeline produces valid result pkls + metrics."""
    from istnet_tpu.data.dataset import REAL_INTRINSICS
    from istnet_tpu.eval.nocs_map import evaluate
    from istnet_tpu.eval.test_loop import make_device_forward, test_func_device
    from istnet_tpu.models.ist_net import ISTNet

    cfg = _cfg()
    ds = TestDataset(cfg, synthetic_root, device_preprocess=True)
    data = ds[0]
    assert data["raw"] and data["masks"].dtype == bool
    assert data["depth_raw"].shape == (480, 640)

    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    dummy = {
        "rgb": jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
        "pts": jnp.zeros((1, N_PTS, 3)),
        "choose": jnp.zeros((1, N_PTS), jnp.int32),
        "category_label": jnp.zeros((1,), jnp.int32),
        "qo": jnp.zeros((1, N_PTS, 3)),
    }
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    dfwd = make_device_forward(model, ev, REAL_INTRINSICS,
                               img_size=IMG_SIZE, sample_num=N_PTS)
    save = str(tmp_path / "results_dev")
    test_func_device(dfwd, ds, save, progress=False, max_bucket=4)

    pkls = sorted(os.listdir(save))
    assert len(pkls) == 2
    with open(os.path.join(save, pkls[0]), "rb") as f:
        result = pickle.load(f)
    assert result["pred_RTs"].shape[0] == len(result["pred_class_ids"])
    assert result["pred_RTs"].shape[0] > 0  # instances survived the >16 check
    assert np.isfinite(result["pred_RTs"]).all()
    iou_aps, pose_aps = evaluate(save, plot_figure=False)
    assert np.isfinite(iou_aps).all() and np.isfinite(pose_aps).all()


def test_device_batched_matches_device_per_image(synthetic_root, tmp_path):
    """test_func_device_batched (device preprocessing + cross-image instance
    batching through the device compaction buffer) writes the same result
    structure as the per-image device path: same files, same kept instances
    (the on-device > min_points decision), finite poses. Pose values differ
    only through the per-instance sampling PRNG stream."""
    from istnet_tpu.data.dataset import REAL_INTRINSICS
    from istnet_tpu.eval.nocs_map import evaluate
    from istnet_tpu.eval.test_loop import (make_device_forward,
                                           test_func_device,
                                           test_func_device_batched)
    from istnet_tpu.models.ist_net import ISTNet

    cfg = _cfg()
    ds = TestDataset(cfg, synthetic_root, device_preprocess=True)
    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    dummy = {
        "rgb": jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
        "pts": jnp.zeros((1, N_PTS, 3)),
        "choose": jnp.zeros((1, N_PTS), jnp.int32),
        "category_label": jnp.zeros((1,), jnp.int32),
        "qo": jnp.zeros((1, N_PTS, 3)),
    }
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    save_a = str(tmp_path / "results_per_image")
    dfwd = make_device_forward(model, ev, REAL_INTRINSICS,
                               img_size=IMG_SIZE, sample_num=N_PTS)
    test_func_device(dfwd, ds, save_a, progress=False, max_bucket=4)

    # batch 3 with kb=2: flushes straddle image boundaries AND a remainder
    # partial batch both occur on the 2-image tree
    save_b = str(tmp_path / "results_batched")
    test_func_device_batched(model, ev, ds, save_b, REAL_INTRINSICS,
                             img_size=IMG_SIZE, sample_num=N_PTS,
                             batch_size=3, kb=2, lag=2, progress=False)

    pkls = sorted(os.listdir(save_a))
    assert sorted(os.listdir(save_b)) == pkls and len(pkls) == 2
    for name in pkls:
        with open(os.path.join(save_a, name), "rb") as f:
            a = pickle.load(f)
        with open(os.path.join(save_b, name), "rb") as f:
            b = pickle.load(f)
        np.testing.assert_array_equal(a["pred_class_ids"], b["pred_class_ids"])
        assert a["pred_RTs"].shape == b["pred_RTs"].shape
        assert np.isfinite(b["pred_RTs"]).all()
        np.testing.assert_array_equal(a["gt_RTs"], b["gt_RTs"])
    iou_aps, pose_aps = evaluate(save_b, plot_figure=False)
    assert np.isfinite(iou_aps).all() and np.isfinite(pose_aps).all()


def test_device_batched_over_mesh(synthetic_root, tmp_path):
    """The composed device pipeline runs DP over a 1-D mesh (buffer rows +
    model forward sharded over 8 virtual devices): same files and kept
    instances as the single-device batched path."""
    from istnet_tpu.data.dataset import REAL_INTRINSICS
    from istnet_tpu.eval.test_loop import test_func_device_batched
    from istnet_tpu.models.ist_net import ISTNet
    from istnet_tpu.parallel import mesh as pmesh

    cfg = _cfg()
    ds = TestDataset(cfg, synthetic_root, device_preprocess=True)
    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    dummy = {
        "rgb": jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)),
        "pts": jnp.zeros((1, N_PTS, 3)),
        "choose": jnp.zeros((1, N_PTS), jnp.int32),
        "category_label": jnp.zeros((1,), jnp.int32),
        "qo": jnp.zeros((1, N_PTS, 3)),
    }
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    save_1 = str(tmp_path / "res_b1")
    test_func_device_batched(model, ev, ds, save_1, REAL_INTRINSICS,
                             img_size=IMG_SIZE, sample_num=N_PTS,
                             batch_size=8, kb=2, progress=False)
    save_m = str(tmp_path / "res_mesh")
    test_func_device_batched(model, ev, ds, save_m, REAL_INTRINSICS,
                             img_size=IMG_SIZE, sample_num=N_PTS,
                             batch_size=8, kb=2, progress=False,
                             mesh=pmesh.make_mesh(8))
    pkls = sorted(os.listdir(save_1))
    assert sorted(os.listdir(save_m)) == pkls and len(pkls) == 2
    for name in pkls:
        with open(os.path.join(save_1, name), "rb") as f:
            a = pickle.load(f)
        with open(os.path.join(save_m, name), "rb") as f:
            b = pickle.load(f)
        np.testing.assert_array_equal(a["pred_class_ids"], b["pred_class_ids"])
        assert a["pred_RTs"].shape == b["pred_RTs"].shape
        assert np.isfinite(b["pred_RTs"]).all()

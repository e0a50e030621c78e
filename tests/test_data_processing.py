"""Offline data-prep golden test: cli/data_processing.py vs the REFERENCE's
own data_processing.py, head-to-head on the same synthetic raw NOCS tree.

The reference script is torch-free (numpy/cv2 only) and executable in this
image, so the `_label.pkl` contract — which every training run consumes —
can be pinned directly against it (VERDICT r3 item 3: this was the one
never-executed subsystem). Two identical tree copies are annotated, one by
each implementation, and every produced artifact is compared field-by-field:

- image lists (exact text), including which images the filters DROPPED
  (bad render, missing files) and which instances were skipped (<64 depth
  px, the bad CAMERA mug, cls-0 / absent-instance meta lines);
- Real-train labels: cv2.solvePnP sees bit-identical inputs -> poses match
  to f64 round-off;
- CAMERA-train labels: both RANSACs (reference sequential, ours batched
  on-device) converge to the all-inlier full-set Umeyama refit on the
  geometrically-consistent tree -> compared at f32-vs-f64 tolerance;
- test labels: deterministic handle-visibility copy / sRT decomposition ->
  tight tolerance.
"""

import os
import pickle
import shutil
import sys

import numpy as np
import pytest

REF = "/root/reference"

needs_reference = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "data_processing.py")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def trees(tmp_path_factory):
    from istnet_tpu.data.synthetic import build_raw_prep_tree

    base = tmp_path_factory.mktemp("prep")
    ours = base / "ours"
    build_raw_prep_tree(str(ours))
    ref = base / "ref"
    shutil.copytree(ours, ref)
    return str(ours), str(ref)


@pytest.fixture(scope="module")
def annotated(trees):
    """Run BOTH implementations end-to-end once; tests assert on the files."""
    ours_root, ref_root = trees

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import data_processing as ref_dp  # the reference's own script

    ref_dp.OBJ_MODEL_DIR = os.path.join(ref_root, "obj_models")
    np.random.seed(0)  # the reference RANSAC samples from the global RNG
    ref_dp.create_img_list(ref_root)
    ref_dp.annotate_camera_train(ref_root)
    ref_dp.annotate_real_train(ref_root)
    ref_dp.annotate_test_data(ref_root)

    from istnet_tpu.cli import data_processing as our_dp

    our_dp.create_img_list(ours_root)
    our_dp.annotate_camera_train(ours_root)
    our_dp.annotate_real_train(ours_root)
    our_dp.annotate_test_data(ours_root)
    return ours_root, ref_root


def _read(path):
    with open(path) as f:
        return f.read()


def _load_pkl(path):
    with open(path, "rb") as f:
        return pickle.load(f)


@needs_reference
def test_img_lists_identical(annotated):
    ours, ref = annotated
    for rel in ("CAMERA/train_list_all.txt", "CAMERA/val_list_all.txt",
                "Real/train_list_all.txt", "Real/test_list_all.txt",
                "CAMERA/train_list.txt", "Real/train_list.txt",
                "CAMERA/val_list.txt", "Real/test_list.txt"):
        assert _read(os.path.join(ours, rel)) == _read(os.path.join(ref, rel)), rel


@needs_reference
def test_filters_drop_the_right_images(annotated):
    """The valid CAMERA list keeps 0000+0002 (bad render 0001 and missing
    0003..0009 dropped) — pins that BOTH implementations apply the filters."""
    ours, _ = annotated
    kept = _read(os.path.join(ours, "CAMERA/train_list.txt")).split()
    assert kept == ["train/00000/0000", "train/00000/0002"]


def _compare_label(ours_path, ref_path, ransac_fields=(), pnp=False):
    a, b = _load_pkl(ours_path), _load_pkl(ref_path)
    assert set(a) == set(b), (ours_path, set(a) ^ set(b))
    for key in b:
        av, bv = a[key], b[key]
        if key in ("class_ids", "instance_ids", "model_list"):
            assert type(av) is type(bv), key
            if isinstance(bv, np.ndarray):
                np.testing.assert_array_equal(av, bv, err_msg=key)
            else:
                assert av == bv, key
        elif key in ("bboxes", "handle_visibility"):
            assert av.dtype == bv.dtype, key
            np.testing.assert_array_equal(av, bv, err_msg=key)
        elif key in ransac_fields:
            # reference RANSAC runs f64 on host, ours f32 batched on device;
            # on the all-inlier synthetic tree both refit over the full set
            np.testing.assert_allclose(av, bv, rtol=2e-3, atol=2e-3,
                                       err_msg=f"{key} ({ours_path})")
        elif pnp and key in ("scales", "rotations", "translations"):
            # identical float64 inputs into cv2.solvePnP -> round-off only
            np.testing.assert_allclose(av, bv, rtol=1e-9, atol=1e-9,
                                       err_msg=key)
        else:
            assert av.dtype == bv.dtype, key
            np.testing.assert_allclose(av, bv, rtol=1e-6, atol=1e-7,
                                       err_msg=f"{key} ({ours_path})")


@needs_reference
def test_camera_train_labels(annotated):
    ours, ref = annotated
    for stem in ("0000", "0002"):
        rel = f"CAMERA/train/00000/{stem}_label.pkl"
        _compare_label(os.path.join(ours, rel), os.path.join(ref, rel),
                       ransac_fields=("scales", "rotations", "translations"))
    # pin the in-image instance filtering on 0000: bad mug + cls-0 +
    # absent-instance meta lines dropped, the two real instances kept
    gts = _load_pkl(os.path.join(ours, "CAMERA/train/00000/0000_label.pkl"))
    assert gts["instance_ids"] == [1, 2]
    assert gts["class_ids"] == [1, 2]
    assert gts["model_list"] == ["modelA", "modelB"]
    # and the rotations are genuine rotations (RANSAC recovered a real pose)
    for r in gts["rotations"]:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(r) > 0.9


@needs_reference
def test_real_train_labels_pnp_exact(annotated):
    ours, ref = annotated
    for stem in ("0000", "0001"):
        rel = f"Real/train/scene_1/{stem}_label.pkl"
        _compare_label(os.path.join(ours, rel), os.path.join(ref, rel),
                       pnp=True)


@needs_reference
def test_test_annotation_labels(annotated):
    ours, ref = annotated
    for rel in ("Real/test/scene_1/0000_label.pkl",
                "CAMERA/val/00000/0000_label.pkl"):
        _compare_label(os.path.join(ours, rel), os.path.join(ref, rel))
    # handle visibility was copied through the bbox match (incl. the leading
    # distractor in the val result pkl and the 0-visibility mug)
    gts = _load_pkl(os.path.join(ours, "Real/test/scene_1/0000_label.pkl"))
    np.testing.assert_array_equal(gts["handle_visibility"], [0, 1])
    assert "poses" in gts and gts["poses"].shape == (2, 4, 4)


@needs_reference
def test_label_pkl_feeds_training_dataset(annotated):
    """The pkls our prep wrote satisfy the TrainingDataset contract end-to-end
    (the consumer the whole stage exists for, dataset.py:176-186)."""
    ours, _ = annotated
    from istnet_tpu.data.dataset import TrainingDataset
    from istnet_tpu.utils.config import Config

    cfg = Config({"img_size": 48, "sample_num": 64, "shift_range": 0.01,
                  "use_shape_aug": False})
    ds = TrainingDataset(cfg, ours, data_type="real_withLabel",
                         num_img_per_epoch=-1, use_fill_miss=False,
                         use_composed_img=False, seed=0)
    sample = ds[0]
    assert sample["pts"].shape == (64, 3)
    assert sample["rgb"].shape[-3:] == (48, 48, 3)
    assert np.isfinite(sample["qo"]).all()

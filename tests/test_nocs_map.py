"""NOCS mAP: vectorized implementation vs a literal loop-based golden spec.

The golden functions below transcribe the algorithm of
``/root/reference/utils/evaluation_utils.py`` (greedy match order, strict
inequalities, symmetry sweeps) as plain loops, independent of the vectorized
production code in ``istnet_tpu.eval.nocs_map``.
"""

import math

import numpy as np
import pytest

from istnet_tpu.eval import nocs_map as nm


# ---------------------------------------------------------------------------
# golden (slow) spec
# ---------------------------------------------------------------------------

def golden_iou_single(rt1, rt2, s1, s2, symmetric):
    def aabb_iou(rt_a, rt_b):
        def bounds(rt, s):
            corners = np.array([[sx, sy, sz] for sx in (.5, -.5)
                                for sy in (.5, -.5) for sz in (.5, -.5)]) * s
            pts = (rt[:3, :3] @ corners.T + rt[:3, 3:4])
            return pts.min(1), pts.max(1)
        amin, amax = bounds(rt_a, s1)
        bmin, bmax = bounds(rt_b, s2)
        omin, omax = np.maximum(amin, bmin), np.minimum(amax, bmax)
        if np.amin(omax - omin) < 0:
            inter = 0.0
        else:
            inter = np.prod(omax - omin)
        union = np.prod(amax - amin) + np.prod(bmax - bmin) - inter
        return inter / union

    if not symmetric:
        return aabb_iou(rt1, rt2)
    best = 0.0
    for i in range(20):
        th = 2 * math.pi * i / 20
        rot = np.array([[math.cos(th), 0, math.sin(th), 0], [0, 1, 0, 0],
                        [-math.sin(th), 0, math.cos(th), 0], [0, 0, 0, 1]])
        best = max(best, aabb_iou(rt1 @ rot, rt2))
    return best


def golden_rt_error(rt1, rt2, y_sym):
    r1 = rt1[:3, :3] / np.cbrt(np.linalg.det(rt1[:3, :3]))
    r2 = rt2[:3, :3] / np.cbrt(np.linalg.det(rt2[:3, :3]))
    if y_sym:
        y1, y2 = r1 @ np.array([0, 1, 0.]), r2 @ np.array([0, 1, 0.])
        cos = y1.dot(y2) / (np.linalg.norm(y1) * np.linalg.norm(y2))
        theta = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    else:
        theta = np.degrees(np.arccos(np.clip(
            (np.trace(r1 @ r2.T) - 1) / 2, -1, 1)))
    shift = np.linalg.norm(rt1[:3, 3] - rt2[:3, 3]) * 100
    return theta, shift


def golden_match_iou(overlaps, thres_list):
    p, g = overlaps.shape
    gt_m = -np.ones((len(thres_list), g))
    pred_m = -np.ones((len(thres_list), p))
    for s, thres in enumerate(thres_list):
        for i in range(p):
            order = np.argsort(overlaps[i])[::-1]
            low = np.where(overlaps[i, order] < 0)[0]
            if low.size:
                order = order[:low[0]]
            for j in order:
                if gt_m[s, j] > -1:
                    continue
                if overlaps[i, j] < thres:
                    break
                if overlaps[i, j] > thres:
                    gt_m[s, j] = i
                    pred_m[s, i] = j
                    break
    return gt_m, pred_m


def golden_match_pose(errors, degree_list, shift_list):
    p, g = errors.shape[:2]
    gt_m = -np.ones((len(degree_list), len(shift_list), g))
    pred_m = -np.ones((len(degree_list), len(shift_list), p))
    for d, dt in enumerate(degree_list):
        for s, st in enumerate(shift_list):
            for i in range(p):
                for j in np.argsort(errors[i].sum(-1)):
                    if gt_m[d, s, j] > -1:
                        continue
                    if errors[i, j, 0] > dt or errors[i, j, 1] > st:
                        continue
                    gt_m[d, s, j] = i
                    pred_m[d, s, i] = j
                    break
    return gt_m, pred_m


def golden_ap(pred_match, pred_scores, n_gt):
    order = np.argsort(pred_scores)[::-1]
    pm = pred_match[order]
    precisions = np.cumsum(pm > -1) / (np.arange(len(pm)) + 1)
    recalls = np.cumsum(pm > -1).astype(np.float64) / n_gt
    precisions = np.concatenate([[0], precisions, [0]])
    recalls = np.concatenate([[0], recalls, [1]])
    for i in range(len(precisions) - 2, -1, -1):
        precisions[i] = max(precisions[i], precisions[i + 1])
    idx = np.where(recalls[:-1] != recalls[1:])[0] + 1
    return np.sum((recalls[idx] - recalls[idx - 1]) * precisions[idx])


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _random_rt(rng, scale=1.0):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    r = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
    rt = np.eye(4)
    rt[:3, :3] = r * scale
    rt[:3, 3] = rng.randn(3) * 0.3
    return rt


def _random_results(rng, n_images=6, max_inst=4):
    results = []
    for _ in range(n_images):
        n_gt = rng.randint(1, max_inst + 1)
        gt_rts = np.stack([_random_rt(rng, rng.uniform(0.1, 0.3)) for _ in range(n_gt)])
        gt_scales = rng.uniform(0.3, 1.0, (n_gt, 3))
        gt_cls = rng.randint(1, 7, n_gt)
        # predictions: noisy copies of gts + one spurious
        pred_rts, pred_scales, pred_cls, scores = [], [], [], []
        for k in range(n_gt):
            noisy = gt_rts[k].copy()
            noisy[:3, 3] += rng.randn(3) * 0.01
            pred_rts.append(noisy)
            pred_scales.append(gt_scales[k] * rng.uniform(0.9, 1.1))
            pred_cls.append(gt_cls[k])
            scores.append(rng.rand())
        pred_rts.append(_random_rt(rng, 0.2))
        pred_scales.append(rng.uniform(0.3, 1.0, 3))
        pred_cls.append(rng.randint(1, 7))
        scores.append(rng.rand())
        results.append({
            "gt_class_ids": gt_cls,
            "gt_RTs": gt_rts,
            "gt_scales": gt_scales,
            "gt_handle_visibility": rng.randint(0, 2, n_gt),
            "pred_class_ids": np.asarray(pred_cls),
            "pred_RTs": np.stack(pred_rts),
            "pred_scales": np.stack(pred_scales),
            "pred_scores": np.asarray(scores),
        })
    return results


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_iou_matrix_matches_golden():
    rng = np.random.RandomState(0)
    pred = np.stack([_random_rt(rng, 0.2) for _ in range(3)])
    gt = np.stack([_random_rt(rng, 0.2) for _ in range(2)])
    ps = rng.uniform(0.3, 1, (3, 3))
    gs = rng.uniform(0.3, 1, (2, 3))
    sym = np.array([True, False])
    got = nm.compute_3d_iou_matrix(pred, ps, gt, gs, sym)
    for i in range(3):
        for j in range(2):
            want = golden_iou_single(pred[i], gt[j], ps[i], gs[j], sym[j])
            np.testing.assert_allclose(got[i, j], want, rtol=1e-5, atol=1e-7)


def test_rt_errors_match_golden():
    rng = np.random.RandomState(1)
    pred = np.stack([_random_rt(rng, 0.25) for _ in range(3)])
    gt = np.stack([_random_rt(rng, 0.25) for _ in range(2)])
    sym = np.array([False, True])
    got = nm.compute_rt_errors(pred, gt, sym)
    for i in range(3):
        for j in range(2):
            th, sh = golden_rt_error(pred[i], gt[j], sym[j])
            np.testing.assert_allclose(got[i, j], [th, sh], rtol=1e-4, atol=1e-4)


def test_greedy_iou_match_matches_golden():
    rng = np.random.RandomState(2)
    overlaps = rng.rand(5, 4).astype(np.float32)
    overlaps[0, 0] = -1.0
    thres = np.asarray([0.1, 0.3, 0.5, 0.7])
    ggt, gpred = golden_match_iou(overlaps, thres)
    vgt, vpred = nm.greedy_match_iou(overlaps, thres)
    np.testing.assert_array_equal(ggt, vgt)
    np.testing.assert_array_equal(gpred, vpred)


def test_greedy_pose_match_matches_golden():
    rng = np.random.RandomState(3)
    errors = np.stack([rng.uniform(0, 30, (4, 3)), rng.uniform(0, 12, (4, 3))], -1)
    dl = np.asarray([5., 10., 360.])
    sl = np.asarray([2., 5., 100.])
    ggt, gpred = golden_match_pose(errors, dl, sl)
    vgt, vpred = nm.greedy_match_pose(errors, dl, sl)
    np.testing.assert_array_equal(ggt, vgt)
    np.testing.assert_array_equal(gpred, vpred)


def test_ap_matches_golden():
    rng = np.random.RandomState(4)
    pm = rng.randint(-1, 3, (7, 10)).astype(np.float64)
    sc = rng.rand(10)
    got = nm.ap_from_matches(pm, sc, n_gt=6)
    for t in range(7):
        np.testing.assert_allclose(got[t], golden_ap(pm[t], sc, 6), rtol=1e-9)


def test_perfect_predictions_give_ap_one():
    rng = np.random.RandomState(5)
    results = []
    for _ in range(4):
        rts = np.stack([_random_rt(rng, 0.2) for _ in range(2)])
        scales = rng.uniform(0.3, 1.0, (2, 3))
        cls = np.asarray([1, 3])
        results.append({
            "gt_class_ids": cls, "gt_RTs": rts, "gt_scales": scales,
            "gt_handle_visibility": np.ones(2),
            "pred_class_ids": cls, "pred_RTs": rts.copy(),
            "pred_scales": scales.copy(), "pred_scores": np.ones(2),
        })
    iou_aps, pose_aps = nm.compute_independent_map(
        results, nm.SYNSET_NAMES, degree_thresholds=[5, 10],
        shift_thresholds=[2, 5], iou_3d_thresholds=[0.25, 0.5, 0.75],
        iou_pose_thres=0.25, logger=None)
    assert np.isclose(iou_aps[1, 1], 1.0)  # bottle IoU50
    assert np.isclose(pose_aps[1, 0, 0], 1.0)  # bottle 5d2cm
    assert np.isclose(iou_aps[-1, 1], (1.0 + 1.0) / 6)  # mean over 6 classes


def test_full_map_pipeline_random_end_to_end():
    """Smoke: random noisy predictions produce sane, finite AP grids."""
    rng = np.random.RandomState(6)
    results = _random_results(rng)
    iou_aps, pose_aps = nm.compute_independent_map(
        results, nm.SYNSET_NAMES, degree_thresholds=[5, 10, 60],
        shift_thresholds=[2, 5, 10], iou_3d_thresholds=[0.1, 0.25, 0.5, 0.75],
        iou_pose_thres=0.1, logger=None)
    assert np.isfinite(iou_aps).all() and np.isfinite(pose_aps).all()
    assert (iou_aps >= 0).all() and (iou_aps <= 1).all()
    assert (pose_aps >= 0).all() and (pose_aps <= 1).all()
    # noisy-translation copies should be near-perfect at loose thresholds
    assert iou_aps[-1, 0] > 0.5


def test_combination_map_perfect_predictions():
    rng = np.random.RandomState(7)
    results = []
    for _ in range(3):
        rts = np.stack([_random_rt(rng, 0.2) for _ in range(2)])
        scales = rng.uniform(0.3, 1.0, (2, 3))
        cls = np.asarray([1, 3])
        results.append({
            "gt_class_ids": cls, "gt_RTs": rts, "gt_scales": scales,
            "gt_handle_visibility": np.ones(2),
            "pred_class_ids": cls, "pred_RTs": rts.copy(),
            "pred_scales": scales.copy(), "pred_scores": np.ones(2),
        })
    aps = nm.compute_combination_map(results, nm.SYNSET_NAMES,
                                     degree_thresholds=[5, 10],
                                     shift_thresholds=[0.1],
                                     iou_3d_thresholds=[0.25, 0.5])
    assert aps.shape == (8, 3, 2, 2)  # (BG + 6 classes + mean, D+1, S+1, I)
    assert np.isclose(aps[1, 0, 0, 1], 1.0)  # bottle @ 5deg/0.1rel/IoU50
    assert np.isclose(aps[-1, 0, 0, 1], 2.0 / 6)


def test_combination_break_semantics():
    """A high-IoU gt failing the rotation test must BLOCK later gts
    (reference break at evaluation_utils.py:325-327)."""
    overlaps = np.array([[0.9, 0.6]], np.float32)
    # first gt (by IoU): rotation error 50deg (fails 5deg); second would pass
    errors = np.array([[[50.0, 0.01], [1.0, 0.01]]], np.float32)
    gt_m, pred_m = nm.greedy_match_combination(
        overlaps, errors, np.asarray([5.0]), np.asarray([0.1]), np.asarray([0.25]))
    assert pred_m[0, 0, 0, 0] == -1  # blocked despite gt 1 passing


def test_matches_for_each_gt():
    rng = np.random.RandomState(9)
    gt_rts = np.stack([_random_rt(rng, 0.2) for _ in range(2)])
    gt_scales = rng.uniform(0.3, 1.0, (2, 3))
    pred_rts = np.concatenate([gt_rts.copy(), [_random_rt(rng, 0.2)]])
    pred_scales = np.concatenate([gt_scales.copy(), rng.uniform(0.3, 1, (1, 3))])
    gm, order = nm.compute_3d_matches_for_each_gt(
        [2, 5], gt_rts, gt_scales, np.ones(2),
        [2, 5, 5], pred_rts, pred_scales, np.array([0.9, 0.8, 0.7]))
    assert gm.shape == (2,)
    # each gt matched to its exact copy (same class, IoU 1)
    assert (gm >= 0).all()
    sorted_cls = np.asarray([2, 5, 5])[order]
    assert sorted_cls[gm[0]] == 2 and sorted_cls[gm[1]] == 5

"""Pose visualization (eval/vis.py) vs reference utils/vis_utils.py semantics."""

import os

import numpy as np

from istnet_tpu.eval.nocs_map import get_3d_bbox, transform_coordinates_3d
from istnet_tpu.eval.vis import (
    align_rotation,
    calculate_2d_projections,
    draw_axes_box,
    draw_bboxes,
    draw_detections,
    draw_text,
)

INTR = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]], np.float64)


def _srt(yaw=0.4, t=(0.05, -0.02, 1.2), s=1.0):
    c, si = np.cos(yaw), np.sin(yaw)
    srt = np.eye(4, dtype=np.float32)
    srt[:3, :3] = s * np.array([[c, 0, si], [0, 1, 0], [-si, 0, c]], np.float32)
    srt[:3, 3] = t
    return srt


def test_align_rotation_removes_y_rotation():
    """For a pure y-rotation sRT, alignment must give the identity rotation
    (scale and translation preserved) — vis_utils.py:140-160."""
    srt = _srt(yaw=0.7, s=1.3)
    aligned = align_rotation(srt)
    np.testing.assert_allclose(aligned[:3, :3], 1.3 * np.eye(3), atol=1e-5)
    np.testing.assert_allclose(aligned[:3, 3], srt[:3, 3], atol=1e-6)


def test_projection_roundtrip():
    pts = np.array([[0.0, 0.1, -0.1], [0.0, 0.05, 0.0], [1.0, 1.0, 1.0]])
    uv = calculate_2d_projections(pts, INTR)
    assert uv.shape == (3, 2) and uv.dtype == np.int32
    np.testing.assert_array_equal(uv[0], [int(319.5), int(239.5)])


def _boxes_and_axes():
    srt = _srt()
    bbox = get_3d_bbox(np.array([0.2, 0.3, 0.2]), 0)
    img_pts = calculate_2d_projections(transform_coordinates_3d(bbox, srt), INTR)
    axes = np.array([[0, 0, 0], [0.15, 0, 0], [0, 0.15, 0], [0, 0, 0.15]]).T
    axes_pts = calculate_2d_projections(transform_coordinates_3d(axes, srt), INTR)
    return img_pts, axes_pts


def test_draw_axes_box_colors_and_mutation():
    """Reference draw (vis_utils.py:73-100): ground 0.3x / pillars 0.6x /
    top full color at thickness 3, then BGR-coded xyz axes from the origin."""
    img_pts, axes_pts = _boxes_and_axes()
    img = np.zeros((480, 640, 3), np.uint8)
    out = draw_axes_box(img, img_pts, axes_pts, (0, 0, 255))
    colors = {tuple(c) for c in out.reshape(-1, 3) if c.any()}
    # full/pillar/ground reds + the three axis colors (x red coincides with
    # the full box color)
    assert (0, 0, 255) in colors          # top layer + x axis
    assert (0, 0, 153) in colors          # pillars (0.6 * 255)
    assert (0, 0, 76) in colors           # ground (0.3 * 255)
    assert (255, 0, 0) in colors          # z axis
    assert (0, 255, 0) in colors          # y axis
    # the y axis is drawn LAST: the origin pixel must be green
    oy, ox = axes_pts[0][1], axes_pts[0][0]
    assert tuple(out[oy, ox]) == (0, 255, 0)


def test_draw_bboxes_still_thickness2():
    img_pts, _ = _boxes_and_axes()
    img = np.zeros((480, 640, 3), np.uint8)
    out = draw_bboxes(img, img_pts, (0, 255, 0))
    assert out.any()


def test_draw_text_geometry():
    """The label box lands at the reference's exact margins
    (vis_utils.py:103-139) and clamps inside the 640x480 frame."""
    import cv2

    img = np.zeros((480, 640, 3), np.uint8)
    bbox = (100, 200, 150, 260)  # (y1, x1, y2, x2)
    out = draw_text(img, bbox, "laptop", draw_box=True)
    retval, _ = cv2.getTextSize("laptop", cv2.FONT_HERSHEY_TRIPLEX, 1, 1)
    tl = (bbox[1] + 10, bbox[2] + 10)
    br = (tl[0] + retval[0] + 20, tl[1] + retval[1] + 20)
    # filled red label box with black outline
    assert tuple(out[tl[1] + 2, tl[0] + 2]) == (255, 0, 0)
    assert tuple(out[tl[1], tl[0]]) == (0, 0, 0)
    # white glyph pixels inside the box
    inner = out[tl[1]:br[1], tl[0]:br[0]]
    assert (inner == 255).all(axis=-1).any()
    # detection rectangle drawn when draw_box=True
    assert tuple(out[bbox[0], (bbox[1] + bbox[3]) // 2]) == (255, 0, 0)


def test_draw_text_clamps_to_frame():
    img = np.zeros((480, 640, 3), np.uint8)
    out = draw_text(img, (460, 620, 478, 639), "very long label text")
    assert out.any()  # fully inside, no exception despite corner bbox


def test_draw_detections_writes_png(tmp_path):
    img = np.zeros((480, 640, 3), np.uint8)
    srt = _srt()[None]
    size = np.array([[0.2, 0.3, 0.2]], np.float32)
    out = draw_detections(img, str(tmp_path), "real_test", "0000", INTR,
                          srt, size, np.array([3]),
                          gt_srt=srt, gt_size=size, gt_class_ids=np.array([3]))
    assert os.path.exists(tmp_path / "real_test_0000_pred.png")
    assert out.any()


def test_draw_detections_axes_and_labels(tmp_path):
    """draw_axes/draw_labels route the prediction boxes through the
    reference-style axes renderer and the label text box."""
    img = np.zeros((480, 640, 3), np.uint8)
    srt = _srt()[None]
    size = np.array([[0.2, 0.3, 0.2]], np.float32)
    out = draw_detections(img, str(tmp_path), "real_test", "0001", INTR,
                          srt, size, np.array([5]), draw_gt=False,
                          draw_axes=True, draw_labels=True)
    colors = {tuple(c) for c in out.reshape(-1, 3) if c.any()}
    assert (0, 255, 0) in colors          # y axis arrow (green)
    assert (255, 255, 255) in colors      # label glyph pixels ("laptop")

"""Target assignment: the vectorized on-device generator must match an
independent numpy reimplementation of the reference semantics
(ref: centernet_target.py:118-324)."""

import numpy as np
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.ops.targets import (
    prepare_centernet_targets,
)


def naive_gaussian_radius(height, width, min_overlap=0.7):
    a1, b1 = 1, height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(b1**2 - 4 * a1 * c1)) / 2
    a2, b2 = 4, 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + np.sqrt(b2**2 - 4 * a2 * c2)) / 2
    a3, b3 = 4 * min_overlap, -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def naive_draw_gaussian(heatmap, center, radius):
    diameter = 2 * radius + 1
    sigma = diameter / 6
    m = n = (diameter - 1.0) / 2.0
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    g = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    g[g < np.finfo(g.dtype).eps * g.max()] = 0
    cx, cy = int(center[0]), int(center[1])
    h, w = heatmap.shape
    left, right = min(cx, radius), min(w - cx, radius + 1)
    top, bottom = min(cy, radius), min(h - cy, radius + 1)
    masked_h = heatmap[cy - top : cy + bottom, cx - left : cx + right]
    masked_g = g[radius - top : radius + bottom, radius - left : radius + right]
    if min(masked_g.shape) > 0 and min(masked_h.shape) > 0:
        np.maximum(masked_h, masked_g, out=masked_h)


def naive_targets(gt_boxes, gt_labels, bev=(50, 50), num_classes=10,
                  pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
                  min_radius=2):
    h, w = bev
    b, m = gt_labels.shape
    x_min, y_min, _, x_max, y_max, _ = pc_range
    vx, vy = (x_max - x_min) / w, (y_max - y_min) / h
    heatmap = np.zeros((b, num_classes, h, w))
    ind = np.zeros((b, m), np.int64)
    reg_mask = np.zeros((b, m), np.uint8)
    t_off = np.zeros((b, m, 2))
    t_size = np.zeros((b, m, 3))
    t_rot = np.zeros((b, m, 2))
    for bi in range(b):
        for k in range(m):
            cls = int(gt_labels[bi, k])
            if cls < 0 or cls >= num_classes:
                continue
            x, y, _, bw, bl, bh, yaw = gt_boxes[bi, k, :7]
            px, py = (x - x_min) / vx, (y - y_min) / vy
            if px < 0 or px >= w or py < 0 or py >= h:
                continue
            cx, cy = int(px), int(py)
            radius = max(
                min_radius, int(naive_gaussian_radius(bl / vy, bw / vx))
            )
            naive_draw_gaussian(heatmap[bi, cls], (cx, cy), radius)
            ind[bi, k] = cy * w + cx
            reg_mask[bi, k] = 1
            t_off[bi, k] = [px - cx, py - cy]
            t_size[bi, k] = [bw, bl, bh]
            t_rot[bi, k] = [np.sin(yaw), np.cos(yaw)]
    return heatmap, ind, reg_mask, t_off, t_size, t_rot


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_targets_match_reference_semantics(seed):
    rng = np.random.RandomState(seed)
    b, m = 2, 12
    boxes = np.zeros((b, m, 7), np.float32)
    labels = np.full((b, m), -1, np.int64)
    for bi in range(b):
        n = rng.randint(1, m)
        boxes[bi, :n, 0:2] = rng.uniform(-60, 60, (n, 2))  # some out of range
        boxes[bi, :n, 2] = rng.uniform(-2, 1, n)
        boxes[bi, :n, 3:6] = rng.uniform(0.5, 8, (n, 3))
        boxes[bi, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        labels[bi, :n] = rng.randint(0, 10, n)

    out = prepare_centernet_targets(boxes, labels)
    hm_ref, ind_ref, mask_ref, off_ref, size_ref, rot_ref = naive_targets(
        boxes, labels
    )

    # device heatmap is NHWC
    hm = np.asarray(out["heatmap"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(hm, hm_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["ind"]), ind_ref)
    np.testing.assert_array_equal(np.asarray(out["reg_mask"]), mask_ref)
    np.testing.assert_allclose(
        np.asarray(out["target_offset"]), off_ref, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["target_size"]), size_ref, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["target_rot"]), rot_ref, atol=1e-5
    )


def test_targets_peak_is_one_at_center():
    boxes = np.zeros((1, 1, 7), np.float32)
    boxes[0, 0] = [0.0, 0.0, 0.0, 4.0, 4.0, 2.0, 0.0]
    labels = np.array([[3]], np.int64)
    out = prepare_centernet_targets(boxes, labels)
    hm = np.asarray(out["heatmap"])[0, :, :, 3]
    # center (0,0) world -> pixel (25, 25)
    assert hm[25, 25] == 1.0
    assert np.asarray(out["ind"])[0, 0] == 25 * 50 + 25


def test_targets_velocity_from_9col_boxes():
    boxes = np.zeros((1, 1, 9), np.float32)
    boxes[0, 0] = [0, 0, 0, 2, 2, 2, 0, 1.5, -0.5]
    labels = np.array([[0]], np.int64)
    out = prepare_centernet_targets(boxes, labels)
    np.testing.assert_allclose(
        np.asarray(out["target_vel"])[0, 0], [1.5, -0.5]
    )


def test_targets_dense_maps_at_centers():
    boxes = np.zeros((1, 1, 7), np.float32)
    boxes[0, 0] = [10.0, -20.0, 0.0, 2.0, 3.0, 1.5, 0.7]
    labels = np.array([[1]], np.int64)
    out = prepare_centernet_targets(boxes, labels)
    px = (10.0 + 51.2) / 2.048
    py = (-20.0 + 51.2) / 2.048
    cx, cy = int(px), int(py)
    np.testing.assert_allclose(
        np.asarray(out["size"])[0, cy, cx], [2.0, 3.0, 1.5], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["offset"])[0, cy, cx], [px - cx, py - cy], atol=1e-5
    )


def test_gaussian_radius_reference_vs_corrected_large_box_fine_grid():
    """An 18 m box at voxel 0.512 distinguishes the reference's /2 divisors
    (upstream CornerNet bug, centernet_target.py:131-149) from the corrected
    /(2a) roots: the radii (and hence heatmaps) must differ, and the default
    must match the reference formula exactly."""
    from bevfusion_multimodal_3d_object_detection_tpu.ops.targets import (
        gaussian_radius,
    )

    hpix = wpix = 18.0 / 0.512  # ~35.2 pixels
    r_ref = float(gaussian_radius(hpix, wpix))
    r_fix = float(gaussian_radius(hpix, wpix, corrected=True))
    assert r_ref == pytest.approx(naive_gaussian_radius(hpix, wpix), abs=1e-4)
    assert int(r_ref) != int(r_fix)  # 3 vs 2 at this size

    # end-to-end: a 200x200 grid (voxel 0.512) heatmap must match the naive
    # reference reimplementation for the large box
    boxes = np.zeros((1, 1, 7), np.float32)
    boxes[0, 0] = [10.0, -20.0, 0.0, 18.0, 18.0, 3.0, 0.0]
    labels = np.array([[0]], np.int64)
    out = prepare_centernet_targets(boxes, labels, bev_size=(200, 200))
    hm_ref, *_ = naive_targets(boxes, labels, bev=(200, 200))
    np.testing.assert_allclose(
        np.asarray(out["heatmap"]).transpose(0, 3, 1, 2), hm_ref, atol=1e-5
    )
    out_fix = prepare_centernet_targets(
        boxes, labels, bev_size=(200, 200), corrected_gaussian_radius=True
    )
    assert not np.allclose(
        np.asarray(out_fix["heatmap"]), np.asarray(out["heatmap"])
    )


def test_targets_at_2x_grid_resolution():
    """BASELINE configs[4]: target assignment at a 100x100 BEV grid
    (voxel 1.024 m) — same semantics, finer pixels."""
    boxes = np.zeros((1, 2, 7), np.float32)
    boxes[0, 0] = [10.0, -20.0, 0.0, 2.0, 4.0, 1.5, 0.5]
    boxes[0, 1] = [-30.0, 5.0, 0.0, 1.0, 1.0, 2.0, 0.0]
    labels = np.array([[0, 7]], np.int64)
    out = prepare_centernet_targets(boxes, labels, bev_size=(100, 100))
    assert out["heatmap"].shape == (1, 100, 100, 10)
    hm_ref, ind_ref, mask_ref, off_ref, size_ref, rot_ref = naive_targets(
        boxes, labels, bev=(100, 100)
    )
    np.testing.assert_allclose(
        np.asarray(out["heatmap"]).transpose(0, 3, 1, 2), hm_ref, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out["ind"]), ind_ref)

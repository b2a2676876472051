"""Inference engine: P/R/F1 IoU matching and engine plumbing
(ref: inference.py:276-391, 821-909)."""

import numpy as np
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.inference_engine import (
    bev_iou_axis_aligned,
    precision_recall_f1,
)


def _box(x, y, w=2.0, l=4.0):
    return np.array([x, y, 0.0, w, l, 1.5, 0.3])


def test_iou_identical_boxes():
    assert bev_iou_axis_aligned(_box(0, 0), _box(0, 0)) == pytest.approx(1.0)


def test_iou_disjoint_boxes():
    assert bev_iou_axis_aligned(_box(0, 0), _box(100, 0)) == 0.0


def test_iou_ignores_yaw():
    """The reference IoU is axis-aligned and ignores yaw
    (inference.py:336-349)."""
    a = _box(0, 0)
    b = _box(0, 0)
    b[6] = 1.5  # rotated box, same axis-aligned footprint
    assert bev_iou_axis_aligned(a, b) == pytest.approx(1.0)


def test_iou_half_overlap():
    a = np.array([0, 0, 0, 2.0, 2.0, 1.0, 0])
    b = np.array([1.0, 0, 0, 2.0, 2.0, 1.0, 0])
    # intersection 1x2=2, union 4+4-2=6
    assert bev_iou_axis_aligned(a, b) == pytest.approx(2 / 6)


def test_prf1_perfect():
    preds = np.stack([_box(0, 0), _box(10, 10)])
    gts = np.stack([_box(0, 0), _box(10, 10)])
    p, r, f1, tp, fp, fn = precision_recall_f1(preds, gts)
    assert (p, r, f1) == (1.0, 1.0, 1.0)
    assert (tp, fp, fn) == (2, 0, 0)


def test_prf1_empty_both():
    p, r, f1, *_ = precision_recall_f1(np.zeros((0, 7)), np.zeros((0, 7)))
    assert (p, r, f1) == (1.0, 1.0, 1.0)  # ref: vacuous-truth convention


def test_prf1_false_positive_and_negative():
    preds = np.stack([_box(0, 0), _box(30, 30)])  # second is FP
    gts = np.stack([_box(0, 0), _box(-20, -20)])  # second is FN
    p, r, f1, tp, fp, fn = precision_recall_f1(preds, gts)
    assert tp == 1 and fp == 1 and fn == 1
    assert p == 0.5 and r == 0.5


def test_prf1_each_gt_matched_once():
    preds = np.stack([_box(0, 0), _box(0.1, 0)])  # both overlap same gt
    gts = np.stack([_box(0, 0)])
    p, r, f1, tp, fp, fn = precision_recall_f1(preds, gts)
    assert tp == 1 and fp == 1 and fn == 0

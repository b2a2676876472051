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


def test_engine_end_to_end_random_init(tmp_path):
    """Full engine path in-process: random init -> run_inference -> detections
    dict + P/R/F1 + prediction JSON + figure."""
    from bevfusion_multimodal_3d_object_detection_tpu.inference_engine import (
        InferenceEngine,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data import (
        SyntheticNuScenesDataset,
    )
    from conftest import TINY_IMAGE, TINY_POINTS, TINY_RADAR_POINTS

    cfg = {
        "dataset": {
            "cameras": {"image_size": list(TINY_IMAGE)},
            "max_points": {"lidar": TINY_POINTS,
                           "radar_per_sensor": TINY_RADAR_POINTS},
        },
        "model": {
            "camera_encoder": {"input_size": list(TINY_IMAGE)},
            "lidar_encoder": {"max_points": TINY_POINTS},
            "radar_encoder": {"max_points_per_sensor": TINY_RADAR_POINTS},
        },
        "inference": {"save_predictions": True},
    }
    engine = InferenceEngine(config=cfg)
    ds = SyntheticNuScenesDataset(
        num_samples=1, image_size=TINY_IMAGE, max_points=TINY_POINTS,
        max_radar_points=TINY_RADAR_POINTS,
    )
    sample = ds[0]
    engine.init_random(sample)
    res = engine.run_inference(
        sample, visualize=True, save_dir=str(tmp_path)
    )
    assert {"detections", "precision", "recall", "f1"} <= set(res)
    assert (tmp_path / f"inference_{sample['token']}.png").exists()
    assert (tmp_path / f"predictions_{sample['token']}.json").exists()


def test_engine_unlabeled_sample_and_batch_save_dir(tmp_path):
    """run_inference tolerates gt_boxes without gt_labels (unlabeled data),
    and batch_inference forwards save_dir so prediction JSONs are written."""
    from bevfusion_multimodal_3d_object_detection_tpu.inference_engine import (
        InferenceEngine,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data import (
        SyntheticNuScenesDataset,
    )
    from conftest import TINY_IMAGE, TINY_POINTS, TINY_RADAR_POINTS

    cfg = {
        "dataset": {
            "cameras": {"image_size": list(TINY_IMAGE)},
            "max_points": {"lidar": TINY_POINTS,
                           "radar_per_sensor": TINY_RADAR_POINTS},
        },
        "model": {
            "camera_encoder": {"input_size": list(TINY_IMAGE)},
            "lidar_encoder": {"max_points": TINY_POINTS},
            "radar_encoder": {"max_points_per_sensor": TINY_RADAR_POINTS},
        },
        "inference": {"save_predictions": True},
    }
    engine = InferenceEngine(config=cfg)
    ds = SyntheticNuScenesDataset(
        num_samples=2, image_size=TINY_IMAGE, max_points=TINY_POINTS,
        max_radar_points=TINY_RADAR_POINTS,
    )
    engine.init_random(ds[0])

    unlabeled = dict(ds[0])
    unlabeled.pop("gt_labels")  # boxes present, labels absent
    res = engine.run_inference(unlabeled, visualize=False)
    assert np.isfinite(res["f1"])

    out = str(tmp_path / "batch_out")
    engine.batch_inference(ds, num_samples=2, save_dir=out)
    import pathlib

    written = list(pathlib.Path(out).glob("predictions_*.json"))
    assert len(written) == 2, written

"""Metric stack vs reference semantics (ref: utils_v2.py)."""

import numpy as np
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    DEFAULT_CLASSES,
    METRIC_REPORT_CLASSES,
)
from bevfusion_multimodal_3d_object_detection_tpu.utils.metrics import (
    calculate_ap,
    compute_center_distance_matrix,
    compute_metrics,
    match_predictions_to_gt,
    save_and_print_metrics,
)


def _box(x, y, w=2.0, l=4.0, h=1.5, yaw=0.0):
    return [x, y, 0.0, w, l, h, yaw]


def test_perfect_predictions_give_map_one():
    gt = {"boxes": np.array([_box(0, 0), _box(10, 10)]),
          "labels": np.array([0, 0])}
    pred = {"boxes": np.array([_box(0, 0), _box(10, 10)]),
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([0, 0])}
    m = compute_metrics([pred], [gt])
    assert m["AP_per_class"]["car"] == pytest.approx(1.0, abs=1e-6)
    assert m["mAP"] == pytest.approx(1.0 / 10, abs=1e-6)  # mean over 10 classes
    assert m["mATE"] == 0.0


def test_degenerate_nds_matches_reference_published_value():
    """Empty predictions -> mAP 0, error terms 1.0 -> NDS 0.3579
    (the reference's published tri-modal NDS, metrics_output.txt:3)."""
    gt = {"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}
    pred = {"boxes": np.zeros((0, 7)), "scores": np.zeros(0),
            "labels": np.zeros(0, np.int64)}
    m = compute_metrics([pred], [gt])
    assert abs(m["NDS"] - 0.3579) < 1e-3


def test_matching_is_greedy_by_score():
    dist = np.array([[0.5, 1.0], [0.4, 3.0]])
    scores = np.array([0.1, 0.9])  # pred 1 matches first
    matches = match_predictions_to_gt(dist, scores)
    assert (1, 0) in matches  # high-score pred takes the close gt
    assert (0, 1) in matches


def test_ap_distance_threshold():
    gt = np.array([_box(0, 0)])
    pred = np.array([_box(5, 0)])  # 5 m away > 2 m threshold
    dist = compute_center_distance_matrix(pred, gt)
    assert calculate_ap(pred, np.array([0.9]), gt, dist) == 0.0
    pred2 = np.array([_box(1.0, 0)])
    dist2 = compute_center_distance_matrix(pred2, gt)
    assert calculate_ap(pred2, np.array([0.9]), gt, dist2) > 0.9


def test_report_class_order_quirk():
    gt = {"boxes": np.array([_box(0, 0)]), "labels": np.array([3])}  # 'bus'
    pred = {"boxes": np.array([_box(0, 0)]), "scores": np.array([0.9]),
            "labels": np.array([3])}
    m_ref = compute_metrics([pred], [gt], report_class_order="reference")
    m_fix = compute_metrics([pred], [gt], report_class_order="dataset")
    # label 3 = 'bus' in dataset order but row 3 = 'trailer' in the
    # reference's report order (quirk Q9)
    assert m_ref["AP_per_class"]["trailer"] == pytest.approx(1.0, abs=1e-6)
    assert m_fix["AP_per_class"]["bus"] == pytest.approx(1.0, abs=1e-6)
    assert DEFAULT_CLASSES[3] == "bus"
    assert METRIC_REPORT_CLASSES[3] == "trailer"


def test_metrics_file_format(tmp_path):
    gt = {"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}
    pred = {"boxes": np.array([_box(0, 0)]), "scores": np.array([0.9]),
            "labels": np.array([0])}
    m = compute_metrics([pred], [gt])
    out = tmp_path / "metrics.txt"
    save_and_print_metrics(m, str(out))
    text = out.read_text().splitlines()
    assert text[0] == "===== Evaluation Metrics ====="
    assert text[1].startswith("mAP : ")
    assert text[2].startswith("NDS : ")
    assert text[4] == "--- AP Per Class ---"
    assert len(text) == 5 + 10  # 10 class rows


def test_official_metrics_perfect_predictions():
    from bevfusion_multimodal_3d_object_detection_tpu.utils.metrics import (
        compute_metrics_official,
    )

    gt = {"boxes": np.array([_box(0, 0), _box(20, 20)]),
          "labels": np.array([0, 0]),
          "velocities": np.zeros((2, 2))}
    pred = {"boxes": np.array([_box(0, 0), _box(20, 20)]),
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([0, 0]),
            "velocities": np.zeros((2, 2))}
    m = compute_metrics_official([pred], [gt], num_classes=1)
    assert m["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert m["mATE"] == 0.0 and m["mASE"] == pytest.approx(0.0, abs=1e-6)
    # perfect TP errors but mAAE pinned at worst: NDS = (5 + 4) / 10
    assert m["NDS"] == pytest.approx(0.9, abs=1e-6)


def test_official_metrics_distance_threshold_sensitivity():
    from bevfusion_multimodal_3d_object_detection_tpu.utils.metrics import (
        compute_metrics_official,
    )

    gt = {"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}
    # 1.5 m off: matches at thresholds 2 and 4 but not 0.5 and 1
    pred = {"boxes": np.array([_box(1.5, 0)]), "scores": np.array([0.9]),
            "labels": np.array([0])}
    m = compute_metrics_official([pred], [gt], num_classes=1)
    assert 0.3 < m["mAP"] < 0.7  # roughly 2 of 4 thresholds


def test_official_metrics_global_accumulation():
    """Scores must rank globally across samples (unlike the reference's
    per-sample AP averaging)."""
    from bevfusion_multimodal_3d_object_detection_tpu.utils.metrics import (
        compute_metrics_official,
    )

    # sample 1: one gt, matched with low score; sample 2: a high-score FP
    gt1 = {"boxes": np.array([_box(0, 0)]), "labels": np.array([0])}
    pred1 = {"boxes": np.array([_box(0, 0)]), "scores": np.array([0.3]),
             "labels": np.array([0])}
    gt2 = {"boxes": np.zeros((0, 7)), "labels": np.zeros(0, np.int64)}
    pred2 = {"boxes": np.array([_box(30, 30)]), "scores": np.array([0.9]),
             "labels": np.array([0])}
    m = compute_metrics_official([pred1, pred2], [gt1, gt2], num_classes=1)
    # the FP outranks the TP globally -> max precision at recall 1 is 0.5
    assert m["mAP"] < 0.6


def test_step_timer_and_profiling_utils():
    from bevfusion_multimodal_3d_object_detection_tpu.utils.profiling import (
        StepTimer,
    )

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary(batch_size=2)
    assert s["steps"] == 3  # warmup discarded
    assert s["fps"] > 0 and s["mean_latency_ms"] >= 0

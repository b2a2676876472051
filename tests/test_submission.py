"""Official nuScenes submission export: the LiDAR->global transform must be
the exact inverse of the converter's global->LiDAR annotation transform."""

import json

import numpy as np

from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
    _Box,
    quat_inverse,
    quat_normalize,
    quat_yaw,
)
from bevfusion_multimodal_3d_object_detection_tpu.utils.submission import (
    detection_to_global,
    export_nuscenes_submission,
)


def _random_pose(rng):
    q = quat_normalize(rng.randn(4))
    return {"rotation": list(q), "translation": list(rng.uniform(-5, 5, 3))}


def _to_lidar(center_g, quat_g, pose, calib):
    """The converter's global -> ego -> sensor transform
    (data/converter.py:_get_annotations)."""
    box = _Box(center_g, [1, 1, 1], quat_g)
    box.translate(-np.asarray(pose["translation"]))
    box.rotate(quat_inverse(pose["rotation"]))
    box.translate(-np.asarray(calib["translation"]))
    box.rotate(quat_inverse(calib["rotation"]))
    return box.center, box.yaw


def test_lidar_to_global_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        pose, calib = _random_pose(rng), _random_pose(rng)
        center_g = rng.uniform(-100, 100, 3)
        yaw_g = rng.uniform(-np.pi, np.pi)
        quat_g = [np.cos(yaw_g / 2), 0, 0, np.sin(yaw_g / 2)]
        c_lidar, yaw_lidar = _to_lidar(center_g, quat_g, pose, calib)

        box7 = np.array([*c_lidar, 1.9, 4.5, 1.7, yaw_lidar])
        center_back, size, rot, vel = detection_to_global(
            box7, np.array([1.0, 2.0]), calib, pose
        )
        np.testing.assert_allclose(center_back, center_g, atol=1e-9)
        np.testing.assert_allclose(size, [1.9, 4.5, 1.7])
        np.testing.assert_allclose(vel, [1.0, 2.0])  # global passthrough
        # the recovered global orientation yaw matches when the sensor
        # orientation is yaw-only (planar poses); with full 3-D random poses
        # only the composed quaternion is defined, so compare via transform:
        # re-run the forward transform on the recovered quaternion
        _, yaw_rt = _to_lidar(center_back, rot, pose, calib)
        assert abs(
            np.arctan2(np.sin(yaw_rt - yaw_lidar), np.cos(yaw_rt - yaw_lidar))
        ) < 1e-9


def test_export_submission_schema(tmp_path):
    rng = np.random.RandomState(1)
    infos = [
        {
            "token": f"tok{i}",
            "lidar_pose": _random_pose(rng),
            "lidar_calibrated_sensor": _random_pose(rng),
        }
        for i in range(2)
    ]
    detections = [
        {
            "boxes": rng.randn(3, 7).astype(np.float32),
            "scores": np.array([0.9, 0.5, 0.2], np.float32),
            "labels": np.array([0, 7, 9]),
            "velocities": rng.randn(3, 2).astype(np.float32),
        },
        {
            "boxes": np.zeros((0, 7), np.float32),
            "scores": np.zeros(0, np.float32),
            "labels": np.zeros(0, np.int64),
            "velocities": np.zeros((0, 2), np.float32),
        },
    ]
    path = str(tmp_path / "submission.json")
    sub = export_nuscenes_submission(detections, infos, path)
    on_disk = json.load(open(path))
    assert on_disk == json.loads(json.dumps(sub))
    assert set(on_disk["meta"]) == {
        "use_camera", "use_lidar", "use_radar", "use_map", "use_external",
    }
    assert len(on_disk["results"]["tok0"]) == 3
    assert on_disk["results"]["tok1"] == []
    e = on_disk["results"]["tok0"][0]
    assert set(e) == {
        "sample_token", "translation", "size", "rotation", "velocity",
        "detection_name", "detection_score", "attribute_name",
    }
    assert e["detection_name"] == "car"
    assert e["sample_token"] == "tok0"
    assert len(e["rotation"]) == 4 and len(e["translation"]) == 3

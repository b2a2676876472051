"""Official nuScenes detection-submission export.

The reference only writes its own per-sample JSON (`inference.py`
save_predictions) and a private metrics report (utils_v2.py) — it has no
path to the official nuScenes evaluation server. This module is an additive
capability: convert decoded detections (LiDAR frame, the dataset/model
frame) into the official `submission.json` schema

    {"meta": {...}, "results": {sample_token: [box, ...]}}

with each box carrying GLOBAL-frame translation/rotation/velocity, using the
per-sample `lidar_calibrated_sensor` (lidar -> ego) and `lidar_pose`
(ego -> global) transforms the converter already stores in the info pickles
(data/converter.py schema; ref: data_converter.py:87-161 stores the same
fields).

Quaternions are [w, x, y, z] (nuScenes convention), reusing the converter's
numpy quaternion helpers (no pyquaternion dependency).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import DEFAULT_CLASSES
from ..data.converter import (
    quat_multiply,
    quat_normalize,
    quat_rotation_matrix,
)


def _yaw_quat(yaw: float) -> np.ndarray:
    return np.array([np.cos(yaw / 2.0), 0.0, 0.0, np.sin(yaw / 2.0)])


def detection_to_global(
    box: np.ndarray,
    velocity: Optional[np.ndarray],
    lidar_calib: Dict,
    lidar_pose: Dict,
    rotate_velocity: bool = False,
):
    """One LiDAR-frame box [x, y, z, w, l, h, yaw] (+ optional [vx, vy]) ->
    (translation[3], size[3] (w, l, h), rotation quat[4] wxyz,
    velocity[2]) in the GLOBAL frame.

    `rotate_velocity` defaults to False: the converter stores gt velocities
    in the GLOBAL frame unrotated (reference parity — ref:
    data_converter.py box_velocity is never rotated into the sensor frame),
    so a model trained on those targets predicts global-frame velocities
    already. Set True only for models trained on sensor-frame velocities."""
    q_l2e = quat_normalize(np.asarray(lidar_calib["rotation"], float))
    t_l2e = np.asarray(lidar_calib["translation"], float)
    q_e2g = quat_normalize(np.asarray(lidar_pose["rotation"], float))
    t_e2g = np.asarray(lidar_pose["translation"], float)
    r_l2e = quat_rotation_matrix(q_l2e)
    r_e2g = quat_rotation_matrix(q_e2g)

    center = np.asarray(box[:3], float)
    center = r_e2g @ (r_l2e @ center + t_l2e) + t_e2g
    rotation = quat_normalize(
        quat_multiply(q_e2g, quat_multiply(q_l2e, _yaw_quat(float(box[6]))))
    )
    if velocity is None:
        vel = np.zeros(2)
    elif rotate_velocity:
        v = np.array([float(velocity[0]), float(velocity[1]), 0.0])
        vel = (r_e2g @ (r_l2e @ v))[:2]
    else:
        vel = np.asarray(velocity[:2], float)
    return center, np.asarray(box[3:6], float), rotation, vel


def export_nuscenes_submission(
    detections: List[Dict[str, np.ndarray]],
    infos: Sequence[Dict],
    path: str,
    classes: Sequence[str] = DEFAULT_CLASSES,
    use_camera: bool = True,
    use_lidar: bool = True,
    use_radar: bool = True,
    max_boxes_per_sample: int = 500,
) -> Dict:
    """Write the official nuScenes `submission.json`.

    `detections[i]` is a decode_to_host-style dict (boxes (K, 7+), scores,
    labels, optional velocities) for the sample described by `infos[i]`
    (an info-pickle entry with 'token', 'lidar_calibrated_sensor',
    'lidar_pose'). The official server caps boxes per sample at 500.
    Returns the submission dict (also written to `path`)."""
    if len(detections) != len(infos):
        # the official server rejects submissions missing sample tokens;
        # a silent zip truncation would surface only at upload time
        raise ValueError(
            f"submission needs one detection dict per info: got "
            f"{len(detections)} detections for {len(infos)} samples"
        )
    results: Dict[str, List[Dict]] = {}
    for det, info in zip(detections, infos):
        boxes = np.asarray(det["boxes"], float)
        scores = np.asarray(det["scores"], float)
        labels = np.asarray(det["labels"], int)
        vels = det.get("velocities")
        entries = []
        for k in range(min(len(scores), max_boxes_per_sample)):
            center, size, rot, vel = detection_to_global(
                boxes[k],
                None if vels is None else np.asarray(vels)[k],
                info["lidar_calibrated_sensor"],
                info["lidar_pose"],
            )
            entries.append(
                {
                    "sample_token": info["token"],
                    "translation": [float(x) for x in center],
                    "size": [float(x) for x in size],
                    "rotation": [float(x) for x in rot],
                    "velocity": [float(x) for x in vel],
                    "detection_name": classes[int(labels[k])],
                    "detection_score": float(scores[k]),
                    "attribute_name": "",
                }
            )
        results[info["token"]] = entries
    submission = {
        "meta": {
            "use_camera": bool(use_camera),
            "use_lidar": bool(use_lidar),
            "use_radar": bool(use_radar),
            "use_map": False,
            "use_external": False,
        },
        "results": results,
    }
    with open(path, "w") as f:
        json.dump(submission, f)
    return submission

"""Multi-sweep LiDAR aggregation: ego-motion compensation math + dataset
loader path."""

import pickle

import numpy as np

from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
    sensor_to_global,
    transform_points_between_sensors,
)


IDENTITY = {"rotation": [1, 0, 0, 0], "translation": [0, 0, 0]}


def _pose(translation, yaw=0.0):
    return {
        "rotation": [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)],
        "translation": list(translation),
    }


def test_sensor_to_global_composition():
    # sensor mounted 1m forward on an ego translated (10, 0, 0)
    r, t = sensor_to_global(_pose([10, 0, 0]), _pose([1, 0, 0]))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(t, [11, 0, 0], atol=1e-12)


def test_transform_points_pure_translation():
    """Ego moved +2m in x between sweeps: an old point at the same global
    location appears 2m behind in the new frame."""
    pts = np.array([[5.0, 0.0, 0.0, 0.7]], np.float32)
    out = transform_points_between_sensors(
        pts,
        src_pose=_pose([0, 0, 0]), src_calib=IDENTITY,
        dst_pose=_pose([2, 0, 0]), dst_calib=IDENTITY,
    )
    np.testing.assert_allclose(out[0, :3], [3.0, 0.0, 0.0], atol=1e-5)
    assert out[0, 3] == np.float32(0.7)  # intensity untouched


def test_transform_points_rotation():
    """90-degree ego yaw between sweeps rotates old points into the new
    frame."""
    pts = np.array([[1.0, 0.0, 0.0, 0.0]], np.float32)
    out = transform_points_between_sensors(
        pts,
        src_pose=_pose([0, 0, 0], yaw=0.0), src_calib=IDENTITY,
        dst_pose=_pose([0, 0, 0], yaw=np.pi / 2), dst_calib=IDENTITY,
    )
    # global (1,0,0) seen from a frame rotated +90deg -> (0,-1,0)
    np.testing.assert_allclose(out[0, :3], [0.0, -1.0, 0.0], atol=1e-6)


def test_dataset_multi_sweep_aggregation(tmp_path):
    """Dataset with num_sweeps=2 stacks the key sweep (dt=0) and the
    compensated prior sweep (dt>0) into (N, 5) points."""
    from bevfusion_multimodal_3d_object_detection_tpu.data import (
        NuScenesDataset,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
        write_synthetic_infos,
    )
    from PIL import Image

    write_synthetic_infos(str(tmp_path), samples_per_split=1, splits=("val",))
    with open(tmp_path / "nuscenes_infos_val.pkl", "rb") as f:
        data = pickle.load(f)
    info = data["infos"][0]
    rng = np.random.RandomState(0)

    # key sweep: one known point; prior sweep: another, ego shifted +2m x
    key_pts = np.array([[5.0, 1.0, 0.0, 0.5, 0.0]], np.float32)
    key_pts.tofile(info["lidar_path"])
    sweep_path = tmp_path / "sweep_prev.bin"
    np.array([[7.0, 1.0, 0.0, 0.9, 0.0]], np.float32).tofile(sweep_path)
    info["lidar_pose"] = _pose([2, 0, 0])
    info["lidar_calibrated_sensor"] = IDENTITY
    info["sweeps"] = [
        {
            "lidar_path": str(sweep_path),
            "pose": _pose([0, 0, 0]),
            "calib": IDENTITY,
            "time_lag_s": 0.05,
        }
    ]
    for cam in info["cams"].values():
        Image.fromarray(rng.randint(0, 255, (36, 60, 3), np.uint8)).save(
            tmp_path / cam["filename"]
        )
    with open(tmp_path / "nuscenes_infos_val.pkl", "wb") as f:
        pickle.dump(data, f)

    ds = NuScenesDataset(
        data_root=str(tmp_path), split="val", max_points=16,
        max_radar_points=4, image_size=(32, 64), seed=0, num_sweeps=2,
        use_native=False,
        compat=__import__(
            "bevfusion_multimodal_3d_object_detection_tpu.config",
            fromlist=["CompatFlags"],
        ).CompatFlags(lidar_four_float_parse=False),
    )
    pts = ds[0]["lidar_points"]
    assert pts.shape == (16, 5)
    real = pts[np.abs(pts).sum(axis=1) > 0]
    assert len(real) == 2
    # key point unchanged with dt 0; prior point compensated: 7-2=5 in x,
    # dt 0.05
    rows = {tuple(np.round(r, 4)) for r in real.tolist()}
    assert (5.0, 1.0, 0.0, 0.5, 0.0) in rows
    assert (5.0, 1.0, 0.0, 0.9, 0.05) in rows


def _write_radar_pcd(path, rows):
    """rows: (N, 6) [x, y, z, vx, vy, rcs] -> minimal binary .pcd."""
    arr = np.asarray(rows, np.float32).reshape(-1, 6)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z vx vy rcs\n"
        "SIZE 4 4 4 4 4 4\n"
        "TYPE F F F F F F\n"
        "COUNT 1 1 1 1 1 1\n"
        f"WIDTH {len(arr)}\nHEIGHT 1\n"
        f"POINTS {len(arr)}\n"
        "DATA binary\n"
    ).encode("ascii")
    path.write_bytes(header + arr.tobytes())


def test_dataset_radar_multi_sweep_aggregation(tmp_path):
    """radar_num_sweeps=2: prior-sweep radar points are ego-compensated,
    their (vx, vy) rotated into the key frame, and the t channel carries the
    time lag (0 for the key frame)."""
    from PIL import Image

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        RADAR_ORDER,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data import (
        NuScenesDataset,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
        write_synthetic_infos,
    )

    write_synthetic_infos(str(tmp_path), samples_per_split=1, splits=("val",))
    with open(tmp_path / "nuscenes_infos_val.pkl", "rb") as f:
        data = pickle.load(f)
    info = data["infos"][0]
    rng = np.random.RandomState(0)
    np.zeros((1, 5), np.float32).tofile(info["lidar_path"])
    for cam in info["cams"].values():
        Image.fromarray(rng.randint(0, 255, (36, 60, 3), np.uint8)).save(
            tmp_path / cam["filename"]
        )

    # RADAR_FRONT: key frame at ego (2, 0, 0); prior sweep at ego origin
    # rotated +90deg yaw with one point at (1, 0, 0) moving +1 m/s along its
    # own x axis
    front = info["radars"][RADAR_ORDER[0]]
    _write_radar_pcd(
        tmp_path / front["filename"], [[5.0, 1.0, 0.0, 1.0, 0.0, 0.5]]
    )
    sweep_path = tmp_path / "radar_prev.pcd"
    _write_radar_pcd(sweep_path, [[1.0, 0.0, 0.0, 1.0, 0.0, 0.9]])
    front["pose"] = _pose([2, 0, 0])
    front["sweeps"] = [
        {
            "path": str(sweep_path),
            "pose": _pose([2, 0, 0], yaw=np.pi / 2),
            "calib": IDENTITY,
            "time_lag_s": 0.07,
        }
    ]
    # the other radars keep no sweeps -> single-frame path (missing files
    # parse to zeros)
    with open(tmp_path / "nuscenes_infos_val.pkl", "wb") as f:
        pickle.dump(data, f)

    ds = NuScenesDataset(
        data_root=str(tmp_path), split="val", max_points=8,
        max_radar_points=4, image_size=(32, 64), seed=0,
        radar_num_sweeps=2, use_native=False,
        compat=CompatFlags(random_radar_points=False),
    )
    radars = ds[0]["radar_points"]
    assert radars.shape == (5, 4, 7)
    front_pts = radars[0]
    real = front_pts[np.abs(front_pts).sum(axis=1) > 0]
    assert len(real) == 2
    rows = {tuple(np.round(r, 4)) for r in real.tolist()}
    # key point: unchanged, t=0
    assert (5.0, 1.0, 0.0, 1.0, 0.0, 0.5, 0.0) in rows
    # sweep point: position (1,0,0) in a +90deg frame at the same ego spot
    # -> (0, 1, 0) in the key frame; velocity (1,0) rotates to (0, 1);
    # t = 0.07
    assert (0.0, 1.0, 0.0, 0.0, 1.0, 0.9, 0.07) in rows

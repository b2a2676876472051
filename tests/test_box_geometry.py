"""3D box corner/projection geometry."""

import numpy as np

from bevfusion_multimodal_3d_object_detection_tpu.utils.box_geometry import (
    box_corners_3d,
    cam_to_lidar_transform,
    lidar_to_cam_transform,
    project_box_to_image,
)

IDENTITY_CALIB = {"rotation": [1, 0, 0, 0], "translation": [0, 0, 0]}
# camera looking along lidar +x: cam z-forward = lidar x, cam x-right =
# lidar -y, cam y-down = lidar -z  (quaternion for that rotation)
CAM_CALIB = {
    "rotation": [0.5, -0.5, 0.5, -0.5],
    "translation": [0.0, 0.0, 0.0],
}


def test_box_corners_axis_aligned():
    c = box_corners_3d(np.array([0, 0, 0, 2.0, 4.0, 1.0, 0.0]))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(np.abs(c[:, 0]).max(), 1.0)  # w/2 along x
    np.testing.assert_allclose(np.abs(c[:, 1]).max(), 2.0)  # l/2 along y
    np.testing.assert_allclose(np.abs(c[:, 2]).max(), 0.5)


def test_box_corners_yaw_rotation():
    c = box_corners_3d(np.array([0, 0, 0, 2.0, 4.0, 1.0, np.pi / 2]))
    # after 90deg: w extent now along y, l along x
    np.testing.assert_allclose(np.abs(c[:, 0]).max(), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.abs(c[:, 1]).max(), 1.0, atol=1e-6)


def test_transforms_are_inverses():
    rot_c2l, t_c2l = cam_to_lidar_transform(CAM_CALIB, IDENTITY_CALIB)
    rot_l2c, t_l2c = lidar_to_cam_transform(CAM_CALIB, IDENTITY_CALIB)
    p = np.array([3.0, -1.0, 0.5])
    roundtrip = rot_c2l @ (rot_l2c @ p + t_l2c) + t_c2l
    np.testing.assert_allclose(roundtrip, p, atol=1e-12)


def test_project_box_in_front_of_camera():
    rot, trans = lidar_to_cam_transform(CAM_CALIB, IDENTITY_CALIB)
    intr = np.array([[400.0, 0, 400.0], [0, 400.0, 225.0], [0, 0, 1.0]])
    # box 10m straight ahead (lidar +x) -> should project near image center
    box = np.array([10.0, 0, 0, 2.0, 4.0, 1.5, 0.0])
    uv = project_box_to_image(box, intr, rot, trans, image_hw=(450, 800))
    assert uv is not None
    center = uv.mean(axis=0)
    assert abs(center[0] - 400) < 100 and abs(center[1] - 225) < 100


def test_project_box_behind_camera_is_none():
    rot, trans = lidar_to_cam_transform(CAM_CALIB, IDENTITY_CALIB)
    intr = np.eye(3) * 400.0
    intr[2, 2] = 1.0
    box = np.array([-10.0, 0, 0, 2.0, 4.0, 1.5, 0.0])  # behind
    assert project_box_to_image(
        box, intr, rot, trans, image_hw=(450, 800)
    ) is None

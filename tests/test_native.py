"""Native C++ point-prep library vs the numpy reference path."""

import numpy as np
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.data.native import (
    filter_pad_native,
    get_lib,
    load_lidar_native,
    normalize_image_native,
)

PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native pointprep library unavailable"
)


def _numpy_filter(pts):
    x0, y0, z0, x1, y1, z1 = PC_RANGE
    m = (
        (pts[:, 0] > x0) & (pts[:, 0] < x1)
        & (pts[:, 1] > y0) & (pts[:, 1] < y1)
        & (pts[:, 2] > z0) & (pts[:, 2] < z1)
    )
    return pts[m]


def test_filter_pad_matches_numpy_when_underfull():
    rng = np.random.RandomState(0)
    pts = (rng.randn(300, 4) * 30).astype(np.float32)
    kept = _numpy_filter(pts)
    out = filter_pad_native(pts, max_points=512, out_channels=4,
                            pc_range=PC_RANGE, seed=7)
    assert out.shape == (512, 4)
    # deterministic order-preserving copy + zero pad when under capacity
    np.testing.assert_array_equal(out[: len(kept)], kept)
    np.testing.assert_array_equal(out[len(kept):], 0.0)


def test_filter_pad_subsample_is_seeded_and_in_range():
    rng = np.random.RandomState(1)
    pts = (rng.randn(5000, 4) * 20).astype(np.float32)
    a = filter_pad_native(pts, 256, 4, PC_RANGE, seed=42)
    b = filter_pad_native(pts, 256, 4, PC_RANGE, seed=42)
    c = filter_pad_native(pts, 256, 4, PC_RANGE, seed=43)
    np.testing.assert_array_equal(a, b)  # deterministic per seed
    assert not np.array_equal(a, c)
    kept = _numpy_filter(pts)
    kept_set = {tuple(r) for r in kept.tolist()}
    for row in a.tolist():
        assert tuple(row) in kept_set  # every sampled row is a real point


def test_load_lidar_native_reads_file(tmp_path):
    rng = np.random.RandomState(2)
    pts = (rng.randn(1000, 5) * 25).astype(np.float32)
    path = tmp_path / "sweep.bin"
    pts.tofile(path)
    out = load_lidar_native(str(path), record_floats=5, max_points=2048,
                            out_channels=4, pc_range=PC_RANGE, seed=0)
    kept = _numpy_filter(pts.reshape(-1, 5))[:, :4]
    np.testing.assert_array_equal(out[: len(kept)], kept)
    # quirk Q5 parse: 4-float stride over the same stream
    out4 = load_lidar_native(str(path), record_floats=4, max_points=2048,
                             out_channels=4, pc_range=PC_RANGE, seed=0)
    kept4 = _numpy_filter(pts.reshape(-1, 5).ravel()[:5000 // 4 * 4]
                          .reshape(-1, 4))
    np.testing.assert_array_equal(out4[: len(kept4)], kept4)


def test_normalize_image_matches_numpy():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (16, 20, 3), np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    got = normalize_image_native(img, mean, std)
    want = (img.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / \
        np.asarray(std, np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dataset_native_path_equivalence(tmp_path):
    """Dataset with use_native on/off must produce identically-filtered
    points (under capacity -> deterministic)."""
    from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
        write_synthetic_infos,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data import (
        NuScenesDataset,
    )
    from PIL import Image
    import pickle

    write_synthetic_infos(str(tmp_path), samples_per_split=1,
                          splits=("val",))
    rng = np.random.RandomState(0)
    with open(tmp_path / "nuscenes_infos_val.pkl", "rb") as f:
        data = pickle.load(f)
    for info in data["infos"]:
        (rng.randn(400, 5).astype(np.float32) * 10).tofile(
            info["lidar_path"]
        )
        for cam in info["cams"].values():
            Image.fromarray(
                rng.randint(0, 255, (36, 60, 3), np.uint8)
            ).save(tmp_path / cam["filename"])

    kw = dict(data_root=str(tmp_path), split="val", max_points=1024,
              max_radar_points=8, image_size=(32, 64), seed=0)
    a = NuScenesDataset(use_native=True, **kw)[0]["lidar_points"]
    b = NuScenesDataset(use_native=False, **kw)[0]["lidar_points"]
    np.testing.assert_array_equal(a, b)


def test_native_load_lidar_rejects_bad_args(tmp_path):
    """record_floats<=0 and missing files return -1 (numpy-fallback signal)
    instead of crashing the loader process (SIGFPE on the division)."""
    import ctypes

    from bevfusion_multimodal_3d_object_detection_tpu.data.native import (
        get_lib,
    )

    lib = get_lib()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    out = np.zeros((8, 5), np.float32)
    rng6 = (ctypes.c_float * 6)(-50, -50, -5, 50, 50, 3)
    optr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    assert lib.pointprep_load_lidar(
        b"/nonexistent.bin", 5, optr, 8, 5, rng6, 0
    ) == -1
    p = tmp_path / "pts.bin"
    np.arange(20, dtype=np.float32).tofile(p)
    assert lib.pointprep_load_lidar(
        str(p).encode(), 0, optr, 8, 5, rng6, 0
    ) == -1

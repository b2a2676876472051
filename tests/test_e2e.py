"""End-to-end: synthetic pickles + real files on disk -> dataset -> training ->
eval -> metrics file (the reference's notebook-style integration path,
SURVEY.md §4)."""

import numpy as np
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    CompatFlags,
    TrainSpec,
)
from bevfusion_multimodal_3d_object_detection_tpu.data import (
    DataLoader,
    NuScenesDataset,
    SyntheticNuScenesDataset,
    collate_fn,
)
from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
    write_synthetic_infos,
)
from bevfusion_multimodal_3d_object_detection_tpu.models import (
    MultiModal3DDetector,
)
from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer
from bevfusion_multimodal_3d_object_detection_tpu.utils.metrics import (
    save_and_print_metrics,
)

from conftest import TINY_IMAGE, TINY_POINTS, TINY_RADAR_POINTS


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Synthetic pickles + camera jpgs + lidar bins on disk."""
    from PIL import Image

    root = tmp_path_factory.mktemp("nuscenes")
    write_synthetic_infos(str(root), samples_per_split=4)
    rng = np.random.RandomState(0)
    import pickle

    for split in ("train", "val", "test"):
        with open(root / f"nuscenes_infos_{split}.pkl", "rb") as f:
            data = pickle.load(f)
        for info in data["infos"]:
            # lidar: 5-float records like real nuScenes
            pts = rng.randn(600, 5).astype(np.float32) * 10
            pts.tofile(info["lidar_path"])
            for cam in info["cams"].values():
                img = Image.fromarray(
                    rng.randint(0, 255, (36, 60, 3), np.uint8)
                )
                img.save(root / cam["filename"])
    return root


def test_validators_pass_on_synthetic_pickles(data_dir, tmp_path):
    from bevfusion_multimodal_3d_object_detection_tpu.data.validate import (
        ConfigDrivenDataValidator,
    )
    import yaml

    cfg = {
        "dataset": {
            "data_root": str(data_dir),
            "classes": list(
                __import__(
                    "bevfusion_multimodal_3d_object_detection_tpu.config",
                    fromlist=["DEFAULT_CLASSES"],
                ).DEFAULT_CLASSES
            ),
            "cameras": {"names": []},
            "radars": {"names": []},
        }
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    v = ConfigDrivenDataValidator(config_path=str(cfg_path))
    assert v.validate_split("train")
    assert v.report()


def test_dataset_loads_files(data_dir):
    ds = NuScenesDataset(
        data_root=str(data_dir),
        split="train",
        max_points=TINY_POINTS,
        max_radar_points=TINY_RADAR_POINTS,
        image_size=TINY_IMAGE,
        seed=0,
    )
    sample = ds[0]
    h, w = TINY_IMAGE
    assert sample["camera_imgs"].shape == (6, h, w, 3)
    assert sample["lidar_points"].shape == (TINY_POINTS, 4)
    assert sample["radar_points"].shape == (5, TINY_RADAR_POINTS, 7)
    assert sample["gt_boxes"].shape[1] == 7
    batch = collate_fn([ds[0], ds[1]], max_objects=32)
    assert batch["gt_boxes"].shape == (2, 32, 7)
    assert (batch["gt_labels"] >= -1).all()


def test_dataset_lidar_parse_compat(data_dir):
    """Q5: default misparses 5-float records as 4 floats; corrected mode
    reads 5-float records properly."""
    compat_fix = CompatFlags(lidar_four_float_parse=False)
    ds_fix = NuScenesDataset(
        data_root=str(data_dir), split="train",
        max_points=TINY_POINTS, image_size=TINY_IMAGE, compat=compat_fix,
        seed=0,
    )
    ds_bug = NuScenesDataset(
        data_root=str(data_dir), split="train",
        max_points=TINY_POINTS, image_size=TINY_IMAGE, seed=0,
    )
    a = ds_fix[0]["lidar_points"]
    b = ds_bug[0]["lidar_points"]
    assert a.shape == b.shape == (TINY_POINTS, 4)


def test_train_eval_e2e(data_dir, tiny_spec, tmp_path):
    ds = NuScenesDataset(
        data_root=str(data_dir), split="train",
        max_points=TINY_POINTS, max_radar_points=TINY_RADAR_POINTS,
        image_size=TINY_IMAGE, seed=0,
    )
    loader = DataLoader(ds, batch_size=2, max_objects=32)
    model = MultiModal3DDetector(spec=tiny_spec)
    trainer = Trainer(model, TrainSpec(batch_size=2), CompatFlags())
    trainer.init_state(next(iter(loader)))
    avg = trainer.train_one_epoch(loader, log_every=0)
    assert np.isfinite(avg)
    metrics = trainer.evaluate(DataLoader(ds, batch_size=2, max_objects=32))
    assert 0.0 <= metrics["mAP"] <= 1.0
    out = tmp_path / "metrics_output.txt"
    save_and_print_metrics(metrics, str(out))
    assert out.exists()


def test_synthetic_dataset_shapes():
    ds = SyntheticNuScenesDataset(
        num_samples=2, image_size=TINY_IMAGE, max_points=TINY_POINTS,
        max_radar_points=TINY_RADAR_POINTS,
    )
    s = ds[0]
    assert s["camera_imgs"].shape == (6, *TINY_IMAGE, 3)
    assert s["gt_labels"].max() < 10


def test_uint8_pipeline_matches_float(data_dir, tiny_spec):
    """emit_uint8 + on-device normalization must equal the host-normalized
    float path."""
    import jax.numpy as jnp
    from bevfusion_multimodal_3d_object_detection_tpu.train.loop import (
        _model_inputs,
    )

    kw = dict(data_root=str(data_dir), split="train",
              max_points=TINY_POINTS, max_radar_points=TINY_RADAR_POINTS,
              image_size=TINY_IMAGE, seed=0)
    ds_f = NuScenesDataset(emit_uint8=False, **kw)
    ds_u = NuScenesDataset(emit_uint8=True, **kw)
    bf = collate_fn([ds_f[0]], max_objects=8)
    bu = collate_fn([ds_u[0]], max_objects=8)
    assert bu["camera_imgs"].dtype == np.uint8
    cams_f, _, _ = _model_inputs(
        tiny_spec, {k: jnp.asarray(v) for k, v in bf.items()
                    if isinstance(v, np.ndarray)}
    )
    cams_u, _, _ = _model_inputs(
        tiny_spec, {k: jnp.asarray(v) for k, v in bu.items()
                    if isinstance(v, np.ndarray)}
    )
    np.testing.assert_allclose(
        np.asarray(cams_u), np.asarray(cams_f), atol=1e-5
    )


def test_read_radar_pcd_binary(tmp_path):
    """Corrected-Q4 path: parse a synthetic binary PCD with nuScenes-style
    fields."""
    from bevfusion_multimodal_3d_object_detection_tpu.data.dataset import (
        read_radar_pcd,
    )

    n = 7
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z dyn_prop id rcs vx vy\n"
        "SIZE 4 4 4 1 2 4 4 4\n"
        "TYPE F F F I I F F F\n"
        "COUNT 1 1 1 1 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\n"
        "DATA binary\n"
    ).encode("ascii")
    rng = np.random.RandomState(0)
    rec = np.zeros(
        n,
        dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"), ("dyn_prop", "i1"),
               ("id", "i2"), ("rcs", "f4"), ("vx", "f4"), ("vy", "f4")],
    )
    for name in ("x", "y", "z", "rcs", "vx", "vy"):
        rec[name] = rng.randn(n).astype(np.float32)
    path = tmp_path / "radar.pcd"
    path.write_bytes(header + rec.tobytes())

    out = read_radar_pcd(path, max_points=16)
    assert out.shape == (16, 7)
    np.testing.assert_allclose(out[:n, 0], rec["x"], atol=1e-6)
    np.testing.assert_allclose(out[:n, 3], rec["vx"], atol=1e-6)
    np.testing.assert_allclose(out[:n, 5], rec["rcs"], atol=1e-6)
    np.testing.assert_array_equal(out[n:], 0.0)
    # unreadable file -> zeros, no crash
    bad = read_radar_pcd(tmp_path / "missing.pcd", max_points=4)
    np.testing.assert_array_equal(bad, 0.0)


def test_dataloader_num_workers_equivalence(data_dir):
    """Threaded sample fetching must produce the same batches as serial."""
    kw = dict(data_root=str(data_dir), split="train",
              max_points=TINY_POINTS, max_radar_points=TINY_RADAR_POINTS,
              image_size=TINY_IMAGE, seed=0)
    a = list(DataLoader(NuScenesDataset(**kw), batch_size=2,
                        max_objects=16, num_workers=0, prefetch=0))
    b = list(DataLoader(NuScenesDataset(**kw), batch_size=2,
                        max_objects=16, num_workers=4, prefetch=2))
    assert len(a) == len(b)
    np.testing.assert_array_equal(
        a[0]["camera_imgs"], b[0]["camera_imgs"]
    )
    np.testing.assert_array_equal(a[0]["gt_boxes"], b[0]["gt_boxes"])
    # per-sample derived RNG: radar dummies identical across worker counts
    np.testing.assert_array_equal(
        a[0]["radar_points"], b[0]["radar_points"]
    )
    np.testing.assert_array_equal(
        a[0]["lidar_points"], b[0]["lidar_points"]
    )

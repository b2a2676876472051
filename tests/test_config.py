"""Config system: YAML parsing, modality strings, compat flags."""

from pathlib import Path

import pytest

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    CompatFlags,
    DataSpec,
    DetectorSpec,
    TrainSpec,
    load_config,
    parse_modalities,
)

CONFIG_PATH = Path(__file__).resolve().parents[1] / "configs" / "base.yaml"


def test_parse_modalities():
    assert parse_modalities("camera_only") == (True, False, False)
    assert parse_modalities("lidar_only") == (False, True, False)
    assert parse_modalities("radar_only") == (False, False, True)
    assert parse_modalities("camera+lidar") == (True, True, False)
    assert parse_modalities("camera+lidar+radar") == (True, True, True)
    assert parse_modalities("all") == (True, True, True)
    assert parse_modalities("CAMERA + LIDAR") == (True, True, False)


def test_detector_spec_from_yaml():
    cfg = load_config(str(CONFIG_PATH))
    spec = DetectorSpec.from_config(cfg)
    assert spec.use_camera and spec.use_lidar and spec.use_radar
    assert spec.fusion_type == "bev"
    assert spec.head_is_centernet
    assert spec.num_classes == 10
    assert spec.bev.bev_h == 50 and spec.bev.bev_w == 50
    assert spec.camera.backbone == "resnet18"
    assert spec.lidar.mlp_layers == (64, 128, 256, 512, 1024)
    assert spec.radar.num_radars == 5
    assert spec.camera.image_size == (448, 800)


def test_spec_is_hashable_jit_static():
    cfg = load_config(str(CONFIG_PATH))
    spec = DetectorSpec.from_config(cfg)
    assert hash(spec) == hash(DetectorSpec.from_config(cfg))


def test_modality_override():
    cfg = load_config(str(CONFIG_PATH))
    spec = DetectorSpec.from_config(cfg, modality_config="camera_only")
    assert spec.use_camera and not spec.use_lidar and not spec.use_radar
    assert spec.modality_string() == "camera"


def test_mlp_head_forced_for_non_spatial_fusion():
    cfg = load_config(str(CONFIG_PATH))
    spec = DetectorSpec.from_config(cfg, fusion_type="attention")
    assert not spec.head_is_centernet  # ref: fusion.py:1074-1088


def test_compat_defaults_are_reference_behavior():
    flags = CompatFlags()
    assert flags.decode_class_always_zero
    assert flags.double_sigmoid_focal
    assert flags.eval_decode_voxel_0512
    assert flags.random_radar_points
    assert flags.constant_lr


def test_compat_from_yaml_override(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("compat:\n  decode_class_always_zero: false\n")
    flags = CompatFlags.from_config(load_config(str(p)))
    assert not flags.decode_class_always_zero
    assert flags.double_sigmoid_focal  # untouched default


def test_train_spec_from_yaml():
    cfg = load_config(str(CONFIG_PATH))
    ts = TrainSpec.from_config(cfg)
    assert ts.learning_rate == pytest.approx(1e-4)
    assert ts.weight_decay == pytest.approx(0.01)
    assert ts.grad_clip_norm == 10.0
    assert ts.batch_size == 4
    assert ts.seed == 42


def test_data_spec_from_yaml():
    cfg = load_config(str(CONFIG_PATH))
    ds = DataSpec.from_config(cfg)
    assert ds.max_lidar_points == 35000
    assert ds.max_radar_points == 125
    assert ds.image_size == (448, 800)
    assert len(ds.classes) == 10


def test_loss_weights_quirk_flag(tmp_path):
    """Q7: train.loss_weights ignored by default; honored when the compat
    flag is disabled."""
    import yaml

    cfg = {
        "train": {"loss_weights": {"heatmap": 2.0, "offset": 3.0,
                                   "size": 0.5, "rotation": 0.25,
                                   "velocity": 0.7}},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    ts = TrainSpec.from_config(load_config(str(p)))
    assert ts.loss_weights == (1.0, 1.0, 1.0, 1.0, 0.1)  # ctor defaults

    cfg["compat"] = {"ignore_config_loss_weights": False}
    p.write_text(yaml.safe_dump(cfg))
    ts = TrainSpec.from_config(load_config(str(p)))
    assert ts.loss_weights == (2.0, 3.0, 0.5, 0.25, 0.7)


def test_warmup_schedule_wiring(tmp_path):
    """Corrected Q6: with constant_lr disabled + warmup enabled the optimizer
    LR ramps from initial_lr before the cosine decay."""
    import yaml

    from bevfusion_multimodal_3d_object_detection_tpu.train.loop import (
        make_optimizer,
    )

    cfg = {
        "train": {
            "optimizer": {"lr": 1e-3},
            "lr_scheduler": {"type": "CosineAnnealingLR", "T_max": 10},
            "warmup": {"enable": True, "epochs": 2, "initial_lr": 1e-5},
        },
        "compat": {"constant_lr": False},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    ts = TrainSpec.from_config(load_config(str(p)))
    assert ts.warmup_epochs == 2
    # steps_per_epoch=10 -> 20 warmup steps
    tx = make_optimizer(ts, CompatFlags(constant_lr=False), steps_per_epoch=10)
    import jax.numpy as jnp

    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    # first update is near the warmup initial lr, far below peak
    updates, state = tx.update(grads, state, params)
    first_step = abs(float(updates["w"][0]))
    assert first_step < 2e-4  # << peak 1e-3


def test_mixed_precision_quirk_flag(tmp_path):
    """train.mixed_precision.enable is declared true in the reference config
    but never read there; honored only when the compat flag is disabled."""
    import yaml

    cfg = {"train": {"mixed_precision": {"enable": True}}}
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    assert not TrainSpec.from_config(load_config(str(p))).mixed_precision

    cfg["compat"] = {"ignore_mixed_precision": False}
    p.write_text(yaml.safe_dump(cfg))
    assert TrainSpec.from_config(load_config(str(p))).mixed_precision


def test_parallel_spec_round3_keys():
    """parallel.shard_optimizer (ZeRO-1) and parallel.bev_spatial parse with
    reference-safe defaults."""
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        ParallelSpec,
    )

    assert ParallelSpec.from_config({}).shard_optimizer is False
    assert ParallelSpec.from_config({}).bev_spatial is False
    p = ParallelSpec.from_config(
        {"parallel": {"shard_optimizer": True, "bev_spatial": True,
                      "data_parallel": 4, "view_parallel": 2}}
    )
    assert p.shard_optimizer and p.bev_spatial
    assert (p.data_parallel, p.view_parallel) == (4, 2)


def test_compat_unknown_key_raises():
    """A typo'd quirk switch must not silently keep reference behavior."""
    import pytest

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
    )

    with pytest.raises(ValueError, match="double_sigmoid"):
        CompatFlags.from_config({"compat": {"double_sigmoid": False}})
    # known keys still parse
    c = CompatFlags.from_config(
        {"compat": {"double_sigmoid_focal": False}}
    )
    assert not c.double_sigmoid_focal


def test_multi_host_false_shorthand_beats_dead_reference_block():
    """`parallel: {multi_host: false}` must survive parsing (was eaten by
    `or {}`) and override the reference's dead hardware.gpu.distributed
    block even when a coordinator env var leaks in."""
    import os

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        ParallelSpec,
    )

    cfg = {
        "parallel": {"multi_host": False},
        "hardware": {"gpu": {"distributed": {"enable": True}}},
    }
    old = os.environ.get("JAX_COORDINATOR_ADDRESS")
    os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:9999"
    try:
        assert ParallelSpec.from_config(cfg).multi_host is False
    finally:
        if old is None:
            os.environ.pop("JAX_COORDINATOR_ADDRESS", None)
        else:
            os.environ["JAX_COORDINATOR_ADDRESS"] = old


def test_null_max_points_key():
    """`dataset: {max_points:}` (present but null) falls back to encoder
    defaults instead of AttributeError."""
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        DetectorSpec,
    )

    spec = DetectorSpec.from_config({"dataset": {"max_points": None}})
    assert spec.lidar.max_points == 35000


def test_converter_class_name_q20():
    """Substring matching (reference behavior) cannot map two real nuScenes
    categories; the corrected aliases are one switch away (Q20)."""
    from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
        ConfigDrivenNuScenesConverter,
    )

    class _C:  # _get_class_name only touches these attributes
        classes = ["car", "traffic_cone", "construction_vehicle"]

    c = _C()
    c.substring_class_matching = True  # reference behavior
    get = ConfigDrivenNuScenesConverter._get_class_name
    assert get(c, "vehicle.car") == "car"
    assert get(c, "movable_object.trafficcone") == "unknown"  # Q20
    assert get(c, "vehicle.construction") == "unknown"  # Q20
    c.substring_class_matching = False  # corrected
    assert get(c, "movable_object.trafficcone") == "traffic_cone"
    assert get(c, "vehicle.construction") == "construction_vehicle"
    assert get(c, "vehicle.car") == "car"


def test_make_mesh_validates_shape():
    import pytest

    from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
        make_mesh,
    )

    with pytest.raises(ValueError, match="view_parallel"):
        make_mesh(n_view=1024)
    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_data=1024, n_view=1)

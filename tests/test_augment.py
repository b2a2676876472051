"""Device-side augmentations (corrected Q14 path) — geometric consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    AugmentSpec,
    CompatFlags,
    TrainSpec,
    load_config,
)
from bevfusion_multimodal_3d_object_detection_tpu.ops.augment import (
    augment_batch,
    color_jitter,
    lidar_flip_scale,
    radar_noise,
)


def test_augment_spec_from_yaml():
    import pathlib

    cfg = load_config(
        str(pathlib.Path(__file__).parents[1] / "configs" / "base.yaml")
    )
    a = AugmentSpec.from_config(cfg)
    assert a.brightness == 0.2 and a.noise_std == 0.01
    assert a.scale_min == 0.95 and a.scale_max == 1.05


def test_lidar_flip_scale_consistency():
    """Flipped/scaled boxes must still sit on top of their flipped/scaled
    points."""
    key = jax.random.PRNGKey(0)
    pts = jnp.asarray([[[3.0, 4.0, 1.0, 0.5]]] * 4)  # (4, 1, 4)
    boxes = jnp.asarray([[[3.0, 4.0, 1.0, 2.0, 2.0, 2.0, 0.7]]] * 4)
    new_pts, new_boxes = lidar_flip_scale(key, pts, boxes)
    # centers track points exactly under the same transform
    np.testing.assert_allclose(
        np.asarray(new_pts[..., :3]), np.asarray(new_boxes[..., :3]),
        atol=1e-6,
    )
    # scale stays within the configured range
    ratio = np.asarray(new_boxes[..., 3] / 2.0)
    assert (ratio >= 0.95 - 1e-6).all() and (ratio <= 1.05 + 1e-6).all()
    # yaw sign flips exactly when y flips
    y_sign = np.sign(np.asarray(new_boxes[..., 1]))
    yaw_sign = np.sign(np.asarray(new_boxes[..., 6]))
    np.testing.assert_array_equal(y_sign, yaw_sign * np.sign(0.7) * np.sign(4.0))


def test_color_jitter_changes_images_boundedly():
    key = jax.random.PRNGKey(1)
    imgs = jnp.ones((2, 1, 4, 4, 3)) * 0.5
    out = color_jitter(key, imgs)
    assert out.shape == imgs.shape
    assert not np.allclose(np.asarray(out), 0.5)
    assert np.abs(np.asarray(out)).max() < 2.0


def test_radar_noise_magnitude_and_padding():
    """Noise lands on valid rows only: zero-padded rows must stay exactly
    zero (the encoders' validity mask keys off all-zero rows; noising the
    padding fabricates near-origin returns under masked-max)."""
    key = jax.random.PRNGKey(2)
    r = np.zeros((1, 5, 8, 7), np.float32)
    r[0, :, :4] = 1.0  # first 4 rows valid, rest padding
    out = np.asarray(radar_noise(key, jnp.asarray(r), noise_std=0.01))
    assert 0.0 < np.abs(out[0, :, :4] - 1.0).max() < 0.1
    np.testing.assert_array_equal(out[0, :, 4:], 0.0)


def test_flip_scale_scene_radar_consistency():
    """The y-flip/scale transforms radar geometry (y, vy, x/z scale) with
    the SAME per-sample draw as lidar+boxes — radar must not see the
    unmirrored scene (flip sign recoverable from the lidar points)."""
    from bevfusion_multimodal_3d_object_detection_tpu.ops.augment import (
        flip_scale_scene,
    )

    key = jax.random.PRNGKey(4)
    b = 8
    pts = jnp.broadcast_to(
        jnp.asarray([3.0, 4.0, 1.0, 0.5]), (b, 1, 4)
    )
    boxes = jnp.broadcast_to(
        jnp.asarray([3.0, 4.0, 1.0, 2.0, 2.0, 2.0, 0.7, 1.0, 2.0]),
        (b, 1, 9),
    )
    radar = jnp.broadcast_to(
        jnp.asarray([6.0, 8.0, 0.5, 1.0, 2.0, 0.1, 0.0]), (b, 2, 1, 7)
    )
    new_pts, new_boxes, new_radar = flip_scale_scene(
        key, pts, boxes, radar
    )
    sign = np.sign(np.asarray(new_pts[:, 0, 1]) / 4.0)  # per-sample flip
    scale = np.asarray(new_pts[:, 0, 0]) / 3.0
    assert (sign < 0).any() and (sign > 0).any()  # both branches sampled
    for r_sensor in range(2):
        rr = np.asarray(new_radar[:, r_sensor, 0])
        np.testing.assert_allclose(rr[:, 0], 6.0 * scale, rtol=1e-6)
        np.testing.assert_allclose(
            rr[:, 1], 8.0 * scale * sign, rtol=1e-6
        )
        np.testing.assert_allclose(rr[:, 3], 1.0 * scale, rtol=1e-6)
        np.testing.assert_allclose(
            rr[:, 4], 2.0 * scale * sign, rtol=1e-6
        )
        np.testing.assert_allclose(rr[:, 5], 0.1, rtol=1e-6)  # rcs untouched
    # boxes velocities transformed identically
    np.testing.assert_allclose(
        np.asarray(new_boxes[:, 0, 8]), 2.0 * scale * sign, rtol=1e-6
    )


def test_augment_modalities_geometry_frozen():
    """geometry_frozen (geometric camera-to-BEV) skips the flip/scale but
    keeps photometric jitter and radar noise."""
    from bevfusion_multimodal_3d_object_detection_tpu.ops.augment import (
        augment_modalities,
    )

    key = jax.random.PRNGKey(5)
    aug = AugmentSpec()
    cams = jnp.full((2, 6, 4, 4, 3), 0.5)
    lidar = jnp.ones((2, 16, 4))
    radar = jnp.ones((2, 5, 8, 7))
    boxes = jnp.ones((2, 4, 7))
    c2, l2, r2, b2 = augment_modalities(
        key, cams, lidar, radar, boxes, aug, geometry_frozen=True
    )
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(lidar))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(boxes))
    assert not np.allclose(np.asarray(c2), 0.5)  # jitter applied
    assert not np.allclose(np.asarray(r2), 1.0)  # noise applied


def test_augment_batch_keys():
    key = jax.random.PRNGKey(3)
    batch = {
        "camera_imgs": jnp.zeros((2, 6, 4, 4, 3)),
        "lidar_points": jnp.ones((2, 16, 4)),
        "radar_points": jnp.zeros((2, 5, 8, 7)),
        "gt_boxes": jnp.ones((2, 4, 7)),
        "gt_labels": jnp.zeros((2, 4), jnp.int32),
    }
    out = augment_batch(key, batch)
    assert set(out) == set(batch)
    np.testing.assert_array_equal(
        np.asarray(out["gt_labels"]), np.asarray(batch["gt_labels"])
    )


def test_train_step_with_augmentation(tiny_spec):
    """Corrected-Q14 train step runs and produces finite loss."""
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer
    from conftest import tiny_batch

    model = MultiModal3DDetector(spec=tiny_spec)
    trainer = Trainer(
        model,
        TrainSpec(batch_size=2),
        CompatFlags(skip_augmentation=False),
        augment=AugmentSpec(),
    )
    batch = tiny_batch()
    trainer.init_state(batch)
    state, losses = trainer.train_step(trainer.state, batch, trainer.rng)
    assert np.isfinite(float(losses["total_loss"]))

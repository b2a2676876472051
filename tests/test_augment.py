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


def test_radar_noise_magnitude():
    key = jax.random.PRNGKey(2)
    r = jnp.zeros((1, 5, 8, 7))
    out = radar_noise(key, r, noise_std=0.01)
    assert 0.0 < np.abs(np.asarray(out)).max() < 0.1


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

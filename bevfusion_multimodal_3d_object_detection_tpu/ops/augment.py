"""Device-side training augmentations (jit-compiled, per-batch).

The reference DECLARES augmentation in config (configs/base.yaml:86-114:
camera color jitter, LiDAR random flip/scale, radar noise) but never applies
any of it (quirk Q14 — the dataset only resizes+normalizes,
train_detect.py:123-145). This module is the corrected path: pure functions
over a batch + rng key, run on device inside the jitted train step.

Geometric consistency: LiDAR flips/scales are applied to the points AND the
GT boxes (centers, yaw) together — flipping only one would corrupt targets.
Camera jitter is photometric only (the pseudo-BEV camera branch carries no
geometry, so image flips would NOT be label-consistent; they are deliberately
not offered).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def color_jitter(
    key: jax.Array,
    images: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
) -> jnp.ndarray:
    """Per-sample brightness/contrast/saturation jitter on NORMALIZED images
    (..., H, W, 3). Factors are sampled per batch row like torchvision
    ColorJitter's uniform [1-x, 1+x] ranges."""
    b = images.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    shape = (b,) + (1,) * (images.ndim - 1)
    f_b = jax.random.uniform(
        kb, shape, minval=1 - brightness, maxval=1 + brightness
    )
    f_c = jax.random.uniform(
        kc, shape, minval=1 - contrast, maxval=1 + contrast
    )
    f_s = jax.random.uniform(
        ks, shape, minval=1 - saturation, maxval=1 + saturation
    )
    x = images * f_b
    mean = jnp.mean(x, axis=(-3, -2, -1), keepdims=True)
    x = (x - mean) * f_c + mean
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * f_s + gray
    return x


@partial(jax.jit, static_argnames=("scale_min", "scale_max"))
def lidar_flip_scale(
    key: jax.Array,
    points: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    scale_min: float = 0.95,
    scale_max: float = 1.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random y-flip (p=0.5, per sample) + global scale, applied consistently
    to points (B, N, C>=3) and boxes (B, M, 7+) [x,y,z,w,l,h,yaw(,vx,vy)]."""
    b = points.shape[0]
    kf, ks = jax.random.split(key)
    flip = jax.random.bernoulli(kf, 0.5, (b,))  # flip across the x axis (y -> -y)
    scale = jax.random.uniform(ks, (b,), minval=scale_min, maxval=scale_max)

    sign = jnp.where(flip, -1.0, 1.0)[:, None]
    s = scale[:, None]

    pts = points
    pts = pts.at[..., 1].multiply(sign)
    pts = pts.at[..., 0:3].multiply(s[..., None])

    boxes = gt_boxes
    boxes = boxes.at[..., 1].multiply(sign)
    boxes = boxes.at[..., 0:3].multiply(s[..., None])
    boxes = boxes.at[..., 3:6].multiply(s[..., None])
    # y-flip negates yaw
    boxes = boxes.at[..., 6].multiply(sign)
    if boxes.shape[-1] > 7:
        boxes = boxes.at[..., 8].multiply(sign)  # vy
        boxes = boxes.at[..., 7:9].multiply(s[..., None])
    return pts, boxes


def radar_noise(
    key: jax.Array, radar_points: jnp.ndarray, noise_std: float = 0.01
) -> jnp.ndarray:
    """Additive gaussian noise on radar returns (B, R, N, C)."""
    return radar_points + noise_std * jax.random.normal(
        key, radar_points.shape, radar_points.dtype
    )


def augment_batch(
    key: jax.Array,
    batch: Dict[str, jnp.ndarray],
    camera_enable: bool = True,
    lidar_enable: bool = True,
    radar_enable: bool = True,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    scale_min: float = 0.95,
    scale_max: float = 1.05,
    noise_std: float = 0.01,
) -> Dict[str, jnp.ndarray]:
    """Apply the config-declared augmentations to a device batch."""
    kc, kl, kr = jax.random.split(key, 3)
    out = dict(batch)
    if camera_enable and "camera_imgs" in out:
        out["camera_imgs"] = color_jitter(
            kc, out["camera_imgs"], brightness, contrast, saturation
        )
    if lidar_enable and "lidar_points" in out and "gt_boxes" in out:
        out["lidar_points"], out["gt_boxes"] = lidar_flip_scale(
            kl, out["lidar_points"], out["gt_boxes"], scale_min, scale_max
        )
    if radar_enable and "radar_points" in out:
        out["radar_points"] = radar_noise(kr, out["radar_points"], noise_std)
    return out

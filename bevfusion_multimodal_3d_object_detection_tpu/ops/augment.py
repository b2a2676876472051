"""Device-side training augmentations (jit-compiled, per-batch).

The reference DECLARES augmentation in config (configs/base.yaml:86-114:
camera color jitter, LiDAR random flip/scale, radar noise) but never applies
any of it (quirk Q14 — the dataset only resizes+normalizes,
train_detect.py:123-145). This module is the corrected path: pure functions
over a batch + rng key, run on device inside the jitted train step.

Geometric consistency: the y-flip / global scale is applied to the WHOLE
scene — LiDAR points, radar returns (x, y, z, vx, vy carry real geometry,
data/dataset.py radar channels), and GT boxes (centers, yaw, velocities) —
from ONE per-sample draw; transforming only one modality would anti-correlate
the others with the flipped targets. Camera jitter is photometric only: the
pseudo-BEV camera branch carries no geometry, so image flips would NOT be
label-consistent (deliberately not offered), and for `camera_to_bev:
geometric` the flip/scale is skipped entirely by the train step (the frustum
plans are calibration constants that cannot be co-transformed on device —
see train/loop.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

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
def flip_scale_scene(
    key: jax.Array,
    points: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    radar_points: Optional[jnp.ndarray] = None,
    scale_min: float = 0.95,
    scale_max: float = 1.05,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Random y-flip (p=0.5, per sample) + global scale from ONE draw,
    applied consistently to LiDAR points (B, N, C>=3), boxes (B, M, 7+)
    [x,y,z,w,l,h,yaw(,vx,vy)], and (optionally) radar returns
    (B, R, N, C>=5) [x,y,z,vx,vy,...]. Zero-padded rows stay exactly zero
    (multiplicative transform), preserving the validity-mask invariant."""
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

    radar = radar_points
    if radar is not None:
        # radar is (B, R, N, C): broadcast the per-sample draw over sensors
        r_sign = sign[:, :, None]  # (B, 1, 1)
        r_s = s[:, :, None, None]  # (B, 1, 1, 1)
        radar = radar.at[..., 1].multiply(r_sign)  # y
        radar = radar.at[..., 0:3].multiply(r_s)  # x, y, z
        if radar.shape[-1] > 4:
            radar = radar.at[..., 4].multiply(r_sign)  # vy
            radar = radar.at[..., 3:5].multiply(r_s)  # vx, vy
    return pts, boxes, radar


def lidar_flip_scale(
    key: jax.Array,
    points: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    scale_min: float = 0.95,
    scale_max: float = 1.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LiDAR+boxes-only view of `flip_scale_scene` (kept for callers without
    radar)."""
    pts, boxes, _ = flip_scale_scene(
        key, points, gt_boxes, None,
        scale_min=scale_min, scale_max=scale_max,
    )
    return pts, boxes


def radar_noise(
    key: jax.Array, radar_points: jnp.ndarray, noise_std: float = 0.01
) -> jnp.ndarray:
    """Additive gaussian noise on radar returns (B, R, N, C), applied ONLY
    to valid (any-nonzero) rows: batches are zero-padded to
    max_radar_points and the encoders' validity mask keys off all-zero
    rows (models/encoders.py points_validity_mask) — noising the padding
    would turn it into phantom near-origin returns under masked-max."""
    valid = jnp.any(radar_points != 0, axis=-1, keepdims=True)
    noise = noise_std * jax.random.normal(
        key, radar_points.shape, radar_points.dtype
    )
    return radar_points + jnp.where(valid, noise, 0)


def augment_modalities(
    key: jax.Array,
    cams: Optional[jnp.ndarray],
    lidar: Optional[jnp.ndarray],
    radar: Optional[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    aug,
    geometry_frozen: bool = False,
):
    """The canonical augmentation dispatch: ONE place deciding which
    transform touches which modality (the jitted train step calls this;
    `augment_batch` wraps it for dict batches).

    aug: an AugmentSpec-like object (camera_enable/lidar_enable/
    radar_enable, brightness/contrast/saturation, scale_min/scale_max,
    noise_std). geometry_frozen=True skips the flip/scale entirely —
    set when a modality whose geometry CANNOT be co-transformed is in
    play (geometric camera-to-BEV: the frustum plans are calibration
    constants precomputed on host).
    Returns (cams, lidar, radar, gt_boxes)."""
    kc, kl, kr = jax.random.split(key, 3)
    if cams is not None and aug.camera_enable:
        cams = color_jitter(
            kc, cams, aug.brightness, aug.contrast, aug.saturation
        )
    if (
        lidar is not None
        and aug.lidar_enable
        and not geometry_frozen
    ):
        lidar, gt_boxes, radar = flip_scale_scene(
            kl, lidar, gt_boxes, radar,
            scale_min=aug.scale_min, scale_max=aug.scale_max,
        )
    if radar is not None and aug.radar_enable:
        radar = radar_noise(kr, radar, aug.noise_std)
    return cams, lidar, radar, gt_boxes


class _AugParams:
    def __init__(self, **kw):
        self.__dict__.update(kw)


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
    """Apply the config-declared augmentations to a device batch (dict
    view over `augment_modalities`)."""
    aug = _AugParams(
        camera_enable=camera_enable, lidar_enable=lidar_enable,
        radar_enable=radar_enable, brightness=brightness,
        contrast=contrast, saturation=saturation,
        scale_min=scale_min, scale_max=scale_max, noise_std=noise_std,
    )
    out = dict(batch)
    cams, lidar, radar, boxes = augment_modalities(
        key,
        out.get("camera_imgs"),
        out.get("lidar_points") if "gt_boxes" in out else None,
        out.get("radar_points"),
        out.get("gt_boxes", jnp.zeros((1, 1, 7))),
        aug,
    )
    if cams is not None:
        out["camera_imgs"] = cams
    if lidar is not None:
        out["lidar_points"] = lidar
        out["gt_boxes"] = boxes
    if radar is not None:
        out["radar_points"] = radar
    return out

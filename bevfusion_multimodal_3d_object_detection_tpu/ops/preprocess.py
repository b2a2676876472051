"""Batched, jit-compiled device-side input preprocessing.

Re-expresses the reference's per-sample host preprocessing as one device
program (north star: "nuScenes-mini preprocessing ... re-expressed as a
jit-compiled, batched input pipeline"):

- `normalize_images`: uint8 RGB -> bilinear resize -> [0,1] -> ImageNet
  normalize (ref: train_detect.py:123-145 does this per image with PIL);
  here the whole (B, N_cam, h0, w0, 3) batch is resized and normalized on
  the TPU in one fused program.
- `filter_pad_points`: range filter + pack-to-front + pad/subsample with
  STATIC shapes (ref: train_detect.py:153-161, 181-189). Valid points are
  compacted with an argsort over validity (stable, order-preserving) and the
  buffer is truncated/zero-padded to `max_points`. Subsampling beyond
  capacity takes a random permutation when an rng key is given, else the
  first `max_points` valid points (deterministic).

Host alternatives also exist (`csrc/pointprep.cc` native loader); this module
is for pipelines that ship raw sensor buffers to the device and keep all math
there.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@partial(jax.jit, static_argnames=("size",))
def normalize_images(
    images: jnp.ndarray,
    size: Tuple[int, int] = (448, 800),
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
) -> jnp.ndarray:
    """(..., h0, w0, 3) uint8/float -> (..., H, W, 3) float32 normalized."""
    x = images.astype(jnp.float32) / 255.0
    h, w = size
    if x.shape[-3] != h or x.shape[-2] != w:
        out_shape = x.shape[:-3] + (h, w, 3)
        x = jax.image.resize(x, out_shape, method="linear")
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (x - m) / s


@partial(jax.jit, static_argnames=("max_points", "out_channels", "pc_range"))
def filter_pad_points(
    points: jnp.ndarray,
    max_points: int = 35000,
    out_channels: int = 4,
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, N, C) raw points -> (B, max_points, out_channels) float32:
    strict range filter (matching the reference's > / < comparisons), valid
    points packed to the front, zero padding; random subsample when a key is
    given and more than `max_points` are valid."""
    x0, y0, z0, x1, y1, z1 = pc_range
    b, n, _ = points.shape
    pts = points[..., :out_channels].astype(jnp.float32)
    valid = (
        (points[..., 0] > x0) & (points[..., 0] < x1)
        & (points[..., 1] > y0) & (points[..., 1] < y1)
        & (points[..., 2] > z0) & (points[..., 2] < z1)
    )  # (B, N)

    if key is not None:
        # random priority among valid points, invalid sink to the end
        priority = jax.random.uniform(key, (b, n))
    else:
        # stable order: original index
        priority = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.float32)[None, :], (b, n)
        ) / n
    sort_key = jnp.where(valid, priority, 2.0)  # invalid last
    order = jnp.argsort(sort_key, axis=1)  # (B, N)

    packed = jnp.take_along_axis(pts, order[..., None], axis=1)
    packed_valid = jnp.take_along_axis(valid, order, axis=1)
    packed = jnp.where(packed_valid[..., None], packed, 0.0)

    if n >= max_points:
        return packed[:, :max_points]
    pad = max_points - n
    return jnp.pad(packed, ((0, 0), (0, pad), (0, 0)))


@partial(
    jax.jit,
    static_argnames=("batch", "num_radars", "max_points", "channels"),
)
def preprocess_radar_noise(
    key: jax.Array, batch: int, num_radars: int = 5, max_points: int = 125,
    channels: int = 7,
) -> jnp.ndarray:
    """Device-side equivalent of the reference's dummy gaussian radar points
    (quirk Q4, ref: train_detect.py:173-177)."""
    return jax.random.normal(
        key, (batch, num_radars, max_points, channels), jnp.float32
    )

"""Camera-to-BEV splat: segmented scatter-add of per-pixel features into BEV
cells (BEVPool-style), plus the frustum geometry to drive it.

The reference's live camera-to-BEV op is mean-over-cameras + bilinear resize
(ref: fusion.py:233-247) — no geometry at all. This module provides the
GEOMETRIC upgrade path (north star: "camera-to-BEV splat/pooling as a
segmented scatter-add"): a lift-splat pipeline where each image feature pixel
is lifted along D discrete depths and accumulated into the BEV grid.

TPU design notes:
- the splat is a `scatter-add` over flattened cell ids — XLA lowers this to an
  efficient sorted segment-sum on TPU; shapes are fully static (out-of-range
  points are routed to a trash cell and dropped);
- the frustum->BEV cell mapping depends only on calibration, NOT on image
  content: `precompute_frustum_cells` runs once per calibration and its output
  is a constant under jit (the BEVPoolv2 trick: arxiv 2211.17111 — precompute
  indices, runtime is gather+segment-add only);
- depth weights (a small softmax head) multiply features before the splat, so
  the whole lift-splat is one einsum + one scatter-add.

`GeometricCameraBEV` (models side) consumes this; the pseudo-BEV parity mode
stays the default (configs/base.yaml `bev_fusion`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_cells",))
def bev_scatter_add(
    features: jnp.ndarray, cell_ids: jnp.ndarray, num_cells: int
) -> jnp.ndarray:
    """Segmented scatter-add: (..., P, C) features + (..., P) int cell ids
    -> (..., num_cells, C). Ids outside [0, num_cells) are dropped."""
    feat_shape = features.shape
    c = feat_shape[-1]
    flat_feat = features.reshape(-1, feat_shape[-2], c)
    flat_ids = cell_ids.reshape(-1, feat_shape[-2])
    # negative ids would WRAP under jnp indexing; push them out of bounds so
    # mode="drop" actually drops them
    flat_ids = jnp.where(flat_ids < 0, num_cells, flat_ids)

    def one(f, i):
        out = jnp.zeros((num_cells, c), f.dtype)
        return out.at[i].add(f, mode="drop")

    out = jax.vmap(one)(flat_feat, flat_ids)
    return out.reshape(feat_shape[:-2] + (num_cells, c))


def precompute_frustum_cells(
    intrinsics: np.ndarray,
    sensor2lidar_rot: np.ndarray,
    sensor2lidar_trans: np.ndarray,
    feat_hw: Tuple[int, int],
    image_hw: Tuple[int, int],
    depth_bins: np.ndarray,
    bev_hw: Tuple[int, int],
    pc_range: Tuple[float, ...],
) -> np.ndarray:
    """Map every (depth, v, u) frustum point of one camera to a flat BEV cell
    id (or -1 when out of range). Runs on host once per calibration.

    Args:
      intrinsics: (3, 3) camera matrix (at full image resolution).
      sensor2lidar_rot/trans: (3, 3), (3,) camera->LiDAR frame transform.
      feat_hw: feature map size (H', W'); image_hw: input image size.
      depth_bins: (D,) metric depths.
    Returns (D, H', W') int32 cell ids.
    """
    fh, fw = feat_hw
    ih, iw = image_hw
    d = len(depth_bins)
    # pixel centers of the feature grid, scaled to image coords
    us = (np.arange(fw) + 0.5) * (iw / fw)
    vs = (np.arange(fh) + 0.5) * (ih / fh)
    uu, vv = np.meshgrid(us, vs)  # (H', W')

    k_inv = np.linalg.inv(intrinsics)
    rays = np.stack([uu, vv, np.ones_like(uu)], axis=-1) @ k_inv.T  # (H',W',3)
    # lift along depths: camera-frame points
    pts = rays[None, :, :, :] * depth_bins[:, None, None, None]  # (D,H',W',3)
    # camera -> lidar
    pts = pts @ sensor2lidar_rot.T + sensor2lidar_trans

    x_min, y_min, _, x_max, y_max, _ = pc_range
    bh, bw = bev_hw
    vx = (x_max - x_min) / bw
    vy = (y_max - y_min) / bh
    ix = np.floor((pts[..., 0] - x_min) / vx).astype(np.int32)
    iy = np.floor((pts[..., 1] - y_min) / vy).astype(np.int32)
    valid = (ix >= 0) & (ix < bw) & (iy >= 0) & (iy < bh)
    cells = np.where(valid, iy * bw + ix, -1)
    return cells.astype(np.int32)


@partial(jax.jit, static_argnames=("num_cells",))
def lift_splat(
    features: jnp.ndarray,
    depth_logits: jnp.ndarray,
    cell_ids: jnp.ndarray,
    num_cells: int,
) -> jnp.ndarray:
    """Lift-splat one camera batch.

    features:     (B, H', W', C) image features.
    depth_logits: (B, H', W', D) per-pixel depth distribution logits.
    cell_ids:     (D, H', W') precomputed BEV cells (-1 = out of range).
    Returns (B, num_cells, C) splatted BEV features.
    """
    b, fh, fw, c = features.shape
    d = depth_logits.shape[-1]
    depth_probs = jax.nn.softmax(depth_logits, axis=-1)
    # outer product: weighted feature per depth bin
    lifted = jnp.einsum("bhwc,bhwd->bdhwc", features, depth_probs)
    lifted = lifted.reshape(b, d * fh * fw, c)
    ids = jnp.broadcast_to(cell_ids.reshape(1, -1), (b, d * fh * fw))
    # -1 ids fall outside [0, num_cells) and are dropped by the scatter
    return bev_scatter_add(lifted, ids, num_cells)

"""Vectorized, on-device CenterNet target assignment.

Replaces the reference's host-side Python double loop with per-object
tensor<->numpy round-trips (ref: centernet_target.py:170-324, esp. the
draw_gaussian round-trip at :278-280) with a single jit-compiled computation:

- per-box BEV pixel transform and 3-case CornerNet gaussian radius
  (ref: centernet_target.py:128-150) computed for all (B, M) boxes at once;
- the gaussian splat becomes a dense (B, M, H, W) evaluation max-scattered
  into the (B, H, W, C) class heatmap with one `scatter-max`
  (`.at[b, :, :, cls].max`) — no host loop, no data-dependent shapes;
- sparse regression targets (`ind`, `reg_mask`, `target_*`) are plain
  vectorized arithmetic.

Semantics match the reference exactly for valid boxes:
- integer center via truncation of non-negative pixel coords,
- radius = max(min_radius, int(gaussian_radius((l/vy, w/vx), overlap))),
- gaussian = exp(-(dx^2+dy^2) / (2*sigma^2)), sigma = (2r+1)/6, truncated to
  the |dx|<=r, |dy|<=r window, max-composited
  (ref: centernet_target.py:118-168).

Everything is NHWC: heatmap is (B, H, W, C); `ind` indexes the flattened
(H*W) axis as y*W + x (ref: centernet_target.py:285).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def gaussian_radius(
    height: jnp.ndarray,
    width: jnp.ndarray,
    min_overlap: float = 0.7,
    corrected: bool = False,
) -> jnp.ndarray:
    """CornerNet 3-case gaussian radius, elementwise over arrays
    (ref: centernet_target.py:128-150).

    The reference divides every root by 2 — the well-known upstream CornerNet
    bug where the quadratic-formula denominator should be ``2*a``. Default
    reproduces the reference (`corrected=False`); `corrected=True` uses the
    proper ``(b + sqrt(b^2-4ac)) / (2a)`` roots (compat flag
    ``corrected_gaussian_radius``). The two differ only when a != 1, i.e. for
    large boxes on fine grids (an 18 m box at voxel 0.512: ref radius 3 vs
    corrected 2)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 * b1 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2 * b2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / (2 * a2 if corrected else 2)

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3 * b3 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2 * a3 if corrected else 2)

    return jnp.minimum(jnp.minimum(r1, r2), r3)


@partial(
    jax.jit,
    static_argnames=(
        "bev_size",
        "num_classes",
        "gaussian_overlap",
        "min_radius",
        "pc_range",
        "corrected_gaussian_radius",
    ),
)
def prepare_centernet_targets(
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    pc_range: Optional[Tuple[float, ...]] = None,
    bev_size: Tuple[int, int] = (50, 50),
    num_classes: int = 10,
    gaussian_overlap: float = 0.7,
    min_radius: int = 2,
    corrected_gaussian_radius: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Dense + sparse CenterNet targets, fully on device.

    Args:
      gt_boxes:  (B, M, 7[+2]) [x, y, z, w, l, h, yaw(, vx, vy)], zero-padded.
      gt_labels: (B, M) int, -1 for padding.
      bev_size:  (H, W) output grid.

    Returns dict (NHWC / flat layouts):
      heatmap (B, H, W, C); offset (B, H, W, 2); size (B, H, W, 3);
      rot (B, H, W, 2); vel (B, H, W, 2); ind/mask/reg_mask (B, M);
      target_offset (B, M, 2); target_size (B, M, 3); target_rot (B, M, 2);
      target_vel (B, M, 2).
    """
    if pc_range is None:
        pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    h, w = bev_size
    b, m = gt_labels.shape
    x_min, y_min, _, x_max, y_max, _ = pc_range
    voxel_x = (x_max - x_min) / w
    voxel_y = (y_max - y_min) / h

    boxes = gt_boxes.astype(jnp.float32)
    labels = gt_labels.astype(jnp.int32)

    x, y = boxes[..., 0], boxes[..., 1]
    bw, bl, bh = boxes[..., 3], boxes[..., 4], boxes[..., 5]
    yaw = boxes[..., 6]

    px = (x - x_min) / voxel_x  # (B, M)
    py = (y - y_min) / voxel_y
    # Snap near-integer pixel coords before flooring: the reference computes
    # these in float64 on host (centernet_target.py:250-251), where exact
    # grid-boundary positions (e.g. world 0.0 -> pixel 25.0) land ON the
    # integer; float32 can land epsilon below it.
    # The snap never rounds UP TO the outer border (px == w would flip a
    # genuinely-inside object to invalid; the float64 reference keeps it).
    px_r = jnp.round(px)
    py_r = jnp.round(py)
    px = jnp.where((jnp.abs(px - px_r) < 1e-4) & (px_r < w), px_r, px)
    py = jnp.where((jnp.abs(py - py_r) < 1e-4) & (py_r < h), py_r, py)
    cx = jnp.floor(px).astype(jnp.int32)
    cy = jnp.floor(py).astype(jnp.int32)

    valid = (
        (labels >= 0)
        & (labels < num_classes)
        & (px >= 0)
        & (px < w)
        & (py >= 0)
        & (py < h)
    )  # (B, M)

    # Gaussian radius in heatmap pixels (box_l along y, box_w along x;
    # ref: centernet_target.py:265-271)
    radius_f = gaussian_radius(
        bl / voxel_y,
        bw / voxel_x,
        min_overlap=gaussian_overlap,
        corrected=corrected_gaussian_radius,
    )
    radius = jnp.maximum(
        jnp.asarray(min_radius, jnp.int32),
        jnp.nan_to_num(radius_f, nan=0.0).astype(jnp.int32),
    )  # int() truncation like the reference

    # ---- dense heatmap via scatter-max -------------------------------------
    diameter = 2 * radius + 1
    sigma = diameter.astype(jnp.float32) / 6.0  # (B, M)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h, w), 3)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h, w), 2)
    dx = xs - cx[:, :, None, None]  # (B, M, H, W)
    dy = ys - cy[:, :, None, None]
    within = (jnp.abs(dx) <= radius[:, :, None, None]) & (
        jnp.abs(dy) <= radius[:, :, None, None]
    )
    dist2 = (dx * dx + dy * dy).astype(jnp.float32)
    gauss = jnp.exp(-dist2 / (2.0 * sigma * sigma)[:, :, None, None])
    gauss = jnp.where(within & valid[:, :, None, None], gauss, 0.0)

    # Max-composite each object's window into its class plane. All three
    # formulations below are BITWISE identical (max reassociation is exact;
    # verified on TPU, round 5); which is fastest depends on the grid
    # (b=16, M=500 probe: 50x50 masked-max 3.05 ms vs scatter 4.10;
    # 100x100 per-class 9.00 vs scatter 9.60). Invalid/padded rows have
    # gauss == 0 everywhere, so they never beat a real contribution.
    onehot = (labels[..., None] == jnp.arange(num_classes)) & valid[..., None]
    b_ix = jnp.repeat(jnp.arange(b, dtype=jnp.int32), m)  # also scatter_dense
    if h * w <= 2500:
        # one (B, M, H, W, C) masked max over objects, C on lanes
        heatmap = jnp.max(
            jnp.where(onehot[:, :, None, None, :], gauss[..., None], 0.0),
            axis=1,
        )
    elif h * w <= 10000:
        # per-class masked max, HW on lanes (C unrolled in the trace)
        heatmap = jnp.stack(
            [
                jnp.max(
                    jnp.where(onehot[..., c][:, :, None, None], gauss, 0.0),
                    axis=1,
                )
                for c in range(num_classes)
            ],
            axis=-1,
        )
    else:
        # huge grids: one scatter-max, no x C blowup
        heatmap = jnp.zeros((b, h, w, num_classes), jnp.float32)
        cls_ix = jnp.where(valid, labels, 0).reshape(-1)
        heatmap = heatmap.at[b_ix, :, :, cls_ix].max(
            gauss.reshape(b * m, h, w), mode="drop"
        )

    # ---- sparse regression targets ------------------------------------------
    cx_c = jnp.clip(cx, 0, w - 1)
    cy_c = jnp.clip(cy, 0, h - 1)
    ind = jnp.where(valid, cy_c * w + cx_c, 0)  # (B, M)
    reg_mask = valid.astype(jnp.uint8)
    vmask = valid[..., None].astype(jnp.float32)

    target_offset = (
        jnp.stack([px - cx.astype(jnp.float32), py - cy.astype(jnp.float32)], -1)
        * vmask
    )
    target_size = jnp.stack([bw, bl, bh], -1) * vmask
    target_rot = jnp.stack([jnp.sin(yaw), jnp.cos(yaw)], -1) * vmask

    if gt_boxes.shape[-1] > 7:
        target_vel = boxes[..., 7:9] * vmask
    else:
        # 7-col boxes: velocity targets stay zero (quirk Q12,
        # ref: centernet_target.py:306-309 vs data_converter.py:215-220)
        target_vel = jnp.zeros((b, m, 2), jnp.float32)

    # ---- dense center maps (used only by the alternative DetectionLoss) -----
    # invalid/padded rows are routed OUT OF BOUNDS (cy = h) so mode="drop"
    # discards them: a zero-padded box lands in the BEV cell containing the
    # world origin, and its zero values would otherwise .set-clobber a real
    # object's dense targets in that cell. (h, not -1: negative indices
    # WRAP under jnp indexing.)
    drop_cy = jnp.where(valid, cy_c, h).reshape(-1)

    def scatter_dense(values: jnp.ndarray) -> jnp.ndarray:
        c = values.shape[-1]
        dense = jnp.zeros((b, h, w, c), jnp.float32)
        return dense.at[b_ix, drop_cy, cx_c.reshape(-1)].set(
            values.reshape(b * m, c), mode="drop"
        )

    offset_map = scatter_dense(target_offset)
    size_map = scatter_dense(target_size)
    rot_map = scatter_dense(target_rot)
    vel_map = scatter_dense(target_vel)

    return {
        "heatmap": heatmap,
        "offset": offset_map,
        "size": size_map,
        "rot": rot_map,
        "vel": vel_map,
        "ind": ind,
        "mask": reg_mask,
        "reg_mask": reg_mask,
        "target_offset": target_offset,
        "target_size": target_size,
        "target_rot": target_rot,
        "target_vel": target_vel,
    }


def prepare_centernet_targets_host(
    batch: Dict,
    pc_range: Optional[Sequence[float]] = None,
    bev_size: Tuple[int, int] = (50, 50),
    num_classes: int = 10,
    max_objects: int = 500,
    gaussian_overlap: float = 0.7,
    min_radius: int = 2,
    corrected_gaussian_radius: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Convenience wrapper taking the reference-style batch dict
    ({'gt_boxes': (B, M, 7), 'gt_labels': (B, M)}); pads M to `max_objects`
    so the jit signature is static (ref interface:
    centernet_target.py:170-186)."""
    import numpy as np

    gt_boxes = np.asarray(batch["gt_boxes"], dtype=np.float32)
    gt_labels = np.asarray(batch["gt_labels"], dtype=np.int64)
    b, m = gt_labels.shape
    if m < max_objects:
        gt_boxes = np.pad(gt_boxes, ((0, 0), (0, max_objects - m), (0, 0)))
        gt_labels = np.pad(
            gt_labels,
            ((0, 0), (0, max_objects - m)),
            constant_values=-1,
        )
    elif m > max_objects:
        gt_boxes = gt_boxes[:, :max_objects]
        gt_labels = gt_labels[:, :max_objects]
    return prepare_centernet_targets(
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        pc_range=tuple(pc_range) if pc_range is not None else None,
        bev_size=bev_size,
        num_classes=num_classes,
        gaussian_overlap=gaussian_overlap,
        min_radius=min_radius,
        corrected_gaussian_radius=corrected_gaussian_radius,
    )

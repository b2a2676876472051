"""On-device CenterNet decode: maxpool-NMS + two-stage top-K + gather + affine.

One jit-compiled kernel replacing the reference's host-looped decode
(ref: centernet_target.py:326-452 and its eval-path duplicate
fusion_detection.py:695-820):

- 3x3 maxpool NMS via `lax.reduce_window` (ref `_nms`,
  centernet_target.py:416-421),
- per-class top-K then combined top-K (ref `_topk`,
  centernet_target.py:424-452),
- gather of offset/size/rot/vel maps at peaks, pixel->world affine with a
  fixed ground-plane z = -1.0 (quirk Q15, ref: centernet_target.py:386-394),
- yaw = atan2(sin, cos) (ref: centernet_target.py:397).

No host round-trip happens until the final small (B, K, 9) tensor. Score
filtering returns a validity mask instead of ragged per-sample tensors
(static shapes for XLA); `decode_to_host` converts to the reference's
per-sample list-of-dicts.

Compat flags:
- `class_always_zero` (quirk Q1): the reference computes
  `topk_classes = topk_indices // (H*W)` AFTER the modulo, so every label is
  0 ("car") (ref: centernet_target.py:434; fusion_detection.py:802).
  Default True = reference behavior; False yields real class labels.
- `voxel_size`: training-eval uses 2.048 (centernet_target.py:389); the
  standalone eval/inference path uses 0.512 (quirk Q3,
  fusion_detection.py:757).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def heatmap_nms(heatmap: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima: (B, H, W, C) -> same shape, non-peaks zeroed."""
    hmax = jax.lax.reduce_window(
        heatmap,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return jnp.where(hmax == heatmap, heatmap, 0.0)


@partial(
    jax.jit,
    static_argnames=(
        "max_detections",
        "voxel_size",
        "pc_range",
        "class_always_zero",
    ),
)
def decode_centernet_predictions(
    predictions: Dict[str, jnp.ndarray],
    max_detections: int = 100,
    voxel_size: float = 2.048,
    pc_range: Tuple[float, ...] = DEFAULT_PC_RANGE,
    class_always_zero: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Decode NHWC CenterNet maps into fixed-size detection tensors.

    Args:
      predictions: {'heatmap': (B, H, W, C), 'offset': (B, H, W, 2),
                    'size': (B, H, W, 3), 'rot': (B, H, W, 2),
                    'vel': (B, H, W, 2)}

    Returns:
      {'boxes': (B, K, 7), 'scores': (B, K), 'labels': (B, K) int32,
       'velocities': (B, K, 2)} sorted by score descending. The caller applies
      its own score threshold (the reference uses 0.0 in eval.py:60 but 0.3 in
      inference.py:186 — quirk Q16).
    """
    heatmap = predictions["heatmap"].astype(jnp.float32)
    b, h, w, c = heatmap.shape
    k = max_detections

    heat = heatmap_nms(heatmap)

    # Stage 1: per-class top-K over the spatial axis
    # (B, H, W, C) -> (B, C, H*W)
    flat = heat.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    cls_scores, cls_idx = jax.lax.top_k(flat, k)  # (B, C, K)

    if class_always_zero:
        # Reference bug Q1: indices are already in [0, H*W), so
        # `idx // (H*W)` is identically 0 (ref: centernet_target.py:434).
        classes = jnp.zeros_like(cls_idx)
    else:
        classes = jnp.broadcast_to(
            jnp.arange(c, dtype=cls_idx.dtype)[None, :, None], cls_idx.shape
        )
    ys = cls_idx // w
    xs = cls_idx % w

    # Stage 2: combined top-K across classes
    comb_scores, comb_idx = jax.lax.top_k(cls_scores.reshape(b, c * k), k)
    take = lambda a: jnp.take_along_axis(a.reshape(b, c * k), comb_idx, axis=1)
    classes = take(classes)
    ys = take(ys)
    xs = take(xs)

    # Gather regression maps at the peaks
    flat_pos = ys * w + xs  # (B, K)

    def gather_map(m: jnp.ndarray) -> jnp.ndarray:
        mc = m.shape[-1]
        flat_m = m.reshape(b, h * w, mc)
        return jnp.take_along_axis(
            flat_m, flat_pos[..., None].astype(jnp.int32), axis=1
        )  # (B, K, mc)

    offset = gather_map(predictions["offset"].astype(jnp.float32))
    sizes = gather_map(predictions["size"].astype(jnp.float32))
    rot = gather_map(predictions["rot"].astype(jnp.float32))
    vel = gather_map(predictions["vel"].astype(jnp.float32))

    centers_x = xs.astype(jnp.float32) + offset[..., 0]
    centers_y = ys.astype(jnp.float32) + offset[..., 1]
    # voxel_size: scalar (reference behavior, square grids) or a
    # (voxel_x, voxel_y) tuple — target assignment is per-axis
    # (targets.py voxel_x/voxel_y), so decode must be too for any
    # non-square bev_h != bev_w grid or asymmetric pc_range
    if isinstance(voxel_size, (tuple, list)):
        voxel_x, voxel_y = voxel_size
    else:
        voxel_x = voxel_y = voxel_size
    world_x = centers_x * voxel_x + pc_range[0]
    world_y = centers_y * voxel_y + pc_range[1]
    world_z = jnp.full_like(world_x, -1.0)  # fixed ground plane (Q15)
    yaw = jnp.arctan2(rot[..., 0], rot[..., 1])

    boxes = jnp.stack(
        [world_x, world_y, world_z, sizes[..., 0], sizes[..., 1],
         sizes[..., 2], yaw],
        axis=-1,
    )  # (B, K, 7)

    return {
        "boxes": boxes,
        "scores": comb_scores,
        "labels": classes.astype(jnp.int32),
        "velocities": vel,
    }


def bev_iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Axis-aligned BEV IoU matrix between (N, 7+) and (M, 7+) box arrays
    ((x, y, z, w, l, h, yaw) — yaw ignored, same simplification as the
    reference evaluation's center-distance matching, utils_v2.py)."""
    ax1 = boxes_a[:, 0] - boxes_a[:, 3] / 2
    ay1 = boxes_a[:, 1] - boxes_a[:, 4] / 2
    ax2 = boxes_a[:, 0] + boxes_a[:, 3] / 2
    ay2 = boxes_a[:, 1] + boxes_a[:, 4] / 2
    bx1 = boxes_b[:, 0] - boxes_b[:, 3] / 2
    by1 = boxes_b[:, 1] - boxes_b[:, 4] / 2
    bx2 = boxes_b[:, 0] + boxes_b[:, 3] / 2
    by2 = boxes_b[:, 1] + boxes_b[:, 4] / 2
    ix = np.maximum(
        0.0,
        np.minimum(ax2[:, None], bx2[None, :])
        - np.maximum(ax1[:, None], bx1[None, :]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(ay2[:, None], by2[None, :])
        - np.maximum(ay1[:, None], by1[None, :]),
    )
    inter = ix * iy
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def nms_bev(det: Dict[str, np.ndarray], iou_thresh: float) -> Dict[str, np.ndarray]:
    """Greedy axis-aligned BEV NMS on one decode_to_host sample dict.

    Implements the reference's declared-but-dead
    `val/test.post_processing.nms_threshold` key (ref: configs/base.yaml:393,
    416 — never read; the reference's only NMS is the decode-time 3x3
    heatmap maxpool). The result is SCORE-DESCENDING regardless of input
    order, so a downstream `[:max_detections]` cap always keeps the
    top-scored survivors."""
    boxes, scores = det["boxes"], det["scores"]
    n = len(scores)
    if n <= 1:
        return det
    order = np.argsort(-scores, kind="stable")
    iou = bev_iou_matrix(boxes[order], boxes[order])
    keep_sorted = np.ones(n, bool)
    for i in range(n):
        if keep_sorted[i]:
            keep_sorted[i + 1:] &= iou[i, i + 1:] < iou_thresh
    keep = order[keep_sorted]  # already score-descending
    return {k: v[keep] for k, v in det.items()}


def decode_to_host(
    decoded: Dict[str, jnp.ndarray],
    score_thresh: float = 0.3,
    nms_thresh: float = None,
    max_detections: int = None,
) -> List[Dict[str, np.ndarray]]:
    """Convert fixed-size decode output to the reference's per-sample
    list-of-dicts with score filtering (ref: centernet_target.py:357-411).

    `nms_thresh` / `max_detections` implement the reference's declared-but-
    dead val/test.post_processing keys (configs/base.yaml:393-396) behind
    compat.ignore_post_processing_config=False; the defaults keep reference
    behavior (no IoU NMS, decode top-K only)."""
    boxes = np.asarray(decoded["boxes"])
    scores = np.asarray(decoded["scores"])
    labels = np.asarray(decoded["labels"])
    vels = np.asarray(decoded["velocities"])

    out = []
    for bi in range(boxes.shape[0]):
        m = scores[bi] > score_thresh
        det = {
            "boxes": boxes[bi][m],
            "scores": scores[bi][m],
            "labels": labels[bi][m].astype(np.int64),
            "velocities": vels[bi][m],
        }
        if nms_thresh is not None:
            det = nms_bev(det, nms_thresh)
        if max_detections is not None and len(det["scores"]) > max_detections:
            det = {k: v[:max_detections] for k, v in det.items()}
        out.append(det)
    return out

"""Pure-function losses (optax-style), jit/grad-friendly.

- `centernet_loss`: focal heatmap loss + gather-based L1 regression at object
  centers (ref: centernet_target.py:455-622). Default weights
  hm/off/size/rot = 1.0, vel = 0.1 (ref: centernet_target.py:460-466); the
  YAML `train.loss_weights` is intentionally NOT read by default — quirk Q7
  (ref: train_detect.py:739 constructs `CenterNetLoss()` with no args).
- `detection_loss`: the alternative `DetectionLoss` used with the MLP head
  (ref: centernet_target.py:13-116). Its 'heatmap' branch is dead in the
  reference (shape-incompatible dense-mask broadcast); here it is implemented
  with dense center maps so it is actually usable.
- `prepare_mlp_targets`: first-valid-object target prep
  (ref: train_detect.py:455-494).

All maps are NHWC; `ind` indexes the flattened H*W axis (y*W + x).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def focal_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 2.0,
    beta: float = 4.0,
    double_sigmoid: bool = True,
) -> jnp.ndarray:
    """CenterNet focal loss (ref: centernet_target.py:542-591).

    `double_sigmoid=True` reproduces quirk Q2: the model's heatmap is already
    sigmoided (fusion.py:871) and the reference loss applies `sigmoid` again
    (centernet_target.py:563), squeezing values into [0.5, 0.73].
    """
    if double_sigmoid:
        pred = jax.nn.sigmoid(pred)
    pred = jnp.clip(pred, 1e-4, 1 - 1e-4)

    pos_inds = (target == 1.0).astype(jnp.float32)
    neg_inds = (target < 1.0).astype(jnp.float32)
    neg_weights = jnp.power(1.0 - target, beta)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, alpha) * pos_inds
    neg_loss = (
        jnp.log(1.0 - pred) * jnp.power(pred, alpha) * neg_weights * neg_inds
    )

    num_pos = pos_inds.sum()
    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()
    return jnp.where(
        num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0)
    )


def gather_regression(pred_map: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, H, W, C) at flat indices (B, M) -> (B, M, C)
    (the reference's view/permute/gather dance, centernet_target.py:603-622)."""
    b, h, w, c = pred_map.shape
    flat = pred_map.reshape(b, h * w, c)
    return jnp.take_along_axis(
        flat, ind[..., None].astype(jnp.int32), axis=1
    )


def regression_loss(
    pred_map: jnp.ndarray,
    target: jnp.ndarray,
    ind: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked L1 at object centers; normalizer is the EXPANDED mask sum
    (num_valid * C), matching the reference (centernet_target.py:593-622)."""
    pred = gather_regression(pred_map, ind)  # (B, M, C)
    m = jnp.broadcast_to(
        mask[..., None].astype(jnp.float32), target.shape
    )
    loss = jnp.abs(pred - target) * m
    return loss.sum() / (m.sum() + 1e-4)


@partial(jax.jit, static_argnames=("weights", "double_sigmoid"))
def centernet_loss(
    predictions: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    weights: Tuple[float, float, float, float, float] = (1.0, 1.0, 1.0, 1.0, 0.1),
    double_sigmoid: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full CenterNet loss dict (ref: centernet_target.py:476-540)."""
    hm_w, off_w, size_w, rot_w, vel_w = weights
    heatmap_loss = focal_loss(
        predictions["heatmap"].astype(jnp.float32),
        targets["heatmap"],
        double_sigmoid=double_sigmoid,
    )
    ind = targets["ind"]
    mask = targets["reg_mask"]
    offset_loss = regression_loss(
        predictions["offset"].astype(jnp.float32),
        targets["target_offset"], ind, mask,
    )
    size_loss = regression_loss(
        predictions["size"].astype(jnp.float32),
        targets["target_size"], ind, mask,
    )
    rot_loss = regression_loss(
        predictions["rot"].astype(jnp.float32),
        targets["target_rot"], ind, mask,
    )
    vel_loss = regression_loss(
        predictions["vel"].astype(jnp.float32),
        targets["target_vel"], ind, mask,
    )
    total = (
        hm_w * heatmap_loss
        + off_w * offset_loss
        + size_w * size_loss
        + rot_w * rot_loss
        + vel_w * vel_loss
    )
    return {
        "total_loss": total,
        "heatmap_loss": heatmap_loss,
        "offset_loss": offset_loss,
        "size_loss": size_loss,
        "rot_loss": rot_loss,
        "vel_loss": vel_loss,
    }


def prepare_mlp_targets(
    gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
    num_classes: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """First-valid-object targets for the MLP head
    (ref: train_detect.py:455-494): label/box of the first object with
    label >= 0, else (0, zeros). When num_classes is given, out-of-range
    labels are treated as invalid like the centernet path does — XLA's
    gather would otherwise CLAMP them in the cross-entropy and silently
    train the last class (torch would raise instead)."""
    valid = gt_labels >= 0  # (B, M)
    if num_classes is not None:
        valid = valid & (gt_labels < num_classes)
    has_valid = jnp.any(valid, axis=1)
    first = jnp.argmax(valid, axis=1)  # first True (0 if none)
    b_ix = jnp.arange(gt_labels.shape[0])
    labels = jnp.where(has_valid, gt_labels[b_ix, first], 0)
    boxes = jnp.where(
        has_valid[:, None], gt_boxes[b_ix, first, :7], 0.0
    )
    return {"labels": labels.astype(jnp.int32), "boxes": boxes}


@jax.jit
def detection_loss(
    predictions: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Alternative DetectionLoss (ref: centernet_target.py:13-116).

    'cls' branch (the live one for the MLP head, train_detect.py:738-741):
    cross-entropy + L1 box loss. 'heatmap' branch: simplified focal + masked
    dense L1 (the reference variant is shape-broken and thus dead; this one
    masks with the dense center heatmap==1 positions).
    """
    losses: Dict[str, jnp.ndarray] = {}
    if "cls" in predictions:
        logits = predictions["cls"].astype(jnp.float32)
        labels = targets["labels"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        cls_loss = -jnp.mean(
            jnp.take_along_axis(logp, labels[:, None], axis=1)
        )
        box_loss = jnp.mean(
            jnp.abs(predictions["box"].astype(jnp.float32) - targets["boxes"])
        )
        losses["cls_loss"] = cls_loss
        losses["box_loss"] = box_loss
        losses["total_loss"] = cls_loss + box_loss
        return losses

    # heatmap branch
    pred_hm = predictions["heatmap"].astype(jnp.float32)
    target_hm = targets["heatmap"]
    pos_inds = (target_hm == 1.0).astype(jnp.float32)
    neg_inds = (target_hm < 1.0).astype(jnp.float32)
    neg_weights = jnp.power(1.0 - target_hm, 4)
    pos_loss = jnp.log(pred_hm + 1e-12) * jnp.power(1 - pred_hm, 2) * pos_inds
    neg_loss = (
        jnp.log(1 - pred_hm + 1e-12)
        * jnp.power(pred_hm, 2)
        * neg_weights
        * neg_inds
    )
    num_pos = pos_inds.sum()
    hm_loss = jnp.where(
        num_pos == 0,
        -neg_loss.sum(),
        -(pos_loss.sum() + neg_loss.sum()) / jnp.maximum(num_pos, 1.0),
    )
    losses["heatmap_loss"] = hm_loss
    total = hm_loss

    # dense center mask: any class has a peak at this pixel
    center_mask = jnp.max(pos_inds, axis=-1, keepdims=True)  # (B, H, W, 1)
    for key in ("offset", "size", "rot"):
        if key in predictions:
            diff = jnp.abs(
                predictions[key].astype(jnp.float32) * center_mask
                - targets[key] * center_mask
            )
            l = jnp.mean(diff)
            losses[f"{key}_loss"] = l
            total = total + l
    losses["total_loss"] = total
    return losses

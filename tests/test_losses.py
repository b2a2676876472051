"""Loss functions vs independent numpy references
(ref: centernet_target.py:455-622, :13-116)."""

import numpy as np
import jax.numpy as jnp

from bevfusion_multimodal_3d_object_detection_tpu.ops.losses import (
    centernet_loss,
    detection_loss,
    focal_loss,
    prepare_mlp_targets,
    regression_loss,
)
from bevfusion_multimodal_3d_object_detection_tpu.ops.targets import (
    prepare_centernet_targets,
)


def naive_focal(pred, target, double_sigmoid=True):
    if double_sigmoid:
        pred = 1 / (1 + np.exp(-pred))
    pred = np.clip(pred, 1e-4, 1 - 1e-4)
    pos = (target == 1).astype(float)
    neg = (target < 1).astype(float)
    nw = (1 - target) ** 4
    pl = np.log(pred) * (1 - pred) ** 2 * pos
    nl = np.log(1 - pred) * pred**2 * nw * neg
    npos = pos.sum()
    if npos == 0:
        return -nl.sum()
    return -(pl.sum() + nl.sum()) / npos


def test_focal_loss_matches_naive():
    rng = np.random.RandomState(0)
    pred = rng.rand(2, 8, 8, 3).astype(np.float32)
    target = np.zeros((2, 8, 8, 3), np.float32)
    target[0, 2, 2, 1] = 1.0
    target[0, 2, 3, 1] = 0.6
    target[1, 5, 5, 0] = 1.0
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(target)))
    want = naive_focal(pred, target)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_no_positives_branch():
    pred = np.full((1, 4, 4, 1), 0.3, np.float32)
    target = np.zeros((1, 4, 4, 1), np.float32)
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(target)))
    want = naive_focal(pred, target)
    # f32 transcendentals vs the f64 numpy reference
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_focal_single_sigmoid_flag():
    pred = np.random.RandomState(1).rand(1, 4, 4, 2).astype(np.float32)
    target = np.zeros((1, 4, 4, 2), np.float32)
    target[0, 0, 0, 0] = 1.0
    a = float(focal_loss(jnp.asarray(pred), jnp.asarray(target),
                         double_sigmoid=True))
    b = float(focal_loss(jnp.asarray(pred), jnp.asarray(target),
                         double_sigmoid=False))
    assert a != b
    np.testing.assert_allclose(
        b, naive_focal(pred, target, double_sigmoid=False), rtol=1e-5
    )


def test_regression_loss_gather_and_normalizer():
    b, h, w, c, m = 1, 4, 4, 2, 3
    pred = np.arange(b * h * w * c, dtype=np.float32).reshape(b, h, w, c)
    ind = np.array([[5, 10, 0]])
    mask = np.array([[1, 1, 0]], np.uint8)
    target = np.ones((b, m, c), np.float32)
    got = float(
        regression_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(ind),
            jnp.asarray(mask),
        )
    )
    flat = pred.reshape(b, h * w, c)
    diff = np.abs(flat[0, [5, 10]] - 1.0).sum()
    want = diff / (2 * c + 1e-4)  # normalizer = expanded mask sum
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_centernet_loss_total_weighting():
    rng = np.random.RandomState(2)
    boxes = np.zeros((1, 4, 7), np.float32)
    labels = np.full((1, 4), -1, np.int64)
    boxes[0, 0] = [5, 5, 0, 2, 4, 1.5, 0.2]
    labels[0, 0] = 2
    targets = prepare_centernet_targets(jnp.asarray(boxes), jnp.asarray(labels))
    preds = {
        "heatmap": jnp.asarray(rng.rand(1, 50, 50, 10), jnp.float32),
        "offset": jnp.asarray(rng.randn(1, 50, 50, 2), jnp.float32),
        "size": jnp.asarray(rng.rand(1, 50, 50, 3), jnp.float32),
        "rot": jnp.asarray(rng.randn(1, 50, 50, 2), jnp.float32),
        "vel": jnp.asarray(rng.randn(1, 50, 50, 2), jnp.float32),
    }
    out = centernet_loss(preds, targets)
    want = (
        out["heatmap_loss"]
        + out["offset_loss"]
        + out["size_loss"]
        + out["rot_loss"]
        + 0.1 * out["vel_loss"]
    )
    np.testing.assert_allclose(
        float(out["total_loss"]), float(want), rtol=1e-6
    )


def test_prepare_mlp_targets_first_valid():
    boxes = np.zeros((2, 3, 7), np.float32)
    labels = np.array([[-1, 4, 2], [-1, -1, -1]], np.int64)
    boxes[0, 1] = [1, 2, 3, 4, 5, 6, 7]
    t = prepare_mlp_targets(jnp.asarray(boxes), jnp.asarray(labels))
    assert int(t["labels"][0]) == 4
    np.testing.assert_allclose(np.asarray(t["boxes"])[0], boxes[0, 1])
    assert int(t["labels"][1]) == 0  # no valid -> dummy
    np.testing.assert_allclose(np.asarray(t["boxes"])[1], 0.0)


def test_detection_loss_cls_branch():
    rng = np.random.RandomState(3)
    logits = rng.randn(4, 10).astype(np.float32)
    boxes = rng.randn(4, 7).astype(np.float32)
    labels = np.array([0, 3, 9, 5])
    out = detection_loss(
        {"cls": jnp.asarray(logits), "box": jnp.asarray(boxes)},
        {"labels": jnp.asarray(labels),
         "boxes": jnp.zeros((4, 7), jnp.float32)},
    )
    # cross entropy vs scipy-free manual computation
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    ce = -logp[np.arange(4), labels].mean()
    np.testing.assert_allclose(float(out["cls_loss"]), ce, rtol=1e-5)
    np.testing.assert_allclose(
        float(out["box_loss"]), np.abs(boxes).mean(), rtol=1e-5
    )

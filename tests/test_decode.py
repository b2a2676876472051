"""Decode kernel vs. an independent numpy reimplementation of the reference
decode semantics (ref: centernet_target.py:326-452)."""

import numpy as np
import jax.numpy as jnp

from bevfusion_multimodal_3d_object_detection_tpu.ops.decode import (
    decode_centernet_predictions,
    decode_to_host,
    heatmap_nms,
)


def naive_decode(preds_nchw, k=100, voxel_size=2.048, class_bug=True):
    """Reference semantics in plain numpy. preds maps are NCHW."""
    hm = preds_nchw["heatmap"]
    b, c, h, w = hm.shape
    # 3x3 maxpool nms
    padded = np.pad(hm, ((0, 0), (0, 0), (1, 1), (1, 1)),
                    constant_values=-np.inf)
    hmax = np.stack(
        [
            np.max(
                np.stack(
                    [
                        padded[:, :, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
                        for dy in (-1, 0, 1)
                        for dx in (-1, 0, 1)
                    ]
                ),
                axis=0,
            )
        ]
    )[0]
    heat = np.where(hmax == hm, hm, 0.0)

    flat = heat.reshape(b, c, h * w)
    # per-class topk
    idx1 = np.argsort(-flat, axis=2, kind="stable")[:, :, :k]
    val1 = np.take_along_axis(flat, idx1, axis=2)
    classes = np.zeros_like(idx1) if class_bug else np.broadcast_to(
        np.arange(c)[None, :, None], idx1.shape
    ).copy()
    ys, xs = idx1 // w, idx1 % w
    # combined topk
    val1f = val1.reshape(b, c * k)
    idx2 = np.argsort(-val1f, axis=1, kind="stable")[:, :k]
    scores = np.take_along_axis(val1f, idx2, axis=1)
    take = lambda a: np.take_along_axis(a.reshape(b, c * k), idx2, axis=1)
    classes, ys, xs = take(classes), take(ys), take(xs)

    def gather(m):
        mc = m.shape[1]
        out = np.zeros((b, k, mc))
        for bi in range(b):
            # advanced indexing with a slice in between puts the index axis
            # first: result is already (K, C)
            out[bi] = m[bi, :, ys[bi], xs[bi]]
        return out

    off = gather(preds_nchw["offset"])
    size = gather(preds_nchw["size"])
    rot = gather(preds_nchw["rot"])
    cx = xs + off[..., 0]
    cy = ys + off[..., 1]
    wx = cx * voxel_size + (-51.2)
    wy = cy * voxel_size + (-51.2)
    yaw = np.arctan2(rot[..., 0], rot[..., 1])
    boxes = np.stack(
        [wx, wy, np.full_like(wx, -1.0), size[..., 0], size[..., 1],
         size[..., 2], yaw],
        axis=-1,
    )
    return boxes, scores, classes


def _random_preds(seed=0, b=2, h=50, w=50, c=10):
    rng = np.random.RandomState(seed)
    return {
        "heatmap": rng.rand(b, c, h, w).astype(np.float32),
        "offset": rng.randn(b, 2, h, w).astype(np.float32),
        "size": rng.rand(b, 3, h, w).astype(np.float32),
        "rot": rng.randn(b, 2, h, w).astype(np.float32),
        "vel": rng.randn(b, 2, h, w).astype(np.float32),
    }


def _to_nhwc(preds):
    return {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in preds.items()}


def test_decode_matches_naive():
    preds = _random_preds()
    out = decode_centernet_predictions(_to_nhwc(preds))
    boxes_ref, scores_ref, classes_ref = naive_decode(preds)
    np.testing.assert_allclose(
        np.sort(np.asarray(out["scores"]), axis=1),
        np.sort(scores_ref, axis=1),
        atol=1e-5,
    )
    # scores are sorted descending in both; compare in order
    np.testing.assert_allclose(np.asarray(out["scores"]), scores_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["boxes"]), boxes_ref, atol=1e-4)
    assert (np.asarray(out["labels"]) == 0).all()  # quirk Q1


def test_decode_corrected_classes():
    preds = _random_preds(seed=3)
    out = decode_centernet_predictions(
        _to_nhwc(preds), class_always_zero=False
    )
    _, _, classes_ref = naive_decode(preds, class_bug=False)
    np.testing.assert_array_equal(np.asarray(out["labels"]), classes_ref)


def test_decode_voxel_size_flag():
    preds = _random_preds(seed=5)
    out_train = decode_centernet_predictions(_to_nhwc(preds), voxel_size=2.048)
    out_eval = decode_centernet_predictions(_to_nhwc(preds), voxel_size=0.512)
    # same peaks, different world scaling (quirk Q3)
    bt = np.asarray(out_train["boxes"])
    be = np.asarray(out_eval["boxes"])
    np.testing.assert_allclose(
        (bt[..., 0] + 51.2) / 4.0, be[..., 0] + 51.2, atol=1e-4
    )
    # eval-path coords live in the [-51.2, -25.6) quadrant
    assert be[..., 0].max() < -25.0


def test_nms_keeps_only_local_maxima():
    hm = np.zeros((1, 5, 5, 1), np.float32)
    hm[0, 2, 2, 0] = 1.0
    hm[0, 2, 3, 0] = 0.5  # suppressed by the neighbor peak
    out = np.asarray(heatmap_nms(jnp.asarray(hm)))
    assert out[0, 2, 2, 0] == 1.0
    assert out[0, 2, 3, 0] == 0.0


def test_decode_to_host_filters_scores():
    preds = _random_preds(seed=7)
    out = decode_centernet_predictions(_to_nhwc(preds))
    host = decode_to_host(out, score_thresh=0.99)
    for det in host:
        assert (det["scores"] > 0.99).all()
        assert det["boxes"].shape[1] == 7


def test_decode_at_2x_grid():
    """BASELINE configs[4]: decode at 100x100 with the grid-derived voxel
    size (1.024 m) maps pixel centers back to world correctly."""
    rng = np.random.RandomState(11)
    hm = np.zeros((1, 100, 100, 10), np.float32)
    hm[0, 80, 30, 2] = 0.9  # one peak: y=80, x=30, class 2
    preds = {
        "heatmap": jnp.asarray(hm),
        "offset": jnp.zeros((1, 100, 100, 2)),
        "size": jnp.ones((1, 100, 100, 3)),
        "rot": jnp.asarray(
            np.tile([0.0, 1.0], (1, 100, 100, 1)).astype(np.float32)
        ),
        "vel": jnp.zeros((1, 100, 100, 2)),
    }
    out = decode_centernet_predictions(
        preds, voxel_size=1.024, class_always_zero=False
    )
    top = np.asarray(out["boxes"])[0, 0]
    assert float(np.asarray(out["scores"])[0, 0]) == np.float32(0.9)
    np.testing.assert_allclose(top[0], 30 * 1.024 - 51.2, atol=1e-4)
    np.testing.assert_allclose(top[1], 80 * 1.024 - 51.2, atol=1e-4)
    assert int(np.asarray(out["labels"])[0, 0]) == 2


class TestNMSPostProcessing:
    """Resurrected val/test.post_processing (declared-but-dead upstream,
    configs/base.yaml:393-396): greedy BEV NMS + cap in decode_to_host."""

    def _det(self, boxes, scores):
        n = len(scores)
        return {
            "boxes": np.asarray(boxes, np.float32),
            "scores": np.asarray(scores, np.float32),
            "labels": np.zeros(n, np.int64),
            "velocities": np.zeros((n, 2), np.float32),
        }

    def test_nms_suppresses_overlaps_keeps_disjoint(self):
        from bevfusion_multimodal_3d_object_detection_tpu.ops.decode import (
            nms_bev,
        )

        det = self._det(
            [
                [0.0, 0.0, 0.0, 4.0, 4.0, 1.5, 0.0],   # keeper (score .9)
                [0.5, 0.0, 0.0, 4.0, 4.0, 1.5, 0.0],   # IoU ~.78 -> dropped
                [20.0, 0.0, 0.0, 4.0, 4.0, 1.5, 0.0],  # disjoint -> kept
            ],
            [0.9, 0.8, 0.7],
        )
        out = nms_bev(det, iou_thresh=0.5)
        np.testing.assert_allclose(out["scores"], [0.9, 0.7], rtol=1e-6)
        assert out["boxes"].shape == (2, 7)
        assert out["labels"].shape == (2,)

    def test_nms_sorts_by_score_first(self):
        from bevfusion_multimodal_3d_object_detection_tpu.ops.decode import (
            nms_bev,
        )

        # higher-score box listed second must win the overlap
        det = self._det(
            [
                [0.5, 0.0, 0.0, 4.0, 4.0, 1.5, 0.0],
                [0.0, 0.0, 0.0, 4.0, 4.0, 1.5, 0.0],
            ],
            [0.3, 0.9],
        )
        out = nms_bev(det, iou_thresh=0.5)
        np.testing.assert_allclose(out["scores"], [0.9], rtol=1e-6)
        np.testing.assert_allclose(out["boxes"][0, 0], 0.0)

    def test_decode_to_host_nms_and_cap(self):
        from bevfusion_multimodal_3d_object_detection_tpu.ops.decode import (
            decode_to_host,
        )

        k = 6
        boxes = np.zeros((1, k, 7), np.float32)
        boxes[0, :, 3:6] = 4.0
        boxes[0, :, 0] = [0.0, 0.5, 20.0, 40.0, 60.0, 80.0]
        decoded = {
            "boxes": boxes,
            "scores": np.linspace(0.9, 0.4, k, dtype=np.float32)[None],
            "labels": np.zeros((1, k), np.int32),
            "velocities": np.zeros((1, k, 2), np.float32),
        }
        dets = decode_to_host(
            decoded, score_thresh=0.45, nms_thresh=0.5, max_detections=3
        )
        # thresh drops the 0.4 det; NMS drops the 0.5-offset overlap;
        # the cap keeps the top 3 of the 4 survivors
        np.testing.assert_allclose(dets[0]["scores"], [0.9, 0.7, 0.6])

    def test_post_process_spec_from_config(self):
        from bevfusion_multimodal_3d_object_detection_tpu.config import (
            CompatFlags,
            PostProcessSpec,
        )

        cfg = {
            "val": {"post_processing": {"score_threshold": 0.25,
                                        "nms_threshold": 0.6,
                                        "max_detections": 42}},
            "compat": {"ignore_post_processing_config": False},
        }
        pp = PostProcessSpec.from_config(cfg, "val")
        assert (pp.score_threshold, pp.nms_threshold, pp.max_detections) == (
            0.25, 0.6, 42,
        )
        assert PostProcessSpec.from_config({}, "test") == PostProcessSpec()
        assert not CompatFlags.from_config(cfg).ignore_post_processing_config
        assert CompatFlags.from_config({}).ignore_post_processing_config


def test_decode_per_axis_voxel_nonsquare_grid():
    """Decode with a (voxel_x, voxel_y) tuple inverts targets.py's per-axis
    pixel mapping on a NON-SQUARE grid — the scalar voxel_size doubled
    world-y on a bev_h != bev_w grid."""
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.ops.targets import (
        prepare_centernet_targets,
    )

    h, w, c = 100, 50, 3  # voxel_y = 1.024, voxel_x = 2.048
    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    gt = np.zeros((1, 1, 7), np.float32)
    gt[0, 0] = [10.0, -20.0, -1.0, 2.0, 4.0, 1.5, 0.3]
    labels = np.array([[1]], np.int64)
    t = prepare_centernet_targets(
        jnp.asarray(gt), jnp.asarray(labels), bev_size=(h, w),
        num_classes=c, pc_range=pc_range,
    )
    preds = {
        "heatmap": np.zeros((1, h, w, c), np.float32),
        "offset": np.asarray(t["offset"]),
        "size": np.asarray(t["size"]),
        "rot": np.asarray(t["rot"]),
        "vel": np.asarray(t["vel"]),
    }
    ind = int(np.asarray(t["ind"])[0, 0])
    cy, cx = ind // w, ind % w
    preds["heatmap"][0, cy, cx, 1] = 1.0
    out = decode_centernet_predictions(
        {k: jnp.asarray(v) for k, v in preds.items()},
        max_detections=5,
        voxel_size=(102.4 / w, 102.4 / h),
        pc_range=pc_range,
        class_always_zero=False,
    )
    box = np.asarray(out["boxes"])[0, 0]
    assert np.asarray(out["scores"])[0, 0] == 1.0
    np.testing.assert_allclose(box[0], 10.0, atol=1e-3)
    np.testing.assert_allclose(box[1], -20.0, atol=1e-3)  # was -51.2-ish off
    np.testing.assert_allclose(box[3:6], [2.0, 4.0, 1.5], atol=1e-4)


def test_targets_padded_rows_do_not_clobber_origin_cell():
    """Zero-padded gt rows land in the BEV cell containing the world origin;
    their zero values must NOT overwrite a real object's dense targets
    there (the alternative DetectionLoss trains on these maps)."""
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.ops.targets import (
        prepare_centernet_targets,
    )

    gt = np.zeros((1, 3, 7), np.float32)  # rows 1-2 are padding
    gt[0, 0] = [0.5, 0.5, -1.0, 2.0, 4.0, 1.5, 0.3]  # origin cell (25, 25)
    labels = np.array([[2, -1, -1]], np.int64)
    t = prepare_centernet_targets(
        jnp.asarray(gt), jnp.asarray(labels), bev_size=(50, 50),
        num_classes=3,
    )
    size_map = np.asarray(t["size"])
    np.testing.assert_allclose(size_map[0, 25, 25], [2.0, 4.0, 1.5])
    off = np.asarray(t["offset"])[0, 25, 25]
    assert np.abs(off).sum() > 0  # the real object's sub-pixel offset

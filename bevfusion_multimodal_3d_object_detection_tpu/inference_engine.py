"""Inference engine + visualization (ref: /root/reference/src/inference.py).

`InferenceEngine` mirrors the reference engine (inference.py:36-954):
- decode via the eval-path variant (voxel 0.512, quirk Q3) with score > 0.3
  (inference.py:186-189),
- per-sample P/R/F1 with axis-aligned BEV IoU at 0.5 — IoU ignores yaw,
  matching the reference (inference.py:336-349),
- 6-panel matplotlib figure: BEV boxes with heading arrows, 3D boxes + LiDAR
  scatter, denormalized front camera, predicted heatmap, score bars, class
  histogram (inference.py:413-477). Unlike the reference, the heatmap panel
  actually renders (the reference keys it on a never-set dict entry — quirk
  Q18, inference.py:444-446).
- `batch_inference` aggregates micro P/R/F1 over N samples
  (inference.py:821-909).

Fixed vs reference: the model is loaded ONCE at construction instead of per
`run_inference` call (quirk Q17, inference.py:164-165).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    CompatFlags,
    DEFAULT_CLASSES,
    DetectorSpec,
    load_config,
)
from .models import MultiModal3DDetector
from .ops.decode import decode_centernet_predictions, decode_to_host
from .train.checkpoint import load_checkpoint


def bev_iou_axis_aligned(box_a: np.ndarray, box_b: np.ndarray) -> float:
    """Axis-aligned BEV IoU ignoring yaw (ref: inference.py:336-349)."""
    ax0, ay0 = box_a[0] - box_a[3] / 2, box_a[1] - box_a[4] / 2
    ax1, ay1 = box_a[0] + box_a[3] / 2, box_a[1] + box_a[4] / 2
    bx0, by0 = box_b[0] - box_b[3] / 2, box_b[1] - box_b[4] / 2
    bx1, by1 = box_b[0] + box_b[3] / 2, box_b[1] + box_b[4] / 2
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / union if union > 0 else 0.0


def precision_recall_f1(
    pred_boxes: np.ndarray,
    gt_boxes: np.ndarray,
    iou_thresh: float = 0.5,
):
    """Greedy IoU matching -> (precision, recall, f1, tp, fp, fn)
    (ref: inference.py:276-391)."""
    n_pred, n_gt = len(pred_boxes), len(gt_boxes)
    if n_pred == 0 and n_gt == 0:
        return 1.0, 1.0, 1.0, 0, 0, 0
    matched_gt = set()
    tp = 0
    for pb in pred_boxes:
        best_iou, best_gi = 0.0, -1
        for gi, gb in enumerate(gt_boxes):
            if gi in matched_gt:
                continue
            iou = bev_iou_axis_aligned(pb, gb)
            if iou > best_iou:
                best_iou, best_gi = iou, gi
        if best_iou >= iou_thresh and best_gi >= 0:
            matched_gt.add(best_gi)
            tp += 1
    fp = n_pred - tp
    fn = n_gt - tp
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gt if n_gt else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return precision, recall, f1, tp, fp, fn


class InferenceEngine:
    def __init__(
        self,
        model_path: Optional[str] = None,
        config_path: str = "configs/base.yaml",
        score_threshold: float = 0.3,
        config: Optional[Dict] = None,
        fold_bn: Optional[bool] = None,
    ):
        # direct config dict OR config_path, like every reference class
        # (ref: inference.py:42-94 / the config= | config_path= pattern)
        self.config = config if config is not None else load_config(config_path)
        self.compat = CompatFlags.from_config(self.config)
        self.spec = DetectorSpec.from_config(self.config)
        self.classes = list(
            (self.config.get("dataset", {}) or {}).get(
                "classes", DEFAULT_CLASSES
            )
        )
        self.score_threshold = score_threshold
        # resurrected inference.post_processing (test.post_processing as the
        # fallback; both declared-but-dead upstream): score threshold + BEV NMS +
        # max_detections cap, behind compat.ignore_post_processing_config
        self.post_process = None
        if not self.compat.ignore_post_processing_config:
            from .config import PostProcessSpec

            self.post_process = PostProcessSpec.from_config(
                self.config, ("inference", "test")
            )
            self.score_threshold = self.post_process.score_threshold
        inference_cfg = self.config.get("inference", {}) or {}
        self.save_predictions = bool(
            inference_cfg.get("save_predictions", True)
        )
        # serving-graph BN folding (utils/fold_bn.py): checkpoints restore
        # into the standard (unfolded) tree, then the camera BNs fold into
        # their convs and the serving model runs without them
        self.fold_bn = (
            bool(inference_cfg.get("fold_bn", False))
            if fold_bn is None
            else fold_bn
        )
        self.model = MultiModal3DDetector(
            spec=self.spec,
            mask_padding=not self.compat.unmasked_point_padding,
            fold_bn=self.fold_bn,
        )
        # unfolded twin used only to init/restore checkpoints
        self._restore_model = (
            MultiModal3DDetector(
                spec=self.spec,
                mask_padding=not self.compat.unmasked_point_padding,
            )
            if self.fold_bn
            else self.model
        )
        self.variables = None
        if model_path is not None:
            self.load_model(model_path)
        self._apply = jax.jit(
            lambda variables, cam, lid, rad: self.model.apply(
                variables, cam, lid, rad, train=False
            )
        )
        if self.compat.eval_decode_voxel_0512:
            self.voxel_size = 0.512  # Q3
        else:
            # per-axis (decode matches targets.py for non-square grids)
            x0, y0, _, x1, y1, _ = self.spec.bev.pc_range
            self.voxel_size = (
                (x1 - x0) / self.spec.bev.bev_w,
                (y1 - y0) / self.spec.bev.bev_h,
            )

    # -- model ------------------------------------------------------------------
    def init_random(self, sample: Dict) -> None:
        """Initialize with random weights (for smoke runs without checkpoint).
        Honors camera_encoder.pretrained when a local trunk .pth exists."""
        from .utils.torch_convert import maybe_load_pretrained_camera

        rng = jax.random.PRNGKey(0)
        variables = self._restore_model.init(
            {"params": rng}, *self._inputs(sample, batch=True), train=False
        )
        variables, _ = maybe_load_pretrained_camera(variables, self.spec)
        self.variables = self._maybe_fold(variables)

    def load_model(self, model_path: str, strict: bool = True) -> None:
        """Load a checkpoint saved by the Trainer — or a torch `.pth`
        checkpoint in the REFERENCE framework's format (migrated through
        utils/reference_convert.py). Tolerant of missing keys (the reference
        loads strict=False, eval.py:211) but a failed restore RAISES by
        default — silently proceeding on random weights would present
        garbage detections as real. `strict=False` restores the old
        warn-and-randomize behavior for smoke runs."""
        rng = jax.random.PRNGKey(0)
        dummy = self._dummy_sample()
        variables = self._restore_model.init(
            {"params": rng}, *self._inputs(dummy, batch=True), train=False
        )
        template = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        try:
            if str(model_path).endswith((".pth", ".pt")):
                from .utils.reference_convert import (
                    load_reference_checkpoint_into,
                )

                self.variables = self._maybe_fold(
                    load_reference_checkpoint_into(template, model_path)
                )
                print(f"Migrated reference torch checkpoint {model_path}")
            else:
                restored = load_checkpoint(model_path, template)
                self.variables = self._maybe_fold(
                    {
                        "params": restored["params"],
                        "batch_stats": restored["batch_stats"],
                    }
                )
        except Exception as e:
            if strict:
                raise RuntimeError(
                    f"failed to restore checkpoint '{model_path}': {e}"
                ) from e
            print(f"Warning: failed to restore '{model_path}' ({e}); "
                  f"using random init")
            self.variables = self._maybe_fold(variables)

    def _maybe_fold(self, variables: Dict) -> Dict:
        if not self.fold_bn:
            return variables
        from .utils.fold_bn import fold_camera_variables

        return fold_camera_variables(variables)

    def _dummy_sample(self) -> Dict:
        h, w = self.spec.camera.image_size
        return {
            "camera_imgs": np.zeros((6, h, w, 3), np.float32),
            "lidar_points": np.zeros(
                (self.spec.lidar.max_points, self.spec.lidar.input_channels),
                np.float32,
            ),
            "radar_points": np.zeros(
                (
                    self.spec.radar.num_radars,
                    self.spec.radar.max_points_per_sensor,
                    self.spec.radar.input_channels,
                ),
                np.float32,
            ),
        }

    def _inputs(self, sample: Dict, batch: bool = False):
        def b(x):
            return x[None] if batch else x

        return (
            b(sample["camera_imgs"]) if self.spec.use_camera else None,
            b(sample["lidar_points"]) if self.spec.use_lidar else None,
            b(sample["radar_points"]) if self.spec.use_radar else None,
        )

    # -- inference -----------------------------------------------------------------
    def run_inference(
        self,
        sample: Dict,
        visualize: bool = True,
        save_dir: Optional[str] = None,
    ) -> Dict:
        assert self.variables is not None, "load_model or init_random first"
        t0 = time.perf_counter()
        preds = self._apply(self.variables, *self._inputs(sample, batch=True))
        if self.spec.head_is_centernet:
            decoded = decode_centernet_predictions(
                preds,
                max_detections=self.spec.centernet.max_detections,
                voxel_size=self.voxel_size,
                pc_range=self.spec.bev.pc_range,
                class_always_zero=self.compat.decode_class_always_zero,
            )
            dets = decode_to_host(
                decoded,
                score_thresh=self.score_threshold,
                nms_thresh=(
                    self.post_process.nms_threshold
                    if self.post_process
                    else None
                ),
                max_detections=(
                    self.post_process.max_detections
                    if self.post_process
                    else None
                ),
            )[0]
        else:
            cls = np.asarray(preds["cls"][0])
            box = np.asarray(preds["box"][0])
            label = int(np.argmax(cls))
            score = float(jax.nn.softmax(jnp.asarray(cls))[label])
            dets = {
                "boxes": box[None],
                "scores": np.array([score]),
                "labels": np.array([label]),
                "velocities": np.zeros((1, 2)),
            }
        elapsed = time.perf_counter() - t0

        gt_boxes = np.asarray(sample.get("gt_boxes", np.zeros((0, 7))))
        gt_labels = np.asarray(sample.get("gt_labels", np.zeros(0, np.int64)))
        if gt_labels.size:  # unlabeled samples carry boxes without labels
            gt_boxes = gt_boxes[gt_labels >= 0]

        p, r, f1, tp, fp, fn = precision_recall_f1(dets["boxes"], gt_boxes)
        result = {
            "detections": dets,
            "precision": p,
            "recall": r,
            "f1": f1,
            "tp": tp,
            "fp": fp,
            "fn": fn,
            "latency_s": elapsed,
        }

        self._print_detections(dets)
        if visualize:
            path = self.visualize(sample, dets, preds, save_dir=save_dir)
            result["figure_path"] = path
        if save_dir is not None and self.save_predictions:
            result["predictions_path"] = self._save_predictions(
                sample, dets, save_dir
            )
        return result

    def _save_predictions(self, sample: Dict, dets: Dict, save_dir: str) -> str:
        """Write detections as JSON (the `inference.save_predictions` config
        key — declared in the reference but never implemented)."""
        import json

        out_dir = Path(save_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        token = sample.get("token", "sample")
        path = out_dir / f"predictions_{token}.json"
        payload = {
            "token": token,
            "detections": [
                {
                    "box": [float(v) for v in dets["boxes"][i]],
                    "score": float(dets["scores"][i]),
                    "label": int(dets["labels"][i]),
                    "class": self.classes[
                        int(dets["labels"][i]) % len(self.classes)
                    ],
                    "velocity": [float(v) for v in dets["velocities"][i]],
                }
                for i in range(len(dets["scores"]))
            ],
        }
        path.write_text(json.dumps(payload, indent=1))
        return str(path)

    def batch_inference(
        self, dataset, num_samples: int = 10, save_dir: Optional[str] = None
    ) -> Dict:
        """Micro-averaged P/R/F1 over N samples (ref: inference.py:821-909)."""
        total_tp = total_fp = total_fn = 0
        times = []
        n = min(num_samples, len(dataset))
        for i in range(n):
            res = self.run_inference(
                dataset[i], visualize=False, save_dir=save_dir
            )
            total_tp += res["tp"]
            total_fp += res["fp"]
            total_fn += res["fn"]
            times.append(res["latency_s"])
        precision = total_tp / max(total_tp + total_fp, 1)
        recall = total_tp / max(total_tp + total_fn, 1)
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall > 0
            else 0.0
        )
        summary = {
            "num_samples": n,
            "precision": precision,
            "recall": recall,
            "f1": f1,
            "mean_latency_s": float(np.mean(times)) if times else 0.0,
            "samples_per_sec": (
                n / float(np.sum(times)) if times else 0.0
            ),
        }
        print(
            f"\nBatch inference over {n} samples: "
            f"P={precision:.3f} R={recall:.3f} F1={f1:.3f} "
            f"({summary['samples_per_sec']:.2f} samples/s)"
        )
        return summary

    # -- output ------------------------------------------------------------------
    def _print_detections(self, dets: Dict, top: int = 10) -> None:
        n = len(dets["scores"])
        print(f"\nDetections: {n}")
        order = np.argsort(-dets["scores"])[:top]
        for i in order:
            b = dets["boxes"][i]
            cls = self.classes[int(dets["labels"][i]) % len(self.classes)]
            print(
                f"  {cls:20s} score={dets['scores'][i]:.3f} "
                f"xyz=({b[0]:6.1f},{b[1]:6.1f},{b[2]:5.1f}) "
                f"wlh=({b[3]:4.1f},{b[4]:4.1f},{b[5]:4.1f}) yaw={b[6]:5.2f}"
            )

    def visualize(
        self,
        sample: Dict,
        dets: Dict,
        preds: Optional[Dict] = None,
        save_dir: Optional[str] = None,
    ) -> str:
        """6-panel figure (ref: inference.py:413-477)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.patches import Rectangle

        fig, axes = plt.subplots(2, 3, figsize=(18, 10))

        gt_boxes = np.asarray(sample.get("gt_boxes", np.zeros((0, 7))))
        gt_labels = np.asarray(
            sample.get("gt_labels", np.zeros(0, np.int64))
        )
        gt_boxes = gt_boxes[gt_labels >= 0] if gt_labels.size else gt_boxes

        # (0,0) BEV with heading arrows
        ax = axes[0, 0]
        for b in gt_boxes:
            ax.add_patch(
                Rectangle(
                    (b[0] - b[3] / 2, b[1] - b[4] / 2), b[3], b[4],
                    fill=False, edgecolor="green", lw=1.5,
                )
            )
            ax.arrow(b[0], b[1], 2 * np.cos(b[6]), 2 * np.sin(b[6]),
                     color="green", head_width=0.8)
        for b in dets["boxes"]:
            ax.add_patch(
                Rectangle(
                    (b[0] - b[3] / 2, b[1] - b[4] / 2), b[3], b[4],
                    fill=False, edgecolor="red", lw=1.0,
                )
            )
            ax.arrow(b[0], b[1], 2 * np.cos(b[6]), 2 * np.sin(b[6]),
                     color="red", head_width=0.8)
        ax.set_xlim(-55, 55)
        ax.set_ylim(-55, 55)
        ax.set_title("BEV (green=GT, red=pred)")
        ax.set_aspect("equal")

        # (0,1) LiDAR scatter
        ax = axes[0, 1]
        pts = np.asarray(sample.get("lidar_points", np.zeros((0, 4))))
        if len(pts):
            sub = pts[:: max(1, len(pts) // 10000)]
            ax.scatter(sub[:, 0], sub[:, 1], s=0.2, c=sub[:, 2],
                       cmap="viridis")
        ax.set_title("LiDAR points (BEV)")
        ax.set_aspect("equal")

        # (0,2) front camera (denormalized) + projected 3D boxes
        # (visualization.camera.project_boxes — declared but unimplemented in
        # the reference)
        ax = axes[0, 2]
        cams = sample.get("camera_imgs")
        if cams is not None and len(cams):
            img = np.asarray(cams[0])
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            else:
                from .data.dataset import IMAGENET_MEAN, IMAGENET_STD

                img = np.clip(img * IMAGENET_STD + IMAGENET_MEAN, 0, 1)
            ax.imshow(img)
            proj = sample.get("cam_front_projection")
            if proj is not None:
                from .utils.box_geometry import (
                    BOX_EDGES,
                    project_box_to_image,
                )

                hw = img.shape[:2]

                def draw(boxes, color):
                    for b in boxes:
                        uv = project_box_to_image(
                            b, proj["intrinsic"], proj["rot"],
                            proj["trans"], hw,
                        )
                        if uv is None:
                            continue
                        for i, j in BOX_EDGES:
                            ax.plot(
                                [uv[i, 0], uv[j, 0]], [uv[i, 1], uv[j, 1]],
                                color=color, lw=0.8,
                            )

                draw(gt_boxes, "lime")
                draw(dets["boxes"], "red")
                ax.set_xlim(0, hw[1])
                ax.set_ylim(hw[0], 0)
        ax.set_title("CAM_FRONT (projected boxes)")
        ax.axis("off")

        # (1,0) heatmap (rendered for real — quirk Q18 fixed)
        ax = axes[1, 0]
        if preds is not None and "heatmap" in preds:
            hm = np.asarray(preds["heatmap"][0]).max(axis=-1)
            ax.imshow(hm, cmap="hot", origin="lower")
        ax.set_title("Predicted heatmap (max over classes)")

        # (1,1) score bars
        ax = axes[1, 1]
        order = np.argsort(-dets["scores"])[:20]
        ax.bar(range(len(order)), dets["scores"][order], color="steelblue")
        ax.set_title("Top detection scores")
        ax.set_ylim(0, 1)

        # (1,2) class histogram
        ax = axes[1, 2]
        if len(dets["labels"]):
            counts = np.bincount(
                dets["labels"].astype(int) % len(self.classes),
                minlength=len(self.classes),
            )
            ax.bar(range(len(self.classes)), counts, color="darkorange")
            ax.set_xticks(range(len(self.classes)))
            ax.set_xticklabels(self.classes, rotation=60, fontsize=7)
        ax.set_title("Detections per class")

        token = sample.get("token", "sample")
        out_dir = Path(save_dir or "./inference_results")
        out_dir.mkdir(parents=True, exist_ok=True)
        out_path = out_dir / f"inference_{token}.png"
        fig.tight_layout()
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        print(f"Saved visualization to {out_path}")
        return str(out_path)

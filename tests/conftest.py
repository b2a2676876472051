"""Test configuration: force an 8-virtual-device CPU platform (the idiomatic
fake backend for TPU-parallelism tests, see SURVEY.md §4) and enable the
persistent compilation cache so repeat runs are fast."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # XLA:CPU aborts any collective whose peers take >40 s to arrive; on
    # this contended 1-core host a multi-collective dual-axis program can
    # legitimately take longer (rendezvous STARVATION, not deadlock —
    # diagnosed r03, ARCHITECTURE.md "Multi-chip validation"). Raise the
    # abort thresholds so slow-but-progressing programs complete.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = flags

from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402

# The environment's sitecustomize force-prepends the 'axon' TPU platform
# regardless of JAX_PLATFORMS; in-process config is the only reliable way to
# pin tests to the 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# True-f32 matmuls/convs for numeric-parity tests: the default precision on
# TPU-class backends does bf16 passes (~2e-3 error vs the f32-exact torch
# reference).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from bevfusion_multimodal_3d_object_detection_tpu.config import (  # noqa: E402
    CameraEncoderSpec,
    DetectorSpec,
    LidarEncoderSpec,
    RadarEncoderSpec,
)


TINY_IMAGE = (32, 64)
TINY_POINTS = 256
TINY_RADAR_POINTS = 16


@pytest.fixture(scope="session")
def tiny_spec() -> DetectorSpec:
    return DetectorSpec(
        camera=CameraEncoderSpec(image_size=TINY_IMAGE),
        lidar=LidarEncoderSpec(max_points=TINY_POINTS),
        radar=RadarEncoderSpec(max_points_per_sensor=TINY_RADAR_POINTS),
    )


def tiny_batch(batch_size=2, max_objects=16, seed=0):
    rng = np.random.RandomState(seed)
    h, w = TINY_IMAGE
    boxes = np.zeros((batch_size, max_objects, 7), np.float32)
    labels = np.full((batch_size, max_objects), -1, np.int64)
    for b in range(batch_size):
        n = rng.randint(1, 6)
        boxes[b, :n, 0:2] = rng.uniform(-45, 45, (n, 2))
        boxes[b, :n, 3:6] = rng.uniform(1, 6, (n, 3))
        boxes[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        labels[b, :n] = rng.randint(0, 10, n)
    return {
        "camera_imgs": rng.randn(batch_size, 6, h, w, 3).astype(np.float32),
        "lidar_points": rng.randn(batch_size, TINY_POINTS, 4).astype(
            np.float32
        ),
        "radar_points": rng.randn(
            batch_size, 5, TINY_RADAR_POINTS, 7
        ).astype(np.float32),
        "gt_boxes": boxes,
        "gt_labels": labels,
        "gt_velocities": np.zeros((batch_size, max_objects, 2), np.float32),
    }

"""Batched inference server (serving.py): request coalescing, padding
correctness, parity with the single-sample engine path."""

import pathlib

import numpy as np
import pytest

from conftest import tiny_batch


@pytest.fixture(scope="module")
def tiny_config():
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        load_config,
    )

    cfg = load_config(
        str(pathlib.Path(__file__).parents[1] / "configs" / "base.yaml")
    )
    cfg["model"]["camera_encoder"]["input_size"] = [32, 64]
    cfg["dataset"]["cameras"]["image_size"] = [32, 64]
    # dataset.max_points takes precedence over the encoder keys in
    # DetectorSpec.from_config — override both
    cfg["dataset"]["max_points"] = {"lidar": 256, "radar_per_sensor": 16}
    cfg["model"]["lidar_encoder"]["max_points"] = 256
    cfg["model"]["radar_encoder"]["max_points_per_sensor"] = 16
    return cfg


def _samples(n):
    batch = tiny_batch(batch_size=n, seed=3)
    return [
        {
            "camera_imgs": batch["camera_imgs"][i],
            "lidar_points": batch["lidar_points"][i],
            "radar_points": batch["radar_points"][i],
        }
        for i in range(n)
    ]


def test_server_batches_and_matches_direct_path(tiny_config):
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=4, max_delay_ms=50.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    samples = _samples(6)
    with server:
        futures = [server.submit(s) for s in samples]
        results = [f.result(timeout=120) for f in futures]

    assert len(results) == 6
    for r in results:
        assert r["boxes"].shape[1] == 9
        assert len(r["scores"]) == len(r["labels"]) == len(r["boxes"])
        assert np.isfinite(r["scores"]).all()

    # the same sample alone must produce the same detections as in a
    # coalesced padded batch (static shapes, no cross-sample effects)
    solo = server._run_batch([samples[0]])[0]
    np.testing.assert_allclose(
        solo["scores"], results[0]["scores"], atol=1e-5
    )
    np.testing.assert_allclose(solo["boxes"], results[0]["boxes"], atol=1e-4)
    assert server.stats["requests"] == 6
    assert server.stats["batches"] >= 2  # 6 requests > one batch of 4


def test_server_fold_bn_bf16_smoke(tiny_config):
    """The production config (bf16 + folded BN) serves finite detections."""
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=True, fold_bn=True, score_threshold=0.0,
    )
    with server:
        res = server.infer(_samples(1)[0], timeout=180)
    assert np.isfinite(res["scores"]).all()
    assert res["boxes"].shape[1] == 9


def test_server_error_propagates_to_future(tiny_config):
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False,
    )
    bad = _samples(1)[0]
    bad["camera_imgs"] = bad["camera_imgs"][:, :8]  # wrong shape
    with server:
        fut = server.submit(bad)
        with pytest.raises(Exception):
            fut.result(timeout=120)

"""AOT serving artifacts (utils/aot.py): jax.export roundtrip parity with
the live jitted serving graph, both wire signatures, and startup
validation of mismatched artifacts. The reference has no deployment
artifact beyond the raw .pth (ref: inference.py:24-52)."""

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
    cfg["dataset"]["max_points"] = {"lidar": 256, "radar_per_sensor": 16}
    cfg["model"]["lidar_encoder"]["max_points"] = 256
    cfg["model"]["radar_encoder"]["max_points_per_sensor"] = 16
    return cfg


def _sample(seed=3, uint8=False):
    batch = tiny_batch(batch_size=1, seed=seed)
    s = {
        "camera_imgs": batch["camera_imgs"][0],
        "lidar_points": batch["lidar_points"][0],
        "radar_points": batch["radar_points"][0],
    }
    if uint8:
        s["camera_imgs"] = (
            np.clip(s["camera_imgs"], 0, 1) * 255
        ).astype(np.uint8)
    return s


def test_aot_roundtrip_matches_live_graph(tiny_config, tmp_path):
    """An exported+reloaded serving graph returns the same detections as
    the live jit, for BOTH wire signatures (f32 and uint8 cameras)."""
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.utils.aot import (
        export_serving_artifact,
    )

    live = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    path = tmp_path / "serving.aot.npz"
    meta = export_serving_artifact(live, path, platforms=("cpu",))
    assert meta["batch_size"] == 2
    assert sorted(meta["signatures"]) == ["f32", "u8"]
    assert meta["modalities"] == {
        "camera": True, "lidar": True, "radar": True,
    }

    aot = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
        variables=live.variables, aot_path=str(path),
    )
    assert aot.aot_meta["format"] == "bmod-aot-v1"

    samples = [_sample(uint8=u) for u in (False, True)]
    with live:
        wants = [live.infer(dict(s)) for s in samples]
    with aot:
        gots = [aot.infer(dict(s)) for s in samples]
    for got, want in zip(gots, wants):
        np.testing.assert_allclose(
            got["boxes"], want["boxes"], atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            got["scores"], want["scores"], atol=1e-5, rtol=1e-5
        )
        np.testing.assert_array_equal(got["labels"], want["labels"])


def test_aot_artifact_validation(tiny_config, tmp_path):
    """Mismatched batch size / dtype / random files fail at STARTUP with a
    clear error, never mid-request."""
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.utils.aot import (
        export_serving_artifact,
    )

    src = InferenceServer(
        config=tiny_config, batch_size=2,
        use_bf16=False, fold_bn=False,
    )
    path = tmp_path / "serving.aot.npz"
    export_serving_artifact(src, path, platforms=("cpu",))

    with pytest.raises(ValueError, match="batch_size"):
        InferenceServer(
            config=tiny_config, batch_size=4, use_bf16=False,
            fold_bn=False, variables=src.variables, aot_path=str(path),
        )
    with pytest.raises(ValueError, match="dtype"):
        InferenceServer(
            config=tiny_config, batch_size=2, use_bf16=True,
            fold_bn=False, variables=src.variables, aot_path=str(path),
        )
    # mesh + AOT is rejected (artifact was traced unpartitioned)
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "view"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        InferenceServer(
            config=tiny_config, batch_size=2, use_bf16=False,
            fold_bn=False, variables=src.variables, aot_path=str(path),
            mesh=mesh,
        )
    # not an artifact at all
    bogus = tmp_path / "bogus.npz"
    np.savez(bogus, meta=np.array("{}"))
    with pytest.raises(ValueError, match="not a bmod AOT"):
        InferenceServer(
            config=tiny_config, batch_size=2, use_bf16=False,
            fold_bn=False, variables=src.variables, aot_path=str(bogus),
        )
    # fold_bn mismatch is caught at startup, not as an opaque pytree error
    with pytest.raises(ValueError, match="fold_bn"):
        InferenceServer(
            config=tiny_config, batch_size=2, use_bf16=False,
            fold_bn=True, variables=src.variables, aot_path=str(path),
        )
    # a mesh-sharded server cannot export (artifacts are traced
    # unpartitioned)
    import jax
    from jax.sharding import Mesh

    mesh1 = Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("data", "view")
    )
    sharded = InferenceServer(
        config=tiny_config, batch_size=2, use_bf16=False,
        fold_bn=False, variables=src.variables, mesh=mesh1,
    )
    with pytest.raises(ValueError, match="unpartitioned"):
        export_serving_artifact(sharded, tmp_path / "nope.npz")
    # an extensionless path is written EXACTLY as given (np.savez must not
    # silently append .npz and break the documented --aot follow-up)
    bare = tmp_path / "serving.aot"
    export_serving_artifact(src, bare, platforms=("cpu",))
    assert bare.exists()


def test_aot_camera_off_config_serves_uint8_warmup(tmp_path):
    """Camera-disabled configs still export BOTH wire signatures, so the
    server's unconditional uint8 warmup works from an artifact."""
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.utils.aot import (
        export_serving_artifact,
    )

    cfg = {
        "model": {
            "modality_config": "lidar_only",
            "lidar_encoder": {"max_points": 128},
        },
        "dataset": {
            "cameras": {"image_size": [32, 64]},
            "max_points": {"lidar": 128, "radar_per_sensor": 8},
        },
    }
    src = InferenceServer(
        config=cfg, batch_size=2, use_bf16=False, fold_bn=False,
    )
    path = tmp_path / "lidar.aot.npz"
    meta = export_serving_artifact(src, path, platforms=("cpu",))
    assert sorted(meta["signatures"]) == ["f32", "u8"]
    aot = InferenceServer(
        config=cfg, batch_size=2, use_bf16=False, fold_bn=False,
        variables=src.variables, aot_path=str(path),
    )
    with aot:  # start(warmup=True) exercises the uint8 wire
        pass


def test_cache_kill_switch_env(monkeypatch, tmp_path):
    """BMOD_JAX_CACHE=off disables the persistent compile cache (the AOT
    replica recommendation for tunneled links — utils/aot.py docstring);
    an explicit cache_dir argument still wins over the env kill-switch."""
    import jax

    from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    before = jax.config.jax_compilation_cache_dir
    try:
        for off in ("off", "", "0", "none", " OFF "):
            monkeypatch.setenv("BMOD_JAX_CACHE", off)
            enable_compilation_cache()
            assert jax.config.jax_compilation_cache_dir == before

        # explicit argument beats the env kill-switch
        explicit = tmp_path / "cache"
        monkeypatch.setenv("BMOD_JAX_CACHE", "off")
        enable_compilation_cache(cache_dir=str(explicit))
        assert jax.config.jax_compilation_cache_dir == str(explicit)
        assert explicit.is_dir()

        # a real env dir is still honored
        env_dir = tmp_path / "envcache"
        monkeypatch.setenv("BMOD_JAX_CACHE", str(env_dir))
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(env_dir)
    finally:
        jax.config.update("jax_compilation_cache_dir", before)

"""Full-model numerical parity: a torch model with reference-layout weights
vs our flax detector loaded through the reference-checkpoint converter.

This is the strongest cross-framework check available without the (absent)
real reference weights: `TorchReferenceDetector` mirrors the reference's
module topology exactly; its state_dict is renamed into the reference's key
layout, converted via `utils/reference_convert.py`, and both models must
produce the same prediction maps end to end (eval mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    CameraEncoderSpec,
    DetectorSpec,
    LidarEncoderSpec,
    RadarEncoderSpec,
)
from bevfusion_multimodal_3d_object_detection_tpu.models import (
    MultiModal3DDetector,
)
from bevfusion_multimodal_3d_object_detection_tpu.utils.reference_convert import (
    convert_reference_checkpoint,
)
from bevfusion_multimodal_3d_object_detection_tpu.utils.torch_baseline import (
    TorchReferenceDetector,
)


def _reference_style_state_dict(model: TorchReferenceDetector):
    """Rename torch_baseline keys into the reference checkpoint layout
    (module names per /root/reference/src/encoders.py + fusion.py)."""
    out = {}
    for k, v in model.state_dict().items():
        nk = None
        if k.startswith("stem.0."):
            nk = k.replace("stem.0.", "camera_encoder.conv1.")
        elif k.startswith("stem.1."):
            nk = k.replace("stem.1.", "camera_encoder.bn1.")
        elif k.startswith("layer"):
            nk = "camera_encoder." + k.replace(
                ".down.0.", ".downsample.0."
            ).replace(".down.1.", ".downsample.1.")
        elif k.startswith("channel_proj."):
            nk = "camera_encoder." + k
        elif k.startswith("pointnet."):
            parts = k.split(".")
            layer, seq = int(parts[1]), parts[2]
            kind = "conv" if seq == "0" else "bn"
            nk = f"lidar_encoder.{kind}{layer + 1}." + ".".join(parts[3:])
        elif k.startswith("radarnet."):
            parts = k.split(".")
            layer, seq = int(parts[1]), parts[2]
            kind = "conv" if seq == "0" else "bn"
            nk = (
                f"radar_encoder.radar_encoder.{kind}{layer + 1}."
                + ".".join(parts[3:])
            )
        elif k.startswith("radar_fuse."):
            nk = k.replace("radar_fuse.", "radar_encoder.fusion_fc.")
        elif k.startswith("camera_proj."):
            idx_map = {"0.0": "0", "0.1": "1", "1.0": "3", "1.1": "4"}
            parts = k.split(".")
            nk = (
                f"fusion.camera_proj.{idx_map[parts[1] + '.' + parts[2]]}."
                + ".".join(parts[3:])
            )
        elif k.startswith("lidar_init."):
            nk = "fusion." + k
        elif k.startswith("lidar_up."):
            idx_map = {"0.0": "0", "0.1": "1", "2.0": "4", "2.1": "5"}
            parts = k.split(".")
            nk = (
                f"fusion.lidar_upsample.{idx_map[parts[1] + '.' + parts[2]]}."
                + ".".join(parts[3:])
            )
        elif k.startswith("radar_proj."):
            nk = "fusion." + k
        elif k.startswith("radar_refine.") or k.startswith("bev_fusion."):
            base = k.split(".")[0]
            idx_map = {"0.0": "0", "0.1": "1", "1.0": "3", "1.1": "4"}
            parts = k.split(".")
            nk = (
                f"fusion.{base}.{idx_map[parts[1] + '.' + parts[2]]}."
                + ".".join(parts[3:])
            )
        else:
            branch_map = {"hm": "heatmap", "off": "offset", "size": "size",
                          "rot": "rot", "vel": "vel"}
            for short, full in branch_map.items():
                if k.startswith(short + "."):
                    nk = f"det_head.{full}_head." + k[len(short) + 1 :]
                    break
        if nk is not None and "num_batches_tracked" not in nk:
            out[nk] = v
    return out


def test_reference_checkpoint_full_model_parity():
    torch.manual_seed(0)
    tmodel = TorchReferenceDetector().eval()
    sd = _reference_style_state_dict(tmodel)
    params, stats = convert_reference_checkpoint(sd)

    spec = DetectorSpec(
        camera=CameraEncoderSpec(image_size=(32, 64)),
        lidar=LidarEncoderSpec(max_points=64),
        radar=RadarEncoderSpec(max_points_per_sensor=16),
    )
    model = MultiModal3DDetector(spec=spec)

    rng = np.random.RandomState(0)
    cams = rng.randn(1, 6, 32, 64, 3).astype(np.float32)
    lidar = rng.randn(1, 64, 4).astype(np.float32)
    radars = rng.randn(1, 5, 16, 7).astype(np.float32)

    # structure check: converted tree must slot into the model's init tree
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(cams), jnp.asarray(lidar), jnp.asarray(radars),
        train=False,
    )
    flat_init = jax.tree_util.tree_structure(init_vars["params"])
    flat_conv = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, params)
    )
    assert flat_init == flat_conv, "converted param tree differs from model"

    out_jax = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(cams), jnp.asarray(lidar), jnp.asarray(radars),
        train=False,
    )

    with torch.no_grad():
        out_torch = tmodel(
            torch.from_numpy(cams.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(lidar),
            torch.from_numpy(radars),
        )

    for key in ("heatmap", "offset", "size", "rot", "vel"):
        got = np.asarray(out_jax[key])
        want = out_torch[key].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            got, want, atol=2e-3, rtol=1e-2,
            err_msg=f"mismatch in {key}",
        )


def test_inference_engine_loads_reference_pth(tmp_path):
    """InferenceEngine accepts a reference-format torch .pth directly."""
    import yaml

    from bevfusion_multimodal_3d_object_detection_tpu.inference_engine import (
        InferenceEngine,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        load_config,
    )
    import pathlib

    torch.manual_seed(1)
    tmodel = TorchReferenceDetector().eval()
    sd = _reference_style_state_dict(tmodel)
    ckpt = tmp_path / "reference_model.pth"
    torch.save({"model_state_dict": sd, "epoch": 3}, ckpt)

    cfg = load_config(
        str(pathlib.Path(__file__).parents[1] / "configs" / "base.yaml")
    )
    cfg["model"]["camera_encoder"]["input_size"] = [32, 64]
    cfg["dataset"]["cameras"]["image_size"] = [32, 64]
    cfg["dataset"]["max_points"] = {"lidar": 64, "radar_per_sensor": 16}
    cfg["model"]["lidar_encoder"]["max_points"] = 64
    cfg["model"]["radar_encoder"]["max_points_per_sensor"] = 16
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    engine = InferenceEngine(
        model_path=str(ckpt), config_path=str(cfg_path)
    )
    # heatmap bias prior must have been overwritten by the torch weights:
    hm_bias = np.asarray(
        engine.variables["params"]["det_head"]["heatmap_head"]["conv2"]["bias"]
    )
    np.testing.assert_allclose(
        hm_bias, tmodel.hm[2].bias.detach().numpy(), atol=1e-6
    )

"""torchvision -> flax weight conversion for the ResNet-18 camera trunk.

The reference initializes from torchvision ImageNet weights
(ref: encoders.py:98 `models.resnet18(pretrained=True)`). This environment has
no network egress and no torchvision, so pretrained init is OPTIONAL here:
when a torchvision-format state_dict file (`.pth`, picklable by torch) is
available locally, `load_torch_resnet18_into(params)` maps it onto the flax
trunk; otherwise models train from random init (the reference's published
numbers are retrain-based anyway, see BASELINE.md).

Mapping (torch OIHW -> flax HWIO; BN running stats -> batch_stats):
  conv1/bn1            -> trunk/conv1, trunk/bn1
  layerL.B.convN/bnN   -> trunk/layer{L}_{B}/convN, bnN
  layerL.B.downsample  -> trunk/layer{L}_{B}/downsample_conv, downsample_bn
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


_warned_missing_pretrained = False


def _conv_w(t) -> np.ndarray:
    # torch (O, I, H, W) -> flax (H, W, I, O)
    return np.asarray(t).transpose(2, 3, 1, 0)


def convert_resnet18_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[Dict, Dict]:
    """torch resnet18 state_dict -> (params_trunk, batch_stats_trunk) pytrees
    matching `models.resnet.ResNet18Trunk`."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(dst_params, dst_stats, prefix):
        dst_params["scale"] = sd[f"{prefix}.weight"]
        dst_params["bias"] = sd[f"{prefix}.bias"]
        dst_stats["mean"] = sd[f"{prefix}.running_mean"]
        dst_stats["var"] = sd[f"{prefix}.running_var"]

    params["conv1"] = {"kernel": _conv_w(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = {}, {}
    put_bn(params["bn1"], stats["bn1"], "bn1")

    for layer in (1, 2, 3):
        for block in (0, 1):
            name = f"layer{layer}_{block}"
            tprefix = f"layer{layer}.{block}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["conv1"] = {"kernel": _conv_w(sd[f"{tprefix}.conv1.weight"])}
            p["conv2"] = {"kernel": _conv_w(sd[f"{tprefix}.conv2.weight"])}
            p["bn1"], s["bn1"] = {}, {}
            put_bn(p["bn1"], s["bn1"], f"{tprefix}.bn1")
            p["bn2"], s["bn2"] = {}, {}
            put_bn(p["bn2"], s["bn2"], f"{tprefix}.bn2")
            if f"{tprefix}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv_w(sd[f"{tprefix}.downsample.0.weight"])
                }
                p["downsample_bn"], s["downsample_bn"] = {}, {}
                put_bn(
                    p["downsample_bn"], s["downsample_bn"],
                    f"{tprefix}.downsample.1",
                )
            params[name] = p
            stats[name] = s
    return params, stats


def load_torch_resnet18_into(
    variables: Dict, weights_path: str, trunk_path=("camera_encoder", "trunk")
) -> Dict:
    """Return a copy of `variables` with the camera trunk replaced by
    converted torchvision weights from `weights_path` (a torch-saved
    state_dict). Missing file raises FileNotFoundError."""
    import copy

    import torch

    state_dict = torch.load(weights_path, map_location="cpu",
                            weights_only=True)
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    trunk_params, trunk_stats = convert_resnet18_state_dict(state_dict)

    out = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    )

    def descend(tree, path):
        for key in path:
            tree = tree[key]
        return tree

    import jax

    dst_p = descend(out["params"], trunk_path)
    dst_s = descend(out["batch_stats"], trunk_path)
    for k, v in trunk_params.items():
        dst_p[k] = jax.tree_util.tree_map(np.asarray, v)
    for k, v in trunk_stats.items():
        dst_s[k] = jax.tree_util.tree_map(np.asarray, v)
    return out


def maybe_load_pretrained_camera(variables: Dict, spec) -> Tuple[Dict, bool]:
    """Honor `camera_encoder.pretrained` at model init
    (ref: encoders.py:98 `models.resnet18(pretrained=True)`).

    When the detector uses the camera and `spec.camera.pretrained` is set,
    loads the trunk from the local torchvision-format state_dict at
    `spec.camera.pretrained_path` (default `./weights/resnet18.pth` if that
    file exists). Returns `(variables, loaded)`. With `pretrained: true` but
    no weight file available, warns LOUDLY and returns the variables
    unchanged — this environment has no network egress, so the download the
    reference performs is impossible; the missing-file case must be visible,
    not silent."""
    from pathlib import Path

    cam = getattr(spec, "camera", None)
    if cam is None or not getattr(spec, "use_camera", False):
        return variables, False
    if not cam.pretrained:
        return variables, False
    path = cam.pretrained_path
    if path is None and Path("./weights/resnet18.pth").exists():
        path = "./weights/resnet18.pth"
    if path is None or not Path(path).exists():
        global _warned_missing_pretrained
        if not _warned_missing_pretrained:
            _warned_missing_pretrained = True
            print(
                "WARNING: camera_encoder.pretrained=true but no local "
                f"torchvision resnet18 state_dict found (pretrained_path="
                f"{cam.pretrained_path!r}); the camera trunk starts from "
                "RANDOM init. Set model.camera_encoder.pretrained_path to a "
                "local .pth to match the reference's ImageNet initialization."
            )
        return variables, False
    loaded = load_torch_resnet18_into(variables, str(path))
    print(f"Loaded pretrained camera trunk from {path}")
    return loaded, True

"""Reference-checkpoint migration: torch `.pth` state_dicts from the
reference framework -> this framework's flax variables.

Lets a user of the reference switch frameworks and keep their trained
weights. Maps every fusion type the reference factory can build (BEV /
attention / late) and both heads (CenterNet / MLP); missing keys are left
at their current values (the reference itself loads with strict=False,
eval.py:211).

Key layout of the reference (all cited in /root/reference/src):
  camera_encoder.conv1/bn1, camera_encoder.layer{1..3}.{0,1}.*,
  camera_encoder.channel_proj.{0=conv,1=bn}            (encoders.py:102-120)
  lidar_encoder.conv{1..5}/bn{1..5}                     (encoders.py:252-263)
  radar_encoder.radar_encoder.conv{1..4}/bn{1..4},
  radar_encoder.fusion_fc                               (encoders.py:515-523, 65)
BEV fusion (fusion.py:43-299):
  fusion.camera_proj.{0,1,3,4}                          (fusion.py:126-133)
  fusion.lidar_init.{0,2}                               (fusion.py:144-148)
  fusion.lidar_upsample.{0,1,4,5}                       (fusion.py:151-174)
  fusion.radar_proj.0, fusion.radar_refine.{0,1,3,4}    (fusion.py:183-196)
  fusion.bev_fusion.{0,1,3,4}                           (fusion.py:198-207)
Attention fusion (fusion.py:460-570):
  fusion.{camera,lidar,radar}_proj (Linear, no index),
  fusion.{cam,lidar,radar}_pos_embed                    (fusion.py:533-543)
  fusion.self_attention_layers.{i}.self_attn.{query,key,value,out},
  .ffn.{0,3}, .norm1, .norm2                            (fusion.py:546-562)
  fusion.output_proj.{0,3}                              (fusion.py:565-570)
Late fusion (fusion.py:725-732):
  fusion.fusion_mlp.{0,3}
Heads:
  det_head.{heatmap,offset,size,rot,vel}_head.{0,2}     (fusion.py:822-854)
  det_head.head.{0,3}  (MLP head)                       (fusion.py:919-924)

Weight layout conversions:
  Conv2d  (O, I, kH, kW) -> (kH, kW, I, O)
  Conv1d  (O, I, 1)      -> Dense (I, O)
  Linear  (O, I)         -> Dense (I, O)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .torch_convert import convert_resnet18_state_dict


def _conv2d(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _conv1d(w) -> np.ndarray:
    return np.asarray(w)[:, :, 0].T  # (O, I, 1) -> (I, O)


def _linear(w) -> np.ndarray:
    return np.asarray(w).T


def _sub(sd: Dict, prefix: str) -> Dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def _conv_bn(sd: Dict, conv_key: str, bn_key: str, name: str, params, stats,
             bias: bool = True):
    conv = {"kernel": _conv2d(sd[f"{conv_key}.weight"])}
    if bias and f"{conv_key}.bias" in sd:
        conv["bias"] = np.asarray(sd[f"{conv_key}.bias"])
    params[f"{name}_conv"] = conv
    params[f"{name}_bn"], stats[f"{name}_bn"] = _bn(sd, bn_key)


def _dense(sd: Dict, prefix: str) -> Dict:
    return {
        "kernel": _linear(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _layernorm(sd: Dict, prefix: str) -> Dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _point_mlp(sd: Dict, num_layers: int) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(1, num_layers + 1):
        params[f"mlp{i}"] = {
            "kernel": _conv1d(sd[f"conv{i}.weight"]),
            "bias": np.asarray(sd[f"conv{i}.bias"]),
        }
        if f"bn{i}.weight" in sd:
            params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"bn{i}")
    return params, stats


def convert_reference_checkpoint(
    state_dict: Dict[str, Any],
) -> Tuple[Dict, Dict]:
    """torch state_dict (reference key layout) -> (params, batch_stats)
    subtrees for `MultiModal3DDetector`. Detects which modules are present
    by their keys, so any factory combination (modalities x bev/attention/
    late fusion x centernet/mlp head) converts."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # ---- camera encoder -----------------------------------------------------
    if "camera_encoder.conv1.weight" in sd:
        trunk_p, trunk_s = convert_resnet18_state_dict(
            _sub(sd, "camera_encoder.")
        )
        cam_p: Dict[str, Any] = {"trunk": trunk_p}
        cam_s: Dict[str, Any] = {"trunk": trunk_s}
        cam_p["channel_proj"] = {
            "kernel": _conv2d(sd["camera_encoder.channel_proj.0.weight"])
        }
        cam_p["channel_proj_bn"], cam_s["channel_proj_bn"] = _bn(
            sd, "camera_encoder.channel_proj.1"
        )
        params["camera_encoder"] = cam_p
        stats["camera_encoder"] = cam_s

    # ---- lidar encoder ------------------------------------------------------
    if "lidar_encoder.conv1.weight" in sd:
        n = len(
            {k.split(".")[1] for k in sd
             if k.startswith("lidar_encoder.conv")}
        )
        p, s = _point_mlp(_sub(sd, "lidar_encoder."), n)
        params["lidar_encoder"] = {"point_mlp": p}
        stats["lidar_encoder"] = {"point_mlp": s}

    # ---- radar encoder ------------------------------------------------------
    if "radar_encoder.radar_encoder.conv1.weight" in sd:
        n = len(
            {k.split(".")[2] for k in sd
             if k.startswith("radar_encoder.radar_encoder.conv")}
        )
        p, s = _point_mlp(_sub(sd, "radar_encoder.radar_encoder."), n)
        rad_p: Dict[str, Any] = {"shared_radar": {"point_mlp": p}}
        rad_s: Dict[str, Any] = {"shared_radar": {"point_mlp": s}}
        if "radar_encoder.fusion_fc.weight" in sd:
            rad_p["fusion"] = {
                "kernel": _linear(sd["radar_encoder.fusion_fc.weight"]),
                "bias": np.asarray(sd["radar_encoder.fusion_fc.bias"]),
            }
        params["radar_encoder"] = rad_p
        stats["radar_encoder"] = rad_s

    # ---- BEV fusion -----------------------------------------------------------
    fus_p: Dict[str, Any] = {}
    fus_s: Dict[str, Any] = {}
    if "fusion.camera_proj.0.weight" in sd:
        _conv_bn(sd, "fusion.camera_proj.0", "fusion.camera_proj.1",
                 "camera_proj1", fus_p, fus_s)
        _conv_bn(sd, "fusion.camera_proj.3", "fusion.camera_proj.4",
                 "camera_proj2", fus_p, fus_s)
    if "fusion.lidar_init.0.weight" in sd:
        fus_p["lidar_init1"] = {
            "kernel": _linear(sd["fusion.lidar_init.0.weight"]),
            "bias": np.asarray(sd["fusion.lidar_init.0.bias"]),
        }
        fus_p["lidar_init2"] = {
            "kernel": _linear(sd["fusion.lidar_init.2.weight"]),
            "bias": np.asarray(sd["fusion.lidar_init.2.bias"]),
        }
        _conv_bn(sd, "fusion.lidar_upsample.0", "fusion.lidar_upsample.1",
                 "lidar_up1", fus_p, fus_s)
        _conv_bn(sd, "fusion.lidar_upsample.4", "fusion.lidar_upsample.5",
                 "lidar_up2", fus_p, fus_s)
    if "fusion.radar_proj.0.weight" in sd:
        fus_p["radar_proj"] = {
            "kernel": _linear(sd["fusion.radar_proj.0.weight"]),
            "bias": np.asarray(sd["fusion.radar_proj.0.bias"]),
        }
        _conv_bn(sd, "fusion.radar_refine.0", "fusion.radar_refine.1",
                 "radar_refine1", fus_p, fus_s)
        _conv_bn(sd, "fusion.radar_refine.3", "fusion.radar_refine.4",
                 "radar_refine2", fus_p, fus_s)
    if "fusion.bev_fusion.0.weight" in sd:
        _conv_bn(sd, "fusion.bev_fusion.0", "fusion.bev_fusion.1",
                 "bev_fusion1", fus_p, fus_s)
        _conv_bn(sd, "fusion.bev_fusion.3", "fusion.bev_fusion.4",
                 "bev_fusion2", fus_p, fus_s)

    # ---- attention fusion (Linear projections carry NO Sequential index:
    # `fusion.camera_proj.weight`, vs the BEV layout's
    # `fusion.camera_proj.0.weight` — the two layouts cannot collide) -------
    if "fusion.output_proj.0.weight" in sd:
        for ref_name, pe_name in (
            ("camera_proj", "cam_pos_embed"),
            ("lidar_proj", "lidar_pos_embed"),
            ("radar_proj", "radar_pos_embed"),
        ):
            if f"fusion.{ref_name}.weight" in sd:
                fus_p[ref_name] = _dense(sd, f"fusion.{ref_name}")
                fus_p[pe_name] = np.asarray(sd[f"fusion.{pe_name}"])
        i = 0
        while f"fusion.self_attention_layers.{i}.norm1.weight" in sd:
            base = f"fusion.self_attention_layers.{i}"
            fus_p[f"self_attn_{i}"] = {
                part: _dense(sd, f"{base}.self_attn.{part}")
                for part in ("query", "key", "value", "out")
            }
            fus_p[f"ffn1_{i}"] = _dense(sd, f"{base}.ffn.0")
            fus_p[f"ffn2_{i}"] = _dense(sd, f"{base}.ffn.3")
            fus_p[f"norm1_{i}"] = _layernorm(sd, f"{base}.norm1")
            fus_p[f"norm2_{i}"] = _layernorm(sd, f"{base}.norm2")
            i += 1
        fus_p["out_proj1"] = _dense(sd, "fusion.output_proj.0")
        fus_p["out_proj2"] = _dense(sd, "fusion.output_proj.3")

    # ---- late fusion ----------------------------------------------------
    if "fusion.fusion_mlp.0.weight" in sd:
        fus_p["fusion1"] = _dense(sd, "fusion.fusion_mlp.0")
        fus_p["fusion2"] = _dense(sd, "fusion.fusion_mlp.3")

    if fus_p:
        params["fusion"] = fus_p
        stats["fusion"] = fus_s

    # ---- CenterNet head ---------------------------------------------------------
    head_p: Dict[str, Any] = {}
    for branch in ("heatmap", "offset", "size", "rot", "vel"):
        key = f"det_head.{branch}_head"
        if f"{key}.0.weight" in sd:
            head_p[f"{branch}_head"] = {
                "conv1": {
                    "kernel": _conv2d(sd[f"{key}.0.weight"]),
                    "bias": np.asarray(sd[f"{key}.0.bias"]),
                },
                "conv2": {
                    "kernel": _conv2d(sd[f"{key}.2.weight"]),
                    "bias": np.asarray(sd[f"{key}.2.bias"]),
                },
            }

    # ---- MLP head (non-spatial fusions, ref: fusion.py:919-939) ----------
    if "det_head.head.0.weight" in sd:
        head_p["fc1"] = _dense(sd, "det_head.head.0")
        head_p["fc2"] = _dense(sd, "det_head.head.3")

    if head_p:
        params["det_head"] = head_p

    return params, stats


def load_reference_checkpoint_into(
    variables: Dict, checkpoint_path: str
) -> Dict:
    """Restore a reference torch checkpoint file
    ({'model_state_dict': ...} or a bare state_dict,
    ref: train_detect.py:768-774) into existing flax variables; unmapped
    entries keep their current values (strict=False semantics)."""
    import copy

    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model_state_dict", ckpt)
    new_p, new_s = convert_reference_checkpoint(state_dict)

    out = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    )

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = np.asarray(v)

    merge(out["params"], new_p)
    merge(out["batch_stats"], new_s)
    return out

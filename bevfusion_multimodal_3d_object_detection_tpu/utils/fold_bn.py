"""BatchNorm folding for the serving graph.

Eval-mode BatchNorm after a bias-free conv/dense is an affine map with
constant (running-stat) coefficients:

    y = gamma * (W*x - mu) / sqrt(var + eps) + beta
      = (W * gamma/sqrt(var+eps)) * x + (beta - mu * gamma/sqrt(var+eps))

so the scale folds into the weights and the rest becomes the bias of the
same conv — the BN disappears from the graph entirely, removing one
HBM-bound elementwise pass per conv. The reference never does this (it
serves the train-mode module graph, ref: encoders.py:125-131 only toggles
eval on BN); here it is the serving-path optimization for the camera trunk,
the FLOPs-dominant component (SURVEY §7 hard part 6).

Pairing is by the repo's naming conventions:
    conv1/bn1, conv2/bn2          (resnet blocks, trunk stem)
    downsample_conv/downsample_bn (resnet shortcut)
    channel_proj/channel_proj_bn  (camera 1x1 proj)
    <x>_conv/<x>_bn               (fusion _conv_bn_relu)
    mlp<i>/bn<i>                  (point MLPs — Dense + BatchNorm)

Use `fold_bn_params(params, batch_stats)` to turn a trained (unfolded)
variables pair into the parameter tree of the same module built with
`fold_bn=True`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

_EPS = 1e-5


def _bn_partner(name: str) -> Optional[str]:
    if name.endswith("_conv"):
        return name[:-5] + "_bn"
    if name.startswith("conv") and name[4:].isdigit():
        return "bn" + name[4:]
    if name.startswith("mlp") and name[3:].isdigit():
        return "bn" + name[3:]
    return name + "_bn"


def _fold_pair(conv: Dict, bn: Dict, stats: Dict) -> Dict:
    scale = bn["scale"] / jnp.sqrt(stats["var"] + _EPS)
    kernel = conv["kernel"] * scale  # broadcast over the output (last) axis
    bias = bn["bias"] - stats["mean"] * scale
    if "bias" in conv:
        bias = bias + conv["bias"] * scale
    return {"kernel": kernel, "bias": bias}


def fold_bn_params(params: Any, batch_stats: Any) -> Any:
    """Fold every (conv|dense, bn) pair found by naming convention; BN params
    are consumed and dropped. Subtrees without pairs pass through unchanged,
    so this is safe to apply to the whole model's `params` — only modules
    built with `fold_bn=True` change their expected tree."""
    if not isinstance(params, dict):
        return params
    stats = batch_stats if isinstance(batch_stats, dict) else {}
    out = {}
    consumed = set()
    for name, sub in params.items():
        if name in consumed:
            continue
        partner = _bn_partner(name) if isinstance(sub, dict) else None
        if (
            partner
            and "kernel" in sub
            and partner in params
            and isinstance(params[partner], dict)
            and "scale" in params[partner]
            and partner in stats
        ):
            out[name] = _fold_pair(sub, params[partner], stats[partner])
            consumed.add(partner)
        elif isinstance(sub, dict):
            out[name] = fold_bn_params(sub, stats.get(name, {}))
        else:
            out[name] = sub
    return out


def fold_camera_variables(variables: Dict) -> Dict:
    """Fold ONLY the camera encoder subtree (what `MultiModal3DDetector
    (fold_bn=True)` expects): camera convs lose their BNs; every other
    module keeps its BN params and batch_stats."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    if "camera_encoder" in params:
        params["camera_encoder"] = fold_bn_params(
            params["camera_encoder"], stats.get("camera_encoder", {})
        )
        stats.pop("camera_encoder", None)
    out = {"params": params}
    if stats or "batch_stats" in variables:
        out["batch_stats"] = stats
    return out

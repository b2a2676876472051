"""Shared checkpoint-restore-for-serving logic.

One place for the restore flow both serving surfaces need (the batched
`serving.InferenceServer` and, semantically, `inference_engine.
InferenceEngine.load_model`): initialize the UNFOLDED model tree, restore a
checkpoint into it (native msgpack/orbax, or a reference-format torch
`.pth` via utils/reference_convert), fall back to ImageNet-pretrained
camera init when no checkpoint is given (ref: encoders.py:98), and
optionally fold the camera BatchNorms for the serving graph
(utils/fold_bn).
"""

from __future__ import annotations

from typing import Any, Dict, Optional


def load_serving_variables(
    spec,
    model_path: Optional[str] = None,
    dtype: Any = None,
    mask_padding: bool = False,
    fold_bn: bool = False,
) -> Dict:
    """Build + restore a variables tree ready to serve.

    Restores into the standard (unfolded) tree; with `fold_bn=True` the
    camera BNs are folded afterwards, matching a model built with
    `fold_bn=True`. Raises on restore failure (strict — no silent random
    init)."""
    import jax
    import jax.numpy as jnp

    from ..models import MultiModal3DDetector

    if dtype is None:
        dtype = jnp.float32
    model = MultiModal3DDetector(
        spec=spec, dtype=dtype, mask_padding=mask_padding
    )
    h, w = spec.camera.image_size
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 6, h, w, 3), dtype),
        jnp.zeros((1, spec.lidar.max_points, spec.lidar.input_channels), dtype),
        jnp.zeros(
            (
                1,
                spec.radar.num_radars,
                spec.radar.max_points_per_sensor,
                spec.radar.input_channels,
            ),
            dtype,
        ),
        train=False,
    )
    if model_path is None:
        from .torch_convert import maybe_load_pretrained_camera

        variables, _ = maybe_load_pretrained_camera(variables, spec)
    else:
        template = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        if str(model_path).endswith((".pth", ".pt")):  # match engine suffixes
            from .reference_convert import load_reference_checkpoint_into

            variables = load_reference_checkpoint_into(template, model_path)
        else:
            from ..train.checkpoint import load_checkpoint

            restored = load_checkpoint(model_path, template)
            variables = {
                "params": restored["params"],
                "batch_stats": restored["batch_stats"],
            }
    if fold_bn:
        from .fold_bn import fold_camera_variables

        variables = fold_camera_variables(variables)
    return variables

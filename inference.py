#!/usr/bin/env python
"""Inference + visualization CLI (ref: /root/reference/src/inference.py:916-954).

  python inference.py --model <ckpt> [--config configs/base.yaml]
                      [--data-root ./data/nuscenes] [--sample-idx 0]
                      [--split test] [--device tpu] [--no-show]
                      [--save-dir ./inference_results] [--batch N]
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="3D Detection Inference")
    parser.add_argument("--model", type=str, required=True,
                        help="Path to model checkpoint")
    parser.add_argument("--config", type=str, default="configs/base.yaml",
                        help="Path to config file")
    parser.add_argument("--data-root", type=str, default="./data/nuscenes",
                        help="Data root directory")
    parser.add_argument("--sample-idx", type=int, default=0,
                        help="Sample index")
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "val", "test"])
    parser.add_argument("--device", type=str, default="tpu",
                        choices=["tpu", "cpu"],
                        help="Execution platform")
    parser.add_argument("--no-show", action="store_true",
                        help="Don't save visualizations")
    parser.add_argument("--save-dir", type=str,
                        default="./inference_results", help="Save directory")
    parser.add_argument("--batch", type=int, default=None,
                        help="Run batch inference on N samples")
    args = parser.parse_args()

    if args.device == "cpu":
        # in-process pin: the environment may force a TPU platform via
        # sitecustomize, ignoring the JAX_PLATFORMS env var
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from bevfusion_multimodal_3d_object_detection_tpu.data import (
        NuScenesDataset,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.inference_engine import (
        InferenceEngine,
    )

    engine = InferenceEngine(model_path=args.model, config_path=args.config)
    dataset = NuScenesDataset(
        data_root=args.data_root, split=args.split,
        config=engine.config, seed=0,
    )

    if args.batch is not None:
        engine.batch_inference(
            dataset, num_samples=args.batch, save_dir=args.save_dir
        )
    else:
        engine.run_inference(
            dataset[args.sample_idx],
            visualize=not args.no_show,
            save_dir=args.save_dir,
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Validator + GT-sample printer CLI (ref: validate_data_with_samples.py:409-461).

  python validate_data_with_samples.py [--config configs/base.yaml]
                                       [--split train|val|test] [--samples 5]
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Validate converted NuScenes data and print GT samples"
    )
    parser.add_argument("--config", type=str, default="configs/base.yaml",
                        help="Path to configuration file")
    parser.add_argument("--split", type=str, default=None,
                        choices=["train", "val", "test"],
                        help="Validate specific split only (default: all)")
    parser.add_argument("--samples", type=int, default=5,
                        help="Number of GT samples to print")
    args = parser.parse_args()

    from bevfusion_multimodal_3d_object_detection_tpu.data.validate import (
        ConfigDrivenDataValidator,
    )

    try:
        validator = ConfigDrivenDataValidator(config_path=args.config)
    except FileNotFoundError:
        print(f"Error: Configuration file '{args.config}' not found!")
        sys.exit(1)

    splits = [args.split] if args.split else ["train", "val", "test"]
    ok = True
    for split in splits:
        ok = validator.validate_split(split) and ok
        validator.print_sample_boxes(split, num_samples=args.samples)
    if not validator.report() or not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Converted-data validator CLI (ref: data_validate.py:300-349).

  python data_validate.py [--config configs/base.yaml]
                          [--split train|val|test]

Exits nonzero on validation failure (ref: data_validate.py:340).
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Validate converted NuScenes data using config.yaml"
    )
    parser.add_argument("--config", type=str, default="configs/base.yaml",
                        help="Path to configuration file")
    parser.add_argument("--split", type=str, default=None,
                        choices=["train", "val", "test"],
                        help="Validate specific split only (default: all)")
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
    if not validator.report() or not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""nuScenes -> pickle converter CLI (ref: data_converter.py:454-517).

  python data_converter.py [--config configs/base.yaml]
                           [--split train|val|test] [--show-config]
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Convert NuScenes to info pickles using config.yaml"
    )
    parser.add_argument("--config", type=str, default="configs/base.yaml",
                        help="Path to configuration file")
    parser.add_argument("--split", type=str, default=None,
                        choices=["train", "val", "test"],
                        help="Convert specific split only (default: all)")
    parser.add_argument("--show-config", action="store_true",
                        help="Show configuration summary and exit")
    args = parser.parse_args()

    from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
        ConfigDrivenNuScenesConverter,
    )

    try:
        converter = ConfigDrivenNuScenesConverter(config_path=args.config)
    except FileNotFoundError:
        print(f"Error: Configuration file '{args.config}' not found!")
        sys.exit(1)
    except ImportError as e:
        print(f"Error: {e}")
        sys.exit(1)

    if args.show_config:
        converter.show_config()
        return

    splits = [args.split] if args.split else ["train", "val", "test"]
    for split in splits:
        infos = converter.convert_split(split)
        converter.save_infos(infos, split)


if __name__ == "__main__":
    main()

"""CLI: build an octree from a PLY file (reference: src/bin/build_octree.rs).

Usage: python -m point_cloud_viewer_tpu.cli.build_octree INPUT.ply \
           --output_directory DIR [--resolution 0.001] [--use_device]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="PLY file to parse for points")
    parser.add_argument("--output_directory", required=True)
    parser.add_argument(
        "--resolution",
        type=float,
        default=0.001,
        help="Minimal precision that this point cloud should have (meters).",
    )
    parser.add_argument(
        "--attributes",
        nargs="*",
        default=None,
        help="Attributes to store (default: all present in the input).",
    )
    parser.add_argument(
        "--use_device",
        action="store_true",
        help="Run the Morton sort on the default JAX device (TPU).",
    )
    args = parser.parse_args(argv)

    from ..octree.builder import build_octree_from_file

    result = build_octree_from_file(
        args.output_directory,
        args.resolution,
        args.input,
        attributes=args.attributes,
        use_device=args.use_device,
    )
    print(
        f"Built octree with {result.num_points} points in "
        f"{len(result.nodes)} nodes (depth cap {result.depth_cap}) "
        f"at {args.output_directory}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

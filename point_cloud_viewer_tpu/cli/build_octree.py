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
        help="Run the tree derivation on the default JAX device (TPU).",
    )
    parser.add_argument(
        "--mesh",
        type=int,
        default=0,
        metavar="N",
        help="Shard the sort stage over an N-device jax.sharding.Mesh "
        "(multi-chip build; output is bit-identical to single-chip).",
    )
    parser.add_argument(
        "--streaming",
        action="store_true",
        help="Bounded-memory out-of-core build (for clouds larger than RAM).",
    )
    parser.add_argument("--bucket_levels", type=int, default=2)
    parser.add_argument(
        "--num_threads", type=int, default=None,
        help="Node-file write pool size — set as high as possible for "
        "SSDs (reference build_octree.rs:36-38; default: cpu-derived).",
    )
    parser.add_argument(
        "--spill_directory",
        default=None,
        help="Spill directory for --streaming builds; giving one makes the "
        "build RESUMABLE (re-run the same command after a crash to "
        "continue from the last finished bucket).",
    )
    args = parser.parse_args(argv)

    if args.streaming and args.mesh:
        parser.error(
            "--mesh is not supported with --streaming (the out-of-core "
            "builder shards over disk buckets instead of devices)"
        )
    if args.spill_directory and not args.streaming:
        parser.error("--spill_directory requires --streaming")
    if args.num_threads is not None:
        if args.num_threads <= 0:
            parser.error("--num_threads must be positive")
        import os

        os.environ["PCV_WRITE_THREADS"] = str(args.num_threads)
    if args.streaming:
        from ..io.ply import PlyReader
        from ..octree.streaming import build_octree_streaming

        result = build_octree_streaming(
            args.output_directory,
            args.resolution,
            PlyReader(args.input),
            attributes=args.attributes,
            bucket_levels=args.bucket_levels,
            spill_directory=args.spill_directory,
            use_device=args.use_device,
        )
    else:
        from ..octree.builder import build_octree_from_file

        mesh = None
        if args.mesh:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(args.mesh)
        result = build_octree_from_file(
            args.output_directory,
            args.resolution,
            args.input,
            attributes=args.attributes,
            use_device=args.use_device,
            mesh=mesh,
        )
    print(
        f"Built octree with {result.num_points} points in "
        f"{len(result.nodes)} nodes (depth cap {result.depth_cap}) "
        f"at {args.output_directory}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

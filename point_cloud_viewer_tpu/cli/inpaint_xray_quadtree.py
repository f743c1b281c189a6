"""CLI: inpaint holes in an X-ray quadtree's leaf tiles and rebuild the
pyramid (reference: xray/src/bin/inpaint_xray_quadtree.rs)."""

from __future__ import annotations

import argparse
import sys

from .build_xray_quadtree import _parse_color


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("directory", help="X-ray quadtree directory.")
    parser.add_argument(
        "--inpaint_distance", type=int, default=3,
        help="Maximum hole radius (in pixels) to fill.",
    )
    parser.add_argument("--num_threads", type=int, default=8)
    parser.add_argument(
        "--tile_background_color", default=(255, 255, 255, 255),
        type=_parse_color,
        help="Background assigned to sub-threshold-alpha leaf pixels after "
        "inpainting, R,G,B[,A] (reference inpaint_xray_quadtree.rs:128).",
    )
    args = parser.parse_args(argv)

    from ..xray.build import assign_background_color, create_non_leaf_nodes
    from ..xray.inpaint import perform_inpainting
    from ..xray.meta import XrayMeta

    meta = XrayMeta.from_directory(args.directory)
    leaves = meta.iter_level(meta.deepest_level)
    perform_inpainting(
        args.directory, args.inpaint_distance, leaves, num_threads=args.num_threads
    )
    print(f"Inpainted {len(leaves)} leaf tiles (distance {args.inpaint_distance}px).")
    # The reference tool ALWAYS runs these two steps after inpainting
    # (inpaint_xray_quadtree.rs:127-136): assign the background color to
    # leaves, then rebuild every ancestor so the pyramid shows the
    # inpainted content instead of the stale holes.
    assign_background_color(args.directory, args.tile_background_color, set(leaves))
    root = meta.root_node()
    create_non_leaf_nodes(
        set(leaves), meta.deepest_level, root.level if root else 0,
        args.directory, args.tile_background_color, meta.tile_size,
    )
    print("Assigned background color and rebuilt pyramid.")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""point_cloud_viewer_tpu — a TPU-native framework for building, querying and
viewing massive point clouds.

A brand-new JAX/XLA/Pallas implementation with the same capabilities as
cartographer-project/point_cloud_viewer (reference surveyed in SURVEY.md):

* octree + S2-cell point cloud construction from PLY inputs,
* streaming geometric point queries (AABB / OBB / frustum / S2 cell union /
  Web-Mercator rect, with attribute interval filters),
* X-ray orthographic quadtree map-tile generation,
* interactive viewing via LOD node selection and a web backend.

Design stance (see ARCHITECTURE.md): the point array is an HBM-resident
tensor.  The octree is an index structure computed by Morton-code sorting and
segmented reductions — not a recursion; queries are vectorized masks — not
per-point virtual calls.  On-disk formats (meta.pb v13, encoded node files,
xray PNG quadtrees) and the web wire format stay compatible with the
reference so its existing viewers render our output unchanged.
"""

__version__ = "0.1.0"

from .core.constants import (  # noqa: F401 — public constants
    CURRENT_VERSION,
    META_FILENAME,
    NUM_POINTS_PER_BATCH,
    MAX_POINTS_PER_NODE,
)

__all__ = [
    "CURRENT_VERSION",
    "META_FILENAME",
    "NUM_POINTS_PER_BATCH",
    "MAX_POINTS_PER_NODE",
    "PointsBatch",
    "build_octree",
    "build_octree_streaming",
    "build_s2_cloud",
    "Octree",
    "S2Cells",
    "PointCloudClient",
    "PointQuery",
]


def __getattr__(name):  # lazy re-exports keep import light
    if name == "PointsBatch":
        from .core.points_batch import PointsBatch

        return PointsBatch
    if name == "build_octree":
        from .octree.builder import build_octree

        return build_octree
    if name == "build_octree_streaming":
        from .octree.streaming import build_octree_streaming

        return build_octree_streaming
    if name == "build_s2_cloud":
        from .s2_cells.splitter import build_s2_cloud

        return build_s2_cloud
    if name == "Octree":
        from .octree.octree import Octree

        return Octree
    if name == "S2Cells":
        from .s2_cells.container import S2Cells

        return S2Cells
    if name == "PointCloudClient":
        from .query.client import PointCloudClient

        return PointCloudClient
    if name == "PointQuery":
        from .query.point_query import PointQuery

        return PointQuery
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

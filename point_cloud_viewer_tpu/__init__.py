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

from .core.constants import (
    CURRENT_VERSION,
    META_FILENAME,
    NUM_POINTS_PER_BATCH,
    MAX_POINTS_PER_NODE,
)

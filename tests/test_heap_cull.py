"""Best-first heap cull: parity with the flat native/numpy paths and
budget-bound behavior in the all-visible worst case (reference semantics:
src/octree/mod.rs:228-283)."""

import numpy as np
import pytest

from point_cloud_viewer_tpu import native
from point_cloud_viewer_tpu.math.geometry import (
    Cube, Frustum, Isometry, Perspective,
)
from point_cloud_viewer_tpu.octree.node_id import bounding_cubes2
from point_cloud_viewer_tpu.octree.octree import Octree


@pytest.fixture(scope="module")
def valid_tree():
    """A valid ~37k-node tree: complete to level 4, plus a random half of
    level 5 (ancestors all present), random point counts incl. zeros."""
    rng = np.random.default_rng(11)
    levels = [np.full(8**l, l, dtype=np.uint8) for l in range(5)]
    paths = [np.arange(8**l, dtype=np.uint64) for l in range(5)]
    pick5 = np.sort(rng.choice(8**5, size=8**5 // 2, replace=False)).astype(
        np.uint64
    )
    levels.append(np.full(len(pick5), 5, dtype=np.uint8))
    paths.append(pick5)
    octree = Octree.__new__(Octree)
    octree.levels = np.concatenate(levels)
    octree.path_hi = np.zeros(len(octree.levels), dtype=np.uint64)
    octree.path_lo = np.concatenate(paths)
    # Some drained (0-point) nodes: traversed but never emitted.
    octree.num_points = rng.integers(0, 50, len(octree.levels)).astype(np.int64)
    octree.root_cube = Cube(np.zeros(3), 256.0)
    octree.cube_mins, octree.cube_edges = bounding_cubes2(
        octree.levels, octree.path_hi, octree.path_lo, octree.root_cube
    )
    octree._coarse = None
    octree._heap = None
    if native.available():
        octree._build_heap_index()
    return octree


def _frustums():
    eye_partial = Isometry.from_axis_angle(
        [0, 1, 0], 0.4, translation=[80.0, 60.0, 150.0]
    )
    eye_all = Isometry.from_axis_angle(
        [0, 1, 0], 0.0, translation=[128.0, 128.0, 1200.0]
    )
    return {
        "partial": Frustum.new(
            eye_partial, Perspective.from_fov(1.0, 0.8, 1.0, 200.0)
        ),
        "all_visible": Frustum.new(
            eye_all, Perspective.from_fov(1.2, 1.0, 1.0, 4000.0)
        ),
    }


@pytest.mark.skipif(not native.available(), reason="native library required")
@pytest.mark.parametrize("view", ["partial", "all_visible"])
@pytest.mark.parametrize("budget", [64, 1000])
def test_heap_matches_flat_topk(valid_tree, view, budget):
    octree = valid_tree
    assert octree._heap is not None, "heap index failed to build"
    frustum = _frustums()[view]

    heap_order, heap_sizes = octree.visible_nodes_with_sizes(
        frustum, max_nodes=budget
    )
    heap = octree._heap
    octree._heap = None  # force the flat path
    try:
        flat_order, flat_sizes = octree.visible_nodes_with_sizes(
            frustum, max_nodes=budget
        )
    finally:
        octree._heap = heap

    assert len(heap_order) == len(flat_order)
    # The emitted PRIORITY sequence must match exactly (index permutations
    # may differ on ties — both kernels break ties arbitrarily).
    np.testing.assert_allclose(heap_sizes, flat_sizes, rtol=1e-12)
    # And the emitted sets agree up to tie groups: compare as multisets of
    # (size, level) pairs.
    hk = sorted(zip(heap_sizes.round(12), octree.levels[heap_order]))
    fk = sorted(zip(flat_sizes.round(12), octree.levels[flat_order]))
    assert hk == fk
    # No zero-point node is ever emitted.
    assert (octree.num_points[heap_order] > 0).all()


@pytest.mark.skipif(not native.available(), reason="native library required")
def test_heap_unbudgeted_path_unchanged(valid_tree):
    """Without a node budget the container keeps the flat/coarse paths —
    the heap is only entered when max_nodes bounds the traversal."""
    octree = valid_tree
    frustum = _frustums()["partial"]
    order_a, sizes_a = octree.visible_nodes_with_sizes(frustum)
    heap = octree._heap
    octree._heap = None
    try:
        order_b, sizes_b = octree.visible_nodes_with_sizes(frustum)
    finally:
        octree._heap = heap
    np.testing.assert_array_equal(order_a, order_b)


@pytest.mark.skipif(not native.available(), reason="native library required")
def test_heap_index_refuses_invalid_tree():
    """A node table with missing ancestors must NOT build a heap index
    (traversal would silently drop subtrees)."""
    rng = np.random.default_rng(3)
    octree = Octree.__new__(Octree)
    octree.levels = np.full(1000, 6, dtype=np.uint8)  # no root, no parents
    octree.path_hi = np.zeros(1000, dtype=np.uint64)
    octree.path_lo = np.sort(
        rng.choice(8**6, size=1000, replace=False).astype(np.uint64)
    )
    octree.num_points = np.full(1000, 5, dtype=np.int64)
    octree.root_cube = Cube(np.zeros(3), 64.0)
    octree.cube_mins, octree.cube_edges = bounding_cubes2(
        octree.levels, octree.path_hi, octree.path_lo, octree.root_cube
    )
    octree._heap = None
    octree._build_heap_index()
    assert octree._heap is None


@pytest.mark.skipif(not native.available(), reason="native library required")
@pytest.mark.parametrize("budget", [16, 500])
def test_flat_topk_tie_order_matches_full_sort(valid_tree, budget):
    """cull_lod_select's top-K partial sort must emit EXACTLY the stable
    full-sort prefix, including across ties (all-visible views clamp many
    nodes to projected area 4; culled nodes all share lowest()) — the
    viewer's budgeted set must be deterministic and path-independent."""
    octree = valid_tree
    frustum = _frustums()["all_visible"]
    cached = frustum.intersector().cached_axes_for_aabb()
    proj = cached.corners @ cached.axes.T
    qmin, qmax = proj.min(axis=0), proj.max(axis=0)

    full = native.cull_lod_select(
        frustum.clip_from_query, cached.axes, qmin, qmax,
        octree.cube_mins, octree.cube_edges, octree.num_points,
        dtype=np.float64, max_out=0,
    )
    topk = native.cull_lod_select(
        frustum.clip_from_query, cached.axes, qmin, qmax,
        octree.cube_mins, octree.cube_edges, octree.num_points,
        dtype=np.float64, max_out=budget,
    )
    assert full is not None and topk is not None
    full_order, full_sizes, _ = full
    topk_order, _, _ = topk
    # Ties exist in this view (else the test is vacuous).
    kept_sizes = full_sizes[full_order[:budget]]
    assert len(np.unique(kept_sizes.round(12))) < budget
    np.testing.assert_array_equal(topk_order[:budget], full_order[:budget])

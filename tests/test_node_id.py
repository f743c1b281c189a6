"""NodeId algebra tests (behavioral parity with reference
src/octree/node.rs:272-318 unit tests, re-derived)."""

import numpy as np
import pytest

from point_cloud_viewer_tpu.math.geometry import Aabb, Cube
from point_cloud_viewer_tpu.octree.node_id import (
    NodeId,
    bounding_cubes,
    child_index_from_cube,
    unpack_ids,
)


def test_string_roundtrip():
    for name in ["r", "r0", "r7", "r123", "r00007", "r74125630"]:
        assert str(NodeId.from_str(name)) == name


def test_level_and_index():
    n = NodeId.from_str("r123")
    assert n.level == 3
    assert n.index == 0o123


def test_child_parent():
    root = NodeId.root()
    child = root.child(5)
    assert str(child) == "r5"
    grandchild = child.child(0)
    assert str(grandchild) == "r50"
    assert grandchild.parent() == child
    assert child.parent() == root
    assert root.parent() is None
    assert grandchild.child_index_in_parent() == 0
    assert child.child_index_in_parent() == 5


def test_octal_leading_zeros_preserved():
    n = NodeId.from_level_index(5, 7)
    assert str(n) == "r00007"
    assert NodeId.from_str("r00007") == n


def test_bounding_cube_descent():
    root = Cube(np.zeros(3), 16.0)
    # child 4 = x-high, y-low, z-low
    c = NodeId.from_str("r4").find_bounding_cube(root)
    assert np.allclose(c.min, [8.0, 0.0, 0.0])
    assert c.edge_length == 8.0
    # r45: child 5 of r4 = x-high, y-low, z-high
    c = NodeId.from_str("r45").find_bounding_cube(root)
    assert np.allclose(c.min, [12.0, 0.0, 4.0])
    assert c.edge_length == 4.0


def test_child_index_from_cube():
    cube = Cube(np.zeros(3), 2.0)
    points = np.array(
        [
            [0.5, 0.5, 0.5],  # low, low, low -> 0
            [1.5, 0.5, 0.5],  # x-high -> 4
            [0.5, 1.5, 0.5],  # y-high -> 2
            [0.5, 0.5, 1.5],  # z-high -> 1
            [1.5, 1.5, 1.5],  # all high -> 7
            [1.0, 1.0, 1.0],  # exactly at center -> low (strict >)
        ]
    )
    np.testing.assert_array_equal(
        child_index_from_cube(cube, points), [0, 4, 2, 1, 7, 0]
    )


def test_vectorized_bounding_cubes_match_scalar():
    rng = np.random.default_rng(0)
    root = Cube(np.array([-3.7, 11.1, 0.25]), 37.3)
    ids = [NodeId.root()]
    for _ in range(200):
        level = int(rng.integers(1, 12))
        path = int(rng.integers(0, 8**level))
        ids.append(NodeId.from_level_index(level, path))
    levels, paths = unpack_ids(ids)
    mins, edges = bounding_cubes(levels, paths, root)
    for i, nid in enumerate(ids):
        cube = nid.find_bounding_cube(root)
        np.testing.assert_array_equal(mins[i], cube.min)
        assert edges[i] == cube.edge_length


def test_cube_bounding_aabb():
    aabb = Aabb([0.0, 0.0, 0.0], [1.0, 2.0, 5.0])
    cube = Cube.bounding(aabb)
    assert cube.edge_length == 5.0
    np.testing.assert_array_equal(cube.min, [0.0, 0.0, 0.0])

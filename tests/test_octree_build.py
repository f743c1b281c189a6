"""End-to-end octree build tests: conservation, on-disk format, LOD
promotion, query correctness vs brute force (reference analogues:
src/octree/tests.rs and point_cloud_test/tests/main.rs)."""

import os

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.constants import MAX_POINTS_PER_NODE
from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import Aabb, Frustum, Isometry, Obb, Perspective
from point_cloud_viewer_tpu.octree.builder import build_octree, build_octree_from_file
from point_cloud_viewer_tpu.octree.node_id import NodeId
from point_cloud_viewer_tpu.octree.octree import Octree
from point_cloud_viewer_tpu.query.location import AllPoints, location_for


def _index_color(n: int) -> np.ndarray:
    """Encode point index in RGB (the reference test suite's trick,
    point_cloud_test/src/synthetic_data.rs:66-74)."""
    idx = np.arange(n, dtype=np.uint32)
    return np.stack(
        [(idx >> 16) & 0xFF, (idx >> 8) & 0xFF, idx & 0xFF], axis=1
    ).astype(np.uint8)


def _color_to_index(color: np.ndarray) -> np.ndarray:
    c = color.astype(np.uint32)
    return (c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2]


@pytest.fixture(scope="module")
def built_cloud(tmp_path_factory):
    rng = np.random.default_rng(1234)
    n = 150_000
    position = rng.random((n, 3)) * np.array([20.0, 10.0, 5.0]) - 10.0
    batch = PointsBatch(
        position=position,
        attributes={
            "color": _index_color(n),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    out = str(tmp_path_factory.mktemp("octree"))
    result = build_octree(out, 0.001, batch)
    return batch, out, result


def test_point_conservation(built_cloud):
    batch, out, result = built_cloud
    assert result.num_points == len(batch)


def test_meta_parses_and_ancestors_exist(built_cloud):
    _, out, result = built_cloud
    octree = Octree.from_directory(out)
    ids = {n.value for n in octree.node_ids}
    assert NodeId.root().value in ids
    for node_id in octree.node_ids:
        for anc in node_id.ancestors():
            assert anc.value in ids
    # Root must have been split: at least one level-1 node.
    assert any(n.level == 1 for n in octree.node_ids)


def test_node_sizes_bounded(built_cloud):
    _, out, _ = built_cloud
    octree = Octree.from_directory(out)
    assert octree.num_points.max() <= MAX_POINTS_PER_NODE


def test_all_points_recoverable_with_index_colors(built_cloud):
    batch, out, result = built_cloud
    octree = Octree.from_directory(out)
    seen = np.zeros(len(batch), dtype=bool)
    max_err = 0.0
    for node_id, count in result.nodes:
        if count == 0:
            continue
        node_batch = octree.points_in_node(node_id, attributes=["color"])
        idx = _color_to_index(node_batch.attributes["color"])
        assert not seen[idx].any(), "point streamed twice"
        seen[idx] = True
        err = np.abs(node_batch.position - batch.position[idx]).max()
        max_err = max(max_err, err)
    assert seen.all(), f"{(~seen).sum()} points lost"
    # Positions quantized to each node's encoding; resolution is the bound.
    assert max_err <= 0.001 * np.sqrt(3)


def test_file_sizes_match_meta(built_cloud):
    _, out, result = built_cloud
    octree = Octree.from_directory(out)
    for node_id, count in result.nodes:
        meta = octree.node_meta(node_id)
        stem = os.path.join(out, str(node_id))
        if count == 0:
            assert not os.path.exists(stem + ".xyz")
            continue
        xyz = os.path.getsize(stem + ".xyz")
        assert xyz == count * 3 * meta.position_encoding.bytes_per_coordinate
        assert os.path.getsize(stem + ".rgb") == count * 3
        assert os.path.getsize(stem + ".intensity") == count * 4


def test_lod_subsampling_populates_interior(built_cloud):
    _, out, _ = built_cloud
    octree = Octree.from_directory(out)
    root_points = octree.node_meta(NodeId.root()).num_points
    assert root_points > 0
    # The root holds roughly 1/8^depth of the points; just require that the
    # tree thins out toward the root.
    assert root_points < MAX_POINTS_PER_NODE


def test_aabb_query_matches_brute_force(built_cloud):
    batch, out, _ = built_cloud
    octree = Octree.from_directory(out)
    query = Aabb([-2.0, -1.0, -9.0], [3.0, 4.0, -7.0])
    location = location_for(query)
    ids = octree.nodes_in_location(location)
    got = []
    for node_id in ids:
        nb = octree.points_in_node(node_id, attributes=["color"])
        keep = location.contains(nb.position)
        got.append(_color_to_index(nb.attributes["color"])[keep])
    got = np.sort(np.concatenate(got)) if got else np.array([], dtype=np.uint32)

    # Brute force on quantized positions (what the octree stores).
    expected_mask = query.contains(batch.position)
    expected = np.sort(np.nonzero(expected_mask)[0])
    # Quantization can flip membership only within `resolution` of the
    # boundary; exclude that shell from the comparison.
    inner = Aabb(query.mins + 0.002, query.maxs - 0.002)
    outer = Aabb(query.mins - 0.002, query.maxs + 0.002)
    must_have = set(np.nonzero(inner.contains(batch.position))[0])
    may_have = set(np.nonzero(outer.contains(batch.position))[0])
    got_set = set(got.tolist())
    assert must_have <= got_set <= may_have


def test_obb_query_matches_brute_force(built_cloud):
    batch, out, _ = built_cloud
    octree = Octree.from_directory(out)
    obb = Obb(
        Isometry.from_axis_angle([0, 0, 1], 0.7, translation=[0.0, 0.0, -8.0]),
        [3.0, 2.0, 1.0],
    )
    location = location_for(obb)
    got = []
    for node_id in octree.nodes_in_location(location):
        nb = octree.points_in_node(node_id, attributes=["color"])
        keep = location.contains(nb.position)
        got.append(_color_to_index(nb.attributes["color"])[keep])
    got_set = set(np.concatenate(got).tolist()) if got else set()

    inner = Obb(obb.query_from_obb, np.asarray(obb.half_extent) - 0.002)
    outer = Obb(obb.query_from_obb, np.asarray(obb.half_extent) + 0.002)
    must_have = set(np.nonzero(inner.contains(batch.position))[0])
    may_have = set(np.nonzero(outer.contains(batch.position))[0])
    assert must_have <= got_set <= may_have


def test_all_points_location(built_cloud):
    batch, out, _ = built_cloud
    octree = Octree.from_directory(out)
    ids = octree.nodes_in_location(AllPoints())
    total = sum(octree.node_meta(n).num_points for n in ids)
    assert total == len(batch)


def test_get_visible_nodes(built_cloud):
    _, out, _ = built_cloud
    octree = Octree.from_directory(out)
    # A frustum containing the whole cloud -> every non-empty node, in
    # decreasing screen-size order (root first).
    eye = Isometry.from_axis_angle([1, 0, 0], 0.0, translation=[0.0, 0.0, 60.0])
    frustum = Frustum.new(eye, Perspective.from_fov(1.0, 1.4, 1.0, 500.0))
    visible = octree.get_visible_nodes(frustum.clip_from_query)
    nonempty = int((octree.num_points > 0).sum())
    assert len(visible) == nonempty
    assert visible[0] == NodeId.root()
    # A frustum looking away -> nothing.
    eye_away = Isometry.from_axis_angle([0, 1, 0], np.pi, translation=[0.0, 0.0, 600.0])
    frustum_away = Frustum.new(eye_away, Perspective.from_fov(1.0, 1.4, 1.0, 100.0))
    assert octree.get_visible_nodes(frustum_away.clip_from_query) == []


def test_build_from_reference_ply(tmp_path):
    out = str(tmp_path / "ply_octree")
    result = build_octree_from_file(
        out, 0.001, "/root/reference/src/test_data/xyz_f32_rgb_u8_le.ply"
    )
    assert result.num_points == 8
    octree = Octree.from_directory(out)
    got = 0
    for node_id, count in result.nodes:
        if count:
            nb = octree.points_in_node(node_id, attributes=["color"])
            got += len(nb)
    assert got == 8


def test_empty_and_single_point(tmp_path):
    out = str(tmp_path / "empty")
    result = build_octree(out, 0.01, PointsBatch(position=np.empty((0, 3))))
    assert result.nodes == []
    out2 = str(tmp_path / "single")
    batch = PointsBatch(
        position=np.array([[1.0, 2.0, 3.0]]),
        attributes={"color": np.array([[9, 8, 7]], dtype=np.uint8)},
    )
    result2 = build_octree(out2, 0.01, batch)
    assert result2.num_points == 1
    octree = Octree.from_directory(out2)
    # The single point is promoted to the root; its leaf is recorded empty.
    assert octree.node_meta(NodeId.root()).num_points == 1


def test_hierarchical_cull_matches_flat(tmp_path):
    """Above _HIER_THRESHOLD nodes the container culls coarse ancestor
    cells first; the result (visible set + priority order) must equal the
    flat single-pass cull exactly."""
    import os

    import numpy as np

    from point_cloud_viewer_tpu.core.constants import CURRENT_VERSION
    from point_cloud_viewer_tpu.math.geometry import (
        Frustum, Isometry, Perspective,
    )
    from point_cloud_viewer_tpu.octree.node_id import NodeId
    from point_cloud_viewer_tpu.octree.octree import Octree
    from point_cloud_viewer_tpu.protos.meta import (
        BoundingBoxProto, MetaProto, OctreeMetaProto, OctreeNodeProto,
        PositionEncodingProto,
    )

    rng = np.random.default_rng(5)
    n_nodes = 120_000
    ids = set()
    # Random deep nodes at levels 6-9 plus a handful of shallow ones.
    for lvl in (0, 1, 2, 3):
        path = 0
        for _ in range(lvl):
            path = (path << 3) | int(rng.integers(0, 8))
        ids.add((lvl, path))
    while len(ids) < n_nodes:
        lvl = int(rng.integers(6, 10))
        path = int(rng.integers(0, 8 ** lvl))
        ids.add((lvl, path))
    nodes = [
        OctreeNodeProto(
            id=NodeId.from_level_index(lvl, path).value,
            num_points=int(rng.integers(0, 100)),
            position_encoding=PositionEncodingProto.UINT16,
        )
        for lvl, path in sorted(ids)
    ]
    meta = MetaProto(
        version=CURRENT_VERSION,
        bounding_box=BoundingBoxProto(min=(0.0, 0.0, 0.0),
                                      max=(128.0, 128.0, 128.0)),
        octree=OctreeMetaProto(resolution=0.001, nodes=nodes),
    )
    d = str(tmp_path / "big")
    os.makedirs(d)
    with open(os.path.join(d, "meta.pb"), "wb") as f:
        f.write(meta.encode())

    octree = Octree.from_directory(d)
    assert octree._coarse is not None

    eye = Isometry.from_axis_angle([0, 1, 0], 0.35,
                                   translation=[64.0, 50.0, 300.0])
    frustum = Frustum.new(eye, Perspective.from_fov(1.2, 1.0, 1.0, 260.0))

    hier_order, hier_sizes = octree.visible_nodes_with_sizes(frustum)
    octree._coarse = None  # force the flat path
    flat_order, flat_sizes = octree.visible_nodes_with_sizes(frustum)

    assert set(hier_order.tolist()) == set(flat_order.tolist())
    # Priority sequences match (index permutations may differ on ties).
    np.testing.assert_allclose(hier_sizes, flat_sizes, rtol=1e-12)

    # top-K also agrees through the hierarchy.
    octree._build_coarse_index()
    top_order, top_sizes = octree.visible_nodes_with_sizes(frustum, max_nodes=50)
    np.testing.assert_allclose(top_sizes, flat_sizes[:50], rtol=1e-12)


@pytest.mark.parametrize("case", ["identical", "two_values", "collinear", "planar"])
def test_pathological_clouds_native_equals_numpy(tmp_path, case):
    """Adversarial inputs (degenerate geometry, massive duplicate runs)
    must build byte-identically through the native kernels and the pure
    numpy fallbacks."""
    import os

    from point_cloud_viewer_tpu import native

    rng = np.random.default_rng(41)
    n = 150_000  # above every native-path threshold
    if case == "identical":
        pos = np.tile(np.array([[3.0, 4.0, 5.0]]), (n, 1))
    elif case == "two_values":
        pos = np.where(
            (np.arange(n) % 2 == 0)[:, None],
            np.array([[1.0, 1.0, 1.0]]), np.array([[9.0, 9.0, 9.0]]),
        )
    elif case == "collinear":
        t = rng.random(n)
        pos = np.stack([t * 10, t * 10, t * 10], axis=1)
    else:  # planar
        pos = np.stack([rng.random(n) * 10, rng.random(n) * 10,
                        np.zeros(n)], axis=1)
    batch = PointsBatch(
        position=pos,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    a = str(tmp_path / "native")
    b = str(tmp_path / "numpy")
    build_octree(a, 0.01, batch)
    with native.disabled():
        build_octree(b, 0.01, batch)
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(a, b, context=f"native vs numpy ({case})")


def test_incore_device_grouped_exchange_one_point_leaves(tmp_path):
    """In-core use_device now rides the grouped exchange (r5): byte
    identity vs the host build must hold INCLUDING zero-point meta nodes
    from promoted-away 1-point leaves (the extras records), and the
    root-node emission (include_root)."""
    import os

    from point_cloud_viewer_tpu.octree.octree import Octree
    from tests.test_streaming_build import _one_point_leaf_batch

    batch = _one_point_leaf_batch()
    host_dir, dev_dir = str(tmp_path / "host"), str(tmp_path / "dev")
    build_octree(host_dir, 0.01, batch)
    build_octree(dev_dir, 0.01, batch, use_device=True)
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(host_dir, dev_dir,
                           context="in-core grouped exchange")
    octree = Octree.from_directory(dev_dir)
    assert (octree.num_points == 0).sum() >= 1

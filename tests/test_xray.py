"""X-ray subsystem tests: quadtree algebra, meta round-trip, tile
generation with every coloring strategy, pyramid build, tile selection,
partial-build merge."""

import os

import numpy as np
import pytest
from PIL import Image

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import Frustum
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.protos.xray_meta import (
    RectProto,
    XrayMetaProto,
    XrayNodeIdProto,
)
from point_cloud_viewer_tpu.query.client import PointCloudClient
from point_cloud_viewer_tpu.xray.build import (
    XrayParameters,
    build_xray_quadtree,
    find_quadtree_bounding_rect_and_levels,
    image_path,
)
from point_cloud_viewer_tpu.xray.merge import merge_xray_quadtrees
from point_cloud_viewer_tpu.xray.meta import XrayMeta
from point_cloud_viewer_tpu.xray.quadtree import (
    Direction,
    QuadNodeId,
    Rect,
    SpatialNodeId,
    nodes_at_level,
)


def test_quad_node_id_strings():
    for name in ["r", "r0", "r3", "r123", "r0032"]:
        assert str(QuadNodeId.from_str(name)) == name
    n = QuadNodeId.from_str("r123")
    assert n.level == 3 and n.index == 0o1 * 16 + 2 * 4 + 3


def test_quad_child_parent_and_rect():
    root = QuadNodeId.root()
    rect = Rect(0.0, 0.0, 16.0)
    c2 = root.child(2)  # x-high, y-low
    r = c2.find_bounding_rect(rect)
    assert (r.min_x, r.min_y, r.edge_length) == (8.0, 0.0, 8.0)
    c1 = root.child(1)  # y-high
    r = c1.find_bounding_rect(rect)
    assert (r.min_x, r.min_y, r.edge_length) == (0.0, 8.0, 8.0)
    assert c2.parent() == root


def test_spatial_node_id_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        level = int(rng.integers(0, 12))
        index = int(rng.integers(0, 4**level)) if level else 0
        nid = QuadNodeId(level, index)
        assert nid.to_spatial().to_node_id() == nid


def test_neighbors():
    nid = SpatialNodeId(3, 4, 4)
    left = nid.neighbor(Direction.LEFT)
    assert (left.x, left.y) == (3, 4)
    corner = SpatialNodeId(3, 0, 0)
    assert corner.neighbor(Direction.LEFT) is None
    assert corner.neighbor(Direction.BOTTOM) is None
    top = corner.neighbor(Direction.TOP)
    assert (top.x, top.y) == (0, 1)


def test_xray_meta_roundtrip(tmp_path):
    meta = XrayMetaProto(
        version=3,
        bounding_rect=RectProto(min=(1.5, -2.5), edge_length=512.0),
        deepest_level=5,
        tile_size=256,
        nodes=[XrayNodeIdProto(0, 0), XrayNodeIdProto(2, 7)],
    )
    back = XrayMetaProto.decode(meta.encode())
    assert back.bounding_rect == meta.bounding_rect
    assert back.nodes == meta.nodes
    assert back.tile_size == 256 and back.deepest_level == 5


def test_find_quadtree_bounding_rect():
    from point_cloud_viewer_tpu.math.geometry import Aabb

    bbox = Aabb([0, 0, 0], [10.0, 5.0, 2.0])
    rect, levels = find_quadtree_bounding_rect_and_levels(bbox, 256, 0.01)
    assert rect.edge_length >= 10.0
    assert rect.edge_length == 2.56 * 2**levels


@pytest.fixture(scope="module")
def cloud_dir(tmp_path_factory):
    rng = np.random.default_rng(17)
    n = 60_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * np.array([4.0, 4.0, 1.0]),
        attributes={
            "color": rng.integers(0, 256, (n, 3), dtype=np.uint8),
            "intensity": (rng.random(n) * 100).astype(np.float32),
        },
    )
    out = str(tmp_path_factory.mktemp("cloud"))
    build_octree(out, 0.001, batch)
    return out


@pytest.mark.parametrize(
    "kind,kwargs",
    [
        ("xray", {}),
        ("colored", {}),
        ("colored_with_intensity", {"min_intensity": 1.0, "max_intensity": 100.0}),
        ("colored_with_height_stddev", {"max_stddev": 0.5}),
    ],
)
def test_build_xray_quadtree_strategies(cloud_dir, tmp_path, kind, kwargs):
    out = str(tmp_path / f"xray_{kind}")
    client = PointCloudClient.from_locations([cloud_dir], num_threads=2)
    params = XrayParameters(
        output_directory=out,
        point_cloud_client=client,
        tile_size_px=64,
        pixel_size_m=0.05,
    )
    meta = build_xray_quadtree(kind, params, strategy_kwargs=kwargs, num_threads=2)
    # Root tile exists, meta parses, pyramid is connected.
    assert os.path.exists(os.path.join(out, "meta.pb"))
    loaded = XrayMeta.from_directory(out)
    assert loaded.tile_size == 64
    assert QuadNodeId.root() in loaded.nodes
    for node in loaded.nodes:
        assert os.path.exists(image_path(out, node))
        if node.level > 0:
            assert node.parent() in loaded.nodes
    img = np.asarray(Image.open(image_path(out, QuadNodeId.root())))
    assert img.shape == (64, 64, 4)
    # The cloud covers the full tile area; most pixels must be non-background.
    assert (img[:, :, 3] == 255).all()


def test_get_nodes_for_level(cloud_dir, tmp_path):
    out = str(tmp_path / "xray")
    client = PointCloudClient.from_locations([cloud_dir], num_threads=2)
    params = XrayParameters(
        output_directory=out,
        point_cloud_client=client,
        tile_size_px=64,
        pixel_size_m=0.05,
    )
    build_xray_quadtree("xray", params, num_threads=2)
    meta = XrayMeta.from_directory(out)
    # An orthographic-ish matrix covering everything.
    level = meta.deepest_level
    frustum_matrix = np.array(
        [
            [0.2, 0, 0, -0.5],
            [0, 0.2, 0, -0.5],
            [0, 0, 0.2, 0],
            [0, 0, 0, 1],
        ]
    )
    entries = list(frustum_matrix.T.reshape(-1))  # column-major
    tiles = meta.get_nodes_for_level(level, entries)
    assert len(tiles) == len(meta.iter_level(level))
    with pytest.raises(ValueError):
        meta.get_nodes_for_level(level, [1.0] * 15)


def test_partial_build_and_merge(cloud_dir, tmp_path):
    client = PointCloudClient.from_locations([cloud_dir], num_threads=2)
    parts = []
    for quadrant in range(4):
        out = str(tmp_path / f"part{quadrant}")
        params = XrayParameters(
            output_directory=out,
            point_cloud_client=client,
            tile_size_px=64,
            pixel_size_m=0.05,
            root_node_id=QuadNodeId.root().child(quadrant),
        )
        build_xray_quadtree("xray", params, num_threads=2)
        parts.append(out)
    merged_dir = str(tmp_path / "merged")
    merged = merge_xray_quadtrees(merged_dir, parts)
    assert QuadNodeId.root() in merged.nodes
    assert os.path.exists(image_path(merged_dir, QuadNodeId.root()))
    # Compare against a direct full build: same node set.
    full_dir = str(tmp_path / "full")
    params = XrayParameters(
        output_directory=full_dir,
        point_cloud_client=client,
        tile_size_px=64,
        pixel_size_m=0.05,
    )
    build_xray_quadtree("xray", params, num_threads=2)
    full = XrayMeta.from_directory(full_dir)
    assert merged.nodes == full.nodes


def test_build_xray_quadtree_device_byte_identical(cloud_dir, tmp_path):
    """A full quadtree build with device splat kernels must write
    byte-identical PNG tiles + meta to the host build."""
    import os

    for label, device in (("host", False), ("dev", True)):
        out = str(tmp_path / label)
        client = PointCloudClient.from_locations([cloud_dir], num_threads=2)
        params = XrayParameters(
            output_directory=out,
            point_cloud_client=client,
            tile_size_px=64,
            pixel_size_m=0.05,
        )
        build_xray_quadtree(
            "xray", params, strategy_kwargs={"device": device}, num_threads=2
        )
    from tests.conftest import assert_dirs_byte_equal

    assert len(os.listdir(str(tmp_path / "host"))) > 3
    assert_dirs_byte_equal(str(tmp_path / "host"), str(tmp_path / "dev"),
                           context="xray device vs host")

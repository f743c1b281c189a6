"""The octree-vs-S2 equivalence suite — the framework's correctness anchor
(reference: point_cloud_test/tests/main.rs + synthetic_data.rs, re-derived).

Synthetic Earth data: seeded-random points in a local ENU frame at a random
location, transformed to ECEF; the point index is encoded in the RGB color
so streamed results can be re-identified.  The same data is built into BOTH
containers; every query geometry must yield (nearly) the same point set
from each."""

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math import s2
from point_cloud_viewer_tpu.math.geometry import Aabb, Frustum, Isometry, Obb, Perspective
from point_cloud_viewer_tpu.math.web_mercator import (
    WebMercatorRect,
    lat_lng_to_web_mercator,
)
from point_cloud_viewer_tpu.math.wgs84 import ecef_to_geodetic, local_frame_from_lat_lng
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.query.client import PointCloudClient
from point_cloud_viewer_tpu.query.point_query import PointQuery
from point_cloud_viewer_tpu.s2_cells.cell_union import CellUnion
from point_cloud_viewer_tpu.s2_cells.splitter import build_s2_cloud

N = 1_000_000  # the reference fixture's size (point_cloud_test/src/lib.rs:48)
RESOLUTION = 0.01
LAT, LNG = 37.4, -122.1  # fixed seed site
EXTENT = 300.0  # meters


def _index_color(n):
    idx = np.arange(n, dtype=np.uint32)
    return np.stack([(idx >> 16) & 0xFF, (idx >> 8) & 0xFF, idx & 0xFF], axis=1).astype(
        np.uint8
    )


def _indices(batches):
    out = []
    for b in batches:
        c = b.attributes["color"].astype(np.uint32)
        out.append((c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2])
    return np.sort(np.concatenate(out)) if out else np.array([], dtype=np.uint32)


@pytest.fixture(scope="module")
def earth_data(tmp_path_factory):
    rng = np.random.default_rng(4711)
    local = (rng.random((N, 3)) - 0.5) * np.array([EXTENT, EXTENT, 30.0])
    frame = local_frame_from_lat_lng(LAT, LNG)  # ECEF -> ENU
    ecef = frame.inverse().transform_points(local)
    batch = PointsBatch(
        position=ecef,
        attributes={
            "color": _index_color(N),
            "intensity": rng.random(N).astype(np.float32),
        },
    )
    oct_dir = str(tmp_path_factory.mktemp("octree"))
    s2_dir = str(tmp_path_factory.mktemp("s2"))
    build_octree(oct_dir, RESOLUTION, batch)
    build_s2_cloud(s2_dir, batch, split_level=20)
    return batch, ecef, oct_dir, s2_dir


def _query_both(earth_data, location, attributes=("color",)):
    _, _, oct_dir, s2_dir = earth_data
    results = []
    for d in (oct_dir, s2_dir):
        client = PointCloudClient.from_locations([d], num_threads=4)
        batches = []
        client.for_each_point_data(
            PointQuery(attributes=list(attributes), location=location), batches.append
        )
        results.append(_indices(batches))
    return results


def test_point_count_conservation(earth_data):
    batch, _, oct_dir, s2_dir = earth_data
    from point_cloud_viewer_tpu.io.node_io import OnDiskDataProvider

    for d in (oct_dir, s2_dir):
        meta = OnDiskDataProvider(d).meta_proto()
        if meta.octree is not None:
            total = sum(n.num_points for n in meta.octree.nodes)
        else:
            total = sum(c.num_points for c in meta.s2.cells)
        assert total == N


def test_s2_positions_are_exact(earth_data):
    batch, ecef, _, s2_dir = earth_data
    from point_cloud_viewer_tpu.s2_cells.container import S2Cells

    cloud = S2Cells.from_directory(s2_dir)
    got = 0
    for cell in cloud.nodes_in_location(
        __import__("point_cloud_viewer_tpu.query.location", fromlist=["AllPoints"]).AllPoints()
    ):
        nb = cloud.points_in_node(cell, attributes=["color"])
        c = nb.attributes["color"].astype(np.uint32)
        idx = (c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2]
        np.testing.assert_array_equal(nb.position, ecef[idx])  # Plain = exact
        got += len(nb)
    assert got == N


def _assert_equivalent(a: np.ndarray, b: np.ndarray):
    sym = np.setdiff1d(a, b).size + np.setdiff1d(b, a).size
    denom = max(len(a), len(b), 1)
    assert sym <= max(2, denom // 100), f"sym diff {sym} of {denom}"


def test_all_points_equivalence(earth_data):
    from point_cloud_viewer_tpu.query.location import AllPoints

    a, b = _query_both(earth_data, AllPoints())
    np.testing.assert_array_equal(a, b)
    assert len(a) == N


def test_aabb_equivalence(earth_data):
    _, ecef, _, _ = earth_data
    center = ecef.mean(axis=0)
    box = Aabb(center - 60.0, center + 60.0)
    a, b = _query_both(earth_data, box)
    _assert_equivalent(a, b)
    # And against brute force with a quantization shell.
    inner = Aabb(box.mins + 2 * RESOLUTION, box.maxs - 2 * RESOLUTION)
    outer = Aabb(box.mins - 2 * RESOLUTION, box.maxs + 2 * RESOLUTION)
    must = set(np.nonzero(inner.contains(ecef))[0].tolist())
    may = set(np.nonzero(outer.contains(ecef))[0].tolist())
    assert must <= set(a.tolist()) <= may
    assert set(b.tolist()) == set(np.nonzero(box.contains(ecef))[0].tolist())


def test_obb_equivalence(earth_data):
    _, ecef, _, _ = earth_data
    center = ecef.mean(axis=0)
    obb = Obb(
        Isometry.from_axis_angle([0.3, 0.8, 0.51], 0.9, translation=center),
        [80.0, 50.0, 20.0],
    )
    a, b = _query_both(earth_data, obb)
    _assert_equivalent(a, b)
    assert set(b.tolist()) == set(np.nonzero(obb.contains(ecef))[0].tolist())


def test_frustum_equivalence(earth_data):
    _, ecef, _, _ = earth_data
    center = ecef.mean(axis=0)
    up = center / np.linalg.norm(center)
    eye_pos = center + up * 200.0
    # Look straight down: rotate -z onto -up.
    z = up  # camera z points away from view direction (looking down)
    x = np.cross([0.0, 0.0, 1.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    rot = np.stack([x, y, z], axis=1)
    frustum = Frustum.new(
        Isometry(rot, eye_pos), Perspective.from_fov(1.0, 1.0, 10.0, 400.0)
    )
    a, b = _query_both(earth_data, frustum)
    assert len(a) > 0
    _assert_equivalent(a, b)
    assert set(b.tolist()) == set(np.nonzero(frustum.contains(ecef))[0].tolist())


def test_cell_union_equivalence(earth_data):
    _, ecef, _, _ = earth_data
    leaves = s2.leaf_cell_ids_from_points(ecef[:1000])
    union = CellUnion(np.unique(s2.parent(leaves, 18)))
    a, b = _query_both(earth_data, union)
    assert len(a) > 0
    _assert_equivalent(a, b)
    assert set(b.tolist()) == set(np.nonzero(union.contains(ecef))[0].tolist())


def test_web_mercator_rect_equivalence(earth_data):
    _, ecef, _, _ = earth_data
    lat, lng, _ = ecef_to_geodetic(ecef.mean(axis=0))
    z = 18
    zoomed = lat_lng_to_web_mercator(lat, lng) * (256 << z)
    rect = WebMercatorRect.from_zoomed_coordinates(
        zoomed - 2.0, zoomed + 2.0, z
    )
    assert rect is not None
    a, b = _query_both(earth_data, rect)
    assert len(a) > 0
    _assert_equivalent(a, b)
    assert set(b.tolist()) == set(np.nonzero(rect.contains(ecef))[0].tolist())


def test_device_filter_equivalence(earth_data):
    """Streaming with device_filter=True must return exactly the host
    client's result sets — across both containers, for a convex geometry
    (box) and the geodesic cell-union (the round-4 device S2 path)."""
    _, ecef, oct_dir, s2_dir = earth_data
    center = ecef.mean(axis=0)
    box = Aabb(center - 60.0, center + 60.0)
    leaves = s2.leaf_cell_ids_from_points(ecef[:1000])
    union = CellUnion(np.unique(s2.parent(leaves, 18)))
    for location in (box, union):
        for d in (oct_dir, s2_dir):
            results = []
            for dev in (False, True):
                client = PointCloudClient.from_locations(
                    [d], num_threads=2, device_filter=dev
                )
                batches = []
                client.for_each_point_data(
                    PointQuery(attributes=["color"], location=location),
                    batches.append,
                )
                results.append(_indices(batches))
            np.testing.assert_array_equal(results[0], results[1])
            assert len(results[0]) > 0


def test_intensity_filter_equivalence(earth_data):
    from point_cloud_viewer_tpu.math.intervals import ClosedInterval
    from point_cloud_viewer_tpu.query.location import AllPoints

    batch, _, oct_dir, s2_dir = earth_data
    interval = ClosedInterval(0.4, 0.7)
    results = []
    for d in (oct_dir, s2_dir):
        client = PointCloudClient.from_locations([d], num_threads=4)
        batches = []
        client.for_each_point_data(
            PointQuery(
                attributes=["color", "intensity"],
                location=AllPoints(),
                filter_intervals={"intensity": interval},
            ),
            batches.append,
        )
        results.append(_indices(batches))
    np.testing.assert_array_equal(results[0], results[1])
    expected = np.nonzero(interval.contains(batch.attributes["intensity"]))[0]
    np.testing.assert_array_equal(results[0], np.sort(expected))

"""Device per-point query filtering (query/device_filter.py): the jitted
f64 kernels must produce BIT-IDENTICAL keep masks to the host contains()
paths, and unsupported queries must fall back to host (SURVEY §7.5;
reference per-point loop src/iterator.rs:93-119)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import (
    Aabb, Frustum, Isometry, Obb, Perspective,
)
from point_cloud_viewer_tpu.math.intervals import ClosedInterval
from point_cloud_viewer_tpu.query.device_filter import point_filter_mask
from point_cloud_viewer_tpu.query.location import location_for
from point_cloud_viewer_tpu.query.point_query import PointQuery


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(31)
    return rng.random((50_000, 3)) * 40.0 - 20.0


def _geometries():
    eye = Isometry.from_axis_angle([0, 1, 0], 0.4, translation=[0.0, 0.0, 30.0])
    return {
        "box": Aabb(np.array([-5.0, -3.0, -8.0]), np.array([7.0, 9.0, 2.0])),
        "obb": Obb(
            Isometry.from_axis_angle([1, 1, 0], 0.7, translation=[1.0, -2.0, 3.0]),
            np.array([6.0, 4.0, 9.0]),
        ),
        "frustum": Frustum.new(eye, Perspective.from_fov(1.1, 0.9, 1.0, 60.0)),
    }


@pytest.mark.parametrize("kind", ["box", "obb", "frustum"])
def test_device_mask_bit_equal(points, kind):
    geometry = _geometries()[kind]
    loc = location_for(geometry)
    host = loc.contains(points)
    dev = point_filter_mask(loc, points)
    assert dev is not None
    np.testing.assert_array_equal(host, dev)
    assert 0 < host.sum() < len(points), "degenerate test geometry"


def test_device_interval_filter_bit_equal(points):
    rng = np.random.default_rng(5)
    intensity = (rng.random(len(points)) * 100.0).astype(np.float32)
    loc = location_for(_geometries()["box"])
    iv = {"intensity": ClosedInterval(20.0, 60.0)}
    host = loc.contains(points) & iv["intensity"].contains(intensity)
    dev = point_filter_mask(loc, points, intervals=iv,
                            attributes={"intensity": intensity})
    np.testing.assert_array_equal(host, dev)


def _earth_points(n, seed):
    """Points spread over all 6 S2 faces in the WGS84 radius band, plus
    exact face-boundary directions (|x| == |y| ties exercise the argmax
    tie-break) and axis poles."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = rng.uniform(6.35e6, 6.39e6, (n, 1))
    special = np.array([
        [1.0, 1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.0, 1.0],
        [1.0, 1.0, 1.0], [-1.0, -1.0, -1.0],
        [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
        [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0],
    ]) * 6.37e6
    return np.concatenate([d * r, special])


def test_device_s2_leaf_ids_bit_equal():
    """math/s2_device point->leaf-cell-id is bit-equal to the host
    pipeline (trig-free: argmax + IEEE div/sqrt + integer Hilbert)."""
    from jax._src.config import enable_x64

    from point_cloud_viewer_tpu.math import s2
    from point_cloud_viewer_tpu.math.s2_device import _leaf_ids

    pts = _earth_points(50_000, seed=3)
    host = s2.leaf_cell_ids_from_points(pts)
    with enable_x64(True):
        dev = np.asarray(_leaf_ids(jax.numpy.asarray(pts)))
    np.testing.assert_array_equal(host, dev)


@pytest.mark.parametrize("level", [4, 10, 20])
def test_device_cell_union_mask_bit_equal(level):
    from point_cloud_viewer_tpu.math import s2
    from point_cloud_viewer_tpu.s2_cells.cell_union import CellUnion

    pts = _earth_points(30_000, seed=7)
    # A union of parents of a few sample points (guarantees hits) at the
    # requested level, plus a disjoint far cell.
    sample = s2.leaf_cell_ids_from_points(pts[:5])
    union = CellUnion([int(c) for c in s2.parent(sample, level)])
    host = union.contains(pts)
    dev = point_filter_mask(union, pts)
    assert dev is not None
    np.testing.assert_array_equal(host, dev)
    assert 0 < host.sum() < len(pts), "degenerate union fixture"


def test_device_cell_union_with_intervals_bit_equal():
    from point_cloud_viewer_tpu.math import s2
    from point_cloud_viewer_tpu.math.intervals import ClosedInterval
    from point_cloud_viewer_tpu.s2_cells.cell_union import CellUnion

    pts = _earth_points(20_000, seed=9)
    rng = np.random.default_rng(1)
    intensity = (rng.random(len(pts)) * 50.0).astype(np.float32)
    sample = s2.leaf_cell_ids_from_points(pts[:3])
    union = CellUnion([int(c) for c in s2.parent(sample, 6)])
    iv = {"intensity": ClosedInterval(10.0, 30.0)}
    host = union.contains(pts) & iv["intensity"].contains(intensity)
    dev = point_filter_mask(union, pts, intervals=iv,
                            attributes={"intensity": intensity})
    np.testing.assert_array_equal(host, dev)


@pytest.mark.parametrize("n", [1, 3, 511, 512, 513, 700])
def test_padding_boundaries_bit_equal(points, n):
    """point_filter_mask pads batches to power-of-two shapes (one compile
    per bucket, not per node size); the sliced-back mask must stay
    bit-equal to the host at sizes straddling the pad boundaries."""
    pts = points[:n]
    geometry = _geometries()["box"]
    loc = location_for(geometry)
    rng = np.random.default_rng(11)
    intensity = (rng.random(n) * 100.0).astype(np.float32)
    iv = {"intensity": ClosedInterval(20.0, 60.0)}
    host = loc.contains(pts) & iv["intensity"].contains(intensity)
    dev = point_filter_mask(loc, pts, intervals=iv,
                            attributes={"intensity": intensity})
    assert dev is not None and dev.shape == (n,)
    np.testing.assert_array_equal(host, dev)


def test_unsupported_queries_fall_back(points):
    class CustomLocation:
        def contains(self, p):
            return np.ones(len(p), dtype=bool)

        def intersects_aabbs(self, corners):
            return np.ones(len(corners), dtype=bool)

    assert point_filter_mask(CustomLocation(), points) is None
    # Missing/non-scalar filter attributes -> host handles (and raises).
    loc = location_for(_geometries()["box"])
    iv = {"missing": ClosedInterval(0.0, 1.0)}
    assert point_filter_mask(loc, points, intervals=iv, attributes={}) is None


def _wm_rect():
    from point_cloud_viewer_tpu.math.web_mercator import (
        WebMercatorCoord, WebMercatorRect,
    )

    # A rect over real terrain latitudes (around 0.2-0.3 normalized is
    # mid-northern latitudes).
    return WebMercatorRect(
        WebMercatorCoord(np.array([0.52, 0.30])),
        WebMercatorCoord(np.array([0.55, 0.33])),
    )


def test_device_web_mercator_rect_bit_equal():
    """The hybrid exact scheme (device classify + host boundary refine,
    math/web_mercator_device.py) must be bit-equal to the host
    WebMercatorRect.contains across earth-surface points."""
    rect = _wm_rect()
    pts = _earth_points(30_000, seed=91)
    loc = location_for(rect)
    host = loc.contains(pts)
    dev = point_filter_mask(loc, pts)
    assert dev is not None
    np.testing.assert_array_equal(host, dev)
    # The rect is small; make sure the fixture actually hits it.
    inner = rect_interior_points(rect, 500)
    host_in = loc.contains(inner)
    dev_in = point_filter_mask(loc, inner)
    np.testing.assert_array_equal(host_in, dev_in)
    assert host_in.all(), "interior fixture must be inside"


def rect_interior_points(rect, n, pad=0.1):
    """ECEF points whose projection falls inside the rect."""
    from point_cloud_viewer_tpu.math import wgs84
    from point_cloud_viewer_tpu.math.web_mercator import web_mercator_to_lat_lng

    rng = np.random.default_rng(3)
    nw = rect.north_west.normalized
    se = rect.south_east.normalized
    uv = nw + (se - nw) * (pad + (1 - 2 * pad) * rng.random((n, 2)))
    lat, lon = web_mercator_to_lat_lng(uv)
    return wgs84.geodetic_to_ecef(lat, lon, rng.uniform(-100, 5000, n))


def test_device_web_mercator_boundary_band_bit_equal():
    """Adversarial: points landing (numerically) ON the rect edges — the
    uncertain band that routes through the host refinement — and points a
    hair either side of it."""
    from point_cloud_viewer_tpu.math import wgs84
    from point_cloud_viewer_tpu.math.web_mercator import web_mercator_to_lat_lng

    rect = _wm_rect()
    nw = rect.north_west.normalized
    se = rect.south_east.normalized
    edges_u = np.array([nw[0], se[0]])
    edges_v = np.array([nw[1], se[1]])
    rng = np.random.default_rng(17)
    # All 4 edges x interior spans, plus corners, plus +-1e-12 nudges.
    us = np.concatenate([
        np.repeat(edges_u, 40),
        rng.uniform(nw[0], se[0], 80),
    ])
    vs = np.concatenate([
        rng.uniform(nw[1], se[1], 80),
        np.repeat(edges_v, 40),
    ])
    for nudge in (0.0, 1e-12, -1e-12):
        lat, lon = web_mercator_to_lat_lng(np.stack([us + nudge, vs], axis=-1))
        pts = wgs84.geodetic_to_ecef(lat, lon, 0.0)
        loc = location_for(rect)
        host = loc.contains(pts)
        dev = point_filter_mask(loc, pts)
        np.testing.assert_array_equal(host, dev)


def test_device_web_mercator_with_intervals_bit_equal():
    rect = _wm_rect()
    pts = np.concatenate(
        [rect_interior_points(rect, 2_000), _earth_points(2_000, seed=5)]
    )
    rng = np.random.default_rng(9)
    intensity = (rng.random(len(pts)) * 10.0).astype(np.float32)
    loc = location_for(rect)
    iv = {"intensity": ClosedInterval(2.0, 8.0)}
    host = loc.contains(pts) & iv["intensity"].contains(intensity)
    dev = point_filter_mask(loc, pts, intervals=iv,
                            attributes={"intensity": intensity})
    assert dev is not None
    np.testing.assert_array_equal(host, dev)
    assert 0 < host.sum() < len(pts)


def test_web_mercator_calibrated_delta_sane():
    """On a true-f64 backend the probe error is ~ulp; the margin must stay
    tiny (a fat margin only costs host refinement work, but a blown-up one
    signals a broken device projection)."""
    from point_cloud_viewer_tpu.math.web_mercator_device import _calibrated_delta

    delta = _calibrated_delta()
    assert 1e-9 <= delta < 1e-6


def test_client_stream_with_device_filter(tmp_path):
    """End-to-end: a device-filtered stream returns exactly the host
    stream's points."""
    from point_cloud_viewer_tpu.octree.builder import build_octree
    from point_cloud_viewer_tpu.query.client import PointCloudClient

    rng = np.random.default_rng(77)
    n = 120_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 30.0,
        attributes={
            "color": rng.integers(0, 256, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    d = str(tmp_path / "oct")
    build_octree(d, 0.01, batch)
    query = PointQuery(
        attributes=["color", "intensity"],
        location=Aabb(np.array([5.0, 5.0, 5.0]), np.array([20.0, 25.0, 18.0])),
        filter_intervals={"intensity": ClosedInterval(0.25, 0.75)},
    )

    def collect(client):
        got = PointsBatch.concatenate(list(client.stream(query)))
        order = np.lexsort(got.position.T)
        return got.position[order]

    host_pts = collect(PointCloudClient.from_locations([d]))
    dev_pts = collect(
        PointCloudClient.from_locations([d], device_filter=True)
    )
    np.testing.assert_array_equal(host_pts, dev_pts)
    assert len(host_pts) > 100

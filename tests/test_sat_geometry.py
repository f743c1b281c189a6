"""SAT + geometry tests. Test vectors re-derived from the reference's unit
tests (src/math/sat.rs:207-268, src/geometry/obb.rs:92-141,
src/math/mod.rs:185-221, src/geometry/frustum.rs:171-206,
src/geometry/web_mercator_rect.rs:129-222)."""

import numpy as np
import pytest

from point_cloud_viewer_tpu.math.geometry import (
    Aabb,
    Frustum,
    Isometry,
    Obb,
    Perspective,
)
from point_cloud_viewer_tpu.math.sat import (
    REL_CROSS,
    REL_IN,
    REL_OUT,
    Intersector,
    UNIT_AXES,
)
from point_cloud_viewer_tpu.math.web_mercator import (
    WebMercatorCoord,
    WebMercatorRect,
    LAT_BOUND_RAD,
)


def _cube_intersector(mins, maxs):
    return Aabb(mins, maxs).intersector()


def test_cube_with_cube_relations():
    c1 = _cube_intersector([-1, -1, -1], [1, 1, 1])
    c2 = _cube_intersector([-0.5, -0.5, -0.5], [1.5, 1.5, 1.5])
    c3 = _cube_intersector([-0.9, -0.9, -0.9], [-0.7, -0.7, -0.7])
    assert c1.intersect(c2) == REL_CROSS
    assert c2.intersect(c3) == REL_OUT
    assert c1.intersect(c3) == REL_IN
    assert c3.intersect(c1) == REL_CROSS


def test_obb_axes_dedup_counts():
    half_extent = [1.0, 2.0, 3.0]
    # Axis-aligned OBB vs AABB: all axes coincide -> 3 deduped axes.
    obb = Obb(Isometry.identity(), half_extent)
    assert len(obb.intersector().cached_axes_for_aabb().axes) == 3
    # 45 deg around z: x/y normals distinct, z shared; crosses partially dupe.
    rot45 = Isometry.from_axis_angle([0, 0, 1], np.pi / 4)
    obb45 = Obb(rot45, half_extent)
    assert len(obb45.intersector().cached_axes_for_aabb().axes) == 5
    # Arbitrary rotation: 3 + 3 + 9 unique axes.
    rot = Isometry.from_axis_angle([0.2, 0.5, -0.7], 0.123)
    obb_arb = Obb(rot, half_extent)
    assert len(obb_arb.intersector().cached_axes_for_aabb().axes) == 15


def test_obb_intersects_aabb():
    bbox = Aabb([0.5, 1.0, -3.0], [1.5, 3.0, 3.0])
    half_extent = [1.0, 2.0, 3.0]
    obb = Obb(Isometry.identity(), half_extent)
    rel = obb.intersector().cached_axes_for_aabb().intersect(bbox.corners())
    assert rel == REL_CROSS
    obb45 = Obb(Isometry.from_axis_angle([0, 0, 1], np.pi / 4), half_extent)
    rel = obb45.intersector().cached_axes_for_aabb().intersect(bbox.corners())
    assert rel == REL_OUT


def test_obb_contains():
    obb = Obb(
        Isometry.from_axis_angle([0, 0, 1], np.pi / 2, translation=[10.0, 0.0, 0.0]),
        [1.0, 2.0, 3.0],
    )
    pts = np.array(
        [
            [10.0, 0.0, 0.0],  # center
            [12.0, 0.9, 0.0],  # inside (rotated: x extent is now 2)
            [13.1, 0.0, 0.0],  # outside
            [12.0, 1.1, 0.0],  # outside
        ]
    )
    np.testing.assert_array_equal(obb.contains(pts), [True, True, False, False])


def test_perspective_inverse():
    persp = Perspective(-0.123, 0.45, 0.04, 0.75, 1.0, 4.0)
    inv_ref = np.linalg.inv(persp.matrix)
    assert np.abs(inv_ref - persp.inverse()).max() < 1e-6


def test_frustum_intersects_and_contains():
    rot = Isometry.from_axis_angle([1, 0, 0], np.pi)
    persp = Perspective(-0.5, 0.0, -0.5, 0.0, 1.0, 4.0)
    frustum = Frustum.new(rot, persp)
    bbox = Aabb([-0.5, 0.25, 1.5], [-0.25, 0.5, 3.5])
    rel = frustum.intersector().intersect(bbox.intersector())
    assert rel == REL_IN
    assert frustum.contains(bbox.mins[None])[0]
    assert frustum.contains(bbox.maxs[None])[0]


def test_frustum_batch_culling():
    frustum = Frustum.new(
        Isometry.identity(), Perspective.from_fov(1.0, 1.0, 0.1, 100.0)
    )
    cached = frustum.intersector().cached_axes_for_aabb()
    boxes = np.stack(
        [
            Aabb([-0.1, -0.1, -5.0], [0.1, 0.1, -4.0]).corners(),  # in view
            Aabb([50.0, 50.0, -5.0], [51.0, 51.0, -4.0]).corners(),  # out
            Aabb([-100, -100, -50], [100, 100, 50]).corners(),  # crosses
        ]
    )
    rel = cached.intersect(boxes)
    np.testing.assert_array_equal(rel, [REL_IN, REL_OUT, REL_CROSS])


def test_aabb_contains_half_open():
    aabb = Aabb([0, 0, 0], [1, 1, 1])
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.5, 0.5]])
    np.testing.assert_array_equal(aabb.contains(pts), [True, False, True])


def test_web_mercator_projection_corners():
    lower = WebMercatorCoord.from_lat_lng(LAT_BOUND_RAD, -np.pi)
    upper = WebMercatorCoord.from_lat_lng(-LAT_BOUND_RAD, np.pi)
    np.testing.assert_allclose(lower.to_zoomed_coordinate(0), [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(upper.to_zoomed_coordinate(0), [256.0, 256.0], atol=1e-9)


def test_web_mercator_lat_lng_roundtrip():
    coord = WebMercatorCoord.from_lat_lng(0.7, -1.3)
    lat, lon = coord.to_lat_lng()
    assert abs(lat - 0.7) < 1e-12
    assert abs(lon + 1.3) < 1e-12


def test_web_mercator_rect_relations():
    r1 = WebMercatorRect.from_zoomed_coordinates([0.1, 0.1], [0.3, 0.3], 1)
    r2 = WebMercatorRect.from_zoomed_coordinates([0.4, 0.4], [0.5, 0.5], 1)
    r3 = WebMercatorRect.from_zoomed_coordinates([0.2, 0.2], [0.6, 0.6], 1)
    assert r1.intersector().intersect(r2.intersector()) == REL_OUT
    assert r1.intersector().intersect(r3.intersector()) == REL_CROSS
    assert r3.intersector().intersect(r2.intersector()) == REL_CROSS


def test_web_mercator_rect_wraparound_validation():
    assert WebMercatorRect.from_zoomed_coordinates([255.5, 128.0], [0.5, 128.8], 0) is not None
    assert WebMercatorRect.from_zoomed_coordinates([255.5, 128.0], [1.5, 128.8], 0) is None
    assert WebMercatorRect.from_zoomed_coordinates([128.8, 255.5], [128.8, 0.5], 0) is None


def test_intersect_bounds_matches_corner_path():
    """The AABB lo/hi fast path must agree with the corner-based SAT for
    every geometry variant."""
    import numpy as np

    from point_cloud_viewer_tpu.math.geometry import (
        Aabb, Frustum, Isometry, Obb, Perspective,
    )
    from point_cloud_viewer_tpu.query.location import location_for

    rng = np.random.default_rng(31)
    k = 5000
    lo = rng.random((k, 3)) * 100.0
    hi = lo + rng.random((k, 3)) * 8.0
    unit = np.array(
        [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)],
        dtype=np.float64,
    )
    corners = lo[:, None, :] + unit[None] * (hi - lo)[:, None, :]

    geoms = [
        Aabb(np.array([30.0, 30.0, 30.0]), np.array([70.0, 60.0, 50.0])),
        Obb(Isometry.from_axis_angle([0.3, 0.5, 0.8], 0.7,
                                     translation=[50.0, 50.0, 50.0]),
            [20.0, 15.0, 10.0]),
        Frustum.new(
            Isometry.from_axis_angle([0, 1, 0], 0.4,
                                     translation=[50.0, 50.0, 150.0]),
            Perspective.from_fov(1.2, 1.0, 1.0, 200.0),
        ),
    ]
    for geom in geoms:
        loc = location_for(geom)
        np.testing.assert_array_equal(
            loc.intersects_bounds(lo, hi), loc.intersects_aabbs(corners),
            err_msg=str(type(geom)),
        )

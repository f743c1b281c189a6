"""Golden-file regression: the on-disk formats are contracts — rebuilding
the committed fixture from the same seed must be byte-identical, and the
committed bytes must parse and stream correctly."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SEED = 20260816
N = 3000


def _golden_batch():
    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.math.wgs84 import local_frame_from_lat_lng

    rng = np.random.default_rng(SEED)
    local = (rng.random((N, 3)) - 0.5) * np.array([50.0, 50.0, 10.0])
    frame = local_frame_from_lat_lng(48.1374, 11.5755)
    ecef = frame.inverse().transform_points(local)
    return PointsBatch(
        position=ecef,
        attributes={
            "color": rng.integers(0, 255, (N, 3), dtype=np.uint8),
            "intensity": rng.random(N).astype(np.float32),
        },
    )


def _assert_dirs_byte_equal(a: str, b: str):
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(a, b, context="golden drift")


def test_octree_format_is_stable(tmp_path):
    from point_cloud_viewer_tpu.octree.builder import build_octree

    out = str(tmp_path / "octree")
    build_octree(out, 0.01, _golden_batch())
    _assert_dirs_byte_equal(os.path.join(GOLDEN, "octree"), out)


def test_s2_format_is_stable(tmp_path):
    from point_cloud_viewer_tpu.s2_cells.splitter import build_s2_cloud

    out = str(tmp_path / "s2")
    build_s2_cloud(out, _golden_batch())
    _assert_dirs_byte_equal(os.path.join(GOLDEN, "s2"), out)


def test_golden_streams_completely():
    from point_cloud_viewer_tpu.query.client import PointCloudClient
    from point_cloud_viewer_tpu.query.point_query import PointQuery

    client = PointCloudClient.from_locations(
        [os.path.join(GOLDEN, "octree"), os.path.join(GOLDEN, "s2")],
        num_threads=2,
    )
    total = [0]
    client.for_each_point_data(
        PointQuery(attributes=["color", "intensity"]),
        lambda b: total.__setitem__(0, total[0] + len(b)),
    )
    assert total[0] == 2 * N

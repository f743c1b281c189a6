"""Multi-chip sharded build: the mesh path must produce BIT-IDENTICAL
on-disk output to the single-chip host path."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.ops import morton
from point_cloud_viewer_tpu.parallel.mesh import make_mesh
from point_cloud_viewer_tpu.parallel.sharded_build import sharded_morton_sort


def _cpu_mesh(n):
    devices = jax.devices("cpu")
    assert len(devices) >= n
    return make_mesh(n, devices=devices)


def test_sharded_sort_bit_identical():
    rng = np.random.default_rng(0)
    for n in [64, 1000, 8 * 1024 + 3]:
        cells = rng.integers(0, 2**21, (n, 3)).astype(np.uint32)
        # Duplicates to exercise stability.
        cells[::7] = cells[0]
        host_codes = morton.morton_encode(cells)
        host_order = np.argsort(host_codes, kind="stable")
        mesh = _cpu_mesh(8)
        codes, order = sharded_morton_sort(cells, mesh, morton.MAX_DEPTH)
        np.testing.assert_array_equal(codes, host_codes[host_order])
        np.testing.assert_array_equal(order, host_order)


def test_sharded_build_matches_host(tmp_path):
    rng = np.random.default_rng(1)
    n = 120_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 15.0,
        attributes={
            "color": rng.integers(0, 255, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    host_dir = str(tmp_path / "host")
    mesh_dir = str(tmp_path / "mesh")
    build_octree(host_dir, 0.001, batch)
    build_octree(mesh_dir, 0.001, batch, mesh=_cpu_mesh(8))

    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(host_dir, mesh_dir, context="mesh vs host")


def test_use_device_build_matches_host(tmp_path):
    """The full-device derivation (sort + leaf + promotion on device) must
    produce bit-identical on-disk output to the host path."""
    rng = np.random.default_rng(7)
    n = 150_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 12.0,
        attributes={
            "color": rng.integers(0, 255, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    host_dir = str(tmp_path / "host")
    dev_dir = str(tmp_path / "dev")
    build_octree(host_dir, 0.001, batch)
    build_octree(dev_dir, 0.001, batch, use_device=True)
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(host_dir, dev_dir, context="device vs host")


def test_use_device_build_single_point(tmp_path):
    batch = PointsBatch(
        position=np.array([[1.0, 2.0, 3.0]]),
        attributes={"color": np.array([[9, 8, 7]], dtype=np.uint8)},
    )
    host_dir = str(tmp_path / "h")
    dev_dir = str(tmp_path / "d")
    build_octree(host_dir, 0.01, batch)
    build_octree(dev_dir, 0.01, batch, use_device=True)
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(host_dir, dev_dir, context="device single point")


@pytest.mark.parametrize("n_devices", [2, 3, 5])
def test_sharded_build_nonpow2_meshes(tmp_path, n_devices):
    """The all-to-all Morton exchange must work over ANY mesh size, not
    just powers of two; output stays byte-identical to single-chip."""
    import os

    rng = np.random.default_rng(500 + n_devices)
    n = 60_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 30.0,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    host_dir = str(tmp_path / "host")
    mesh_dir = str(tmp_path / "mesh")
    build_octree(host_dir, 0.01, batch)
    build_octree(mesh_dir, 0.01, batch, mesh=_cpu_mesh(n_devices))
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(host_dir, mesh_dir, context=f"mesh({n_devices})")


def test_exact_build_never_touches_f32_stats_path(tmp_path, monkeypatch):
    """_local_step (the f32 stats/dryrun profile) must be unreachable from
    build_octree(mesh=...): the exact builder quantizes f64 on host and
    exchanges integer codes only.  Guarding against accidental reuse of the
    f32 position path in the exact pipeline (ADVICE r2 / VERDICT weak #7)."""
    from point_cloud_viewer_tpu.parallel import sharded_build

    def _boom(*a, **k):
        raise AssertionError("f32 stats path reached from the exact build")

    monkeypatch.setattr(sharded_build, "_local_step", _boom)
    rng = np.random.default_rng(123)
    n = 30_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 20.0,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    result = build_octree(str(tmp_path / "o"), 0.01, batch, mesh=_cpu_mesh(4))
    assert result.num_points == n


def test_mesh_built_cloud_geodesic_queries(tmp_path):
    """BASELINE config 5's query clause (pytest twin of the dryrun tail):
    s2 cell-union and web-mercator-rect queries over a MESH-BUILT octree of
    an Earth-surface cloud return exactly the brute-force membership sets
    (index-in-color re-identification)."""
    import __graft_entry__ as ge
    from point_cloud_viewer_tpu.math.wgs84 import local_frame_from_lat_lng

    rng = np.random.default_rng(8)
    n = 120_000
    local = (rng.random((n, 3)) - 0.5) * np.array([200.0, 200.0, 20.0])
    frame = local_frame_from_lat_lng(37.4, -122.1)
    ecef = frame.inverse().transform_points(local)
    idx = np.arange(n, dtype=np.uint32)
    color = np.stack(
        [(idx >> 16) & 0xFF, (idx >> 8) & 0xFF, idx & 0xFF], axis=1
    ).astype(np.uint8)
    batch = PointsBatch(position=ecef, attributes={"color": color})
    mesh_dir = str(tmp_path / "mesh_built")
    host_dir = str(tmp_path / "host_built")
    build_octree(mesh_dir, 0.01, batch, mesh=_cpu_mesh(8))
    build_octree(host_dir, 0.01, batch)
    union_n, rect_n = ge._geodesic_query_check(mesh_dir, host_dir, ecef)
    assert union_n > 0 and rect_n > 0


def test_sharded_entrypoints_accept_empty_input():
    """Zero points (e.g. a fully filtered stream) must return empty results
    like the host paths — regression: padded=0 made the shard-stride
    arange step zero and raised."""
    from point_cloud_viewer_tpu.parallel.sharded_build import sharded_tree_levels

    mesh = _cpu_mesh(8)
    codes, order = sharded_morton_sort(
        np.empty((0, 3), dtype=np.uint32), mesh, morton.MAX_DEPTH
    )
    assert len(codes) == 0 and len(order) == 0
    shards = sharded_tree_levels(
        np.empty(0, dtype=np.uint64), mesh, depth=morton.MAX_DEPTH,
        b_levels=1, max_split_level=morton.MAX_DEPTH, max_points_per_node=100_000,
    )
    assert len(shards) == 8
    assert all(len(i) == 0 and len(f) == 0 and len(l) == 0 for i, f, l in shards)

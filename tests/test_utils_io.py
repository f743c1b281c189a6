"""Tests for data-provider factory (incl. HTTP provider against a live
server), progress utils, color helpers, BFS traversal, view CLI."""

import io
import threading

import numpy as np
import pytest

from point_cloud_viewer_tpu.core import color
from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.io.factory import (
    DataProviderFactory,
    HttpDataProvider,
    default_factory,
)
from point_cloud_viewer_tpu.io.node_io import OnDiskDataProvider
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.octree.node_id import NodeId
from point_cloud_viewer_tpu.octree.octree import Octree
from point_cloud_viewer_tpu.octree.traversal import node_ids_bfs
from point_cloud_viewer_tpu.utils.progress import ProgressBar, parse_key_val, timed


@pytest.fixture(scope="module")
def octree_dir(tmp_path_factory):
    rng = np.random.default_rng(3)
    batch = PointsBatch(
        position=rng.random((150_000, 3)) * 10.0,
        attributes={"color": rng.integers(0, 255, (150_000, 3), dtype=np.uint8)},
    )
    out = str(tmp_path_factory.mktemp("oct"))
    build_octree(out, 0.001, batch)
    return out


def test_factory_prefix_dispatch(octree_dir):
    f = default_factory()
    p = f.generate_data_provider(octree_dir)
    assert isinstance(p, OnDiskDataProvider)
    p2 = f.generate_data_provider("http://example.com/tree")
    assert isinstance(p2, HttpDataProvider)


def test_http_data_provider_live(octree_dir):
    """Serve the octree directory over HTTP; open it via HttpDataProvider."""
    import functools
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    handler = functools.partial(SimpleHTTPRequestHandler, directory=octree_dir)
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        provider = default_factory().generate_data_provider(
            f"http://127.0.0.1:{port}"
        )
        octree = Octree(provider)
        assert len(octree) > 0
        batch = octree.points_in_node(NodeId.root(), attributes=["color"])
        assert len(batch) > 0
    finally:
        server.shutdown()
        server.server_close()


def test_bfs_traversal(octree_dir):
    octree = Octree.from_directory(octree_dir)
    all_nodes = list(node_ids_bfs(octree))
    assert len(all_nodes) == len(octree.node_ids)
    assert all_nodes[0] == NodeId.root()
    # BFS order: levels are non-decreasing.
    levels = [n.level for n in all_nodes]
    assert levels == sorted(levels)
    # Predicate prunes subtrees.
    only_root = list(node_ids_bfs(octree, lambda n: n.level == 0))
    assert only_root == [NodeId.root()]


def test_progress_bar_and_timed():
    stream = io.StringIO()
    bar = ProgressBar(10, "work", refresh_s=0.0, stream=stream)
    for _ in range(10):
        bar.inc()
    bar.finish()
    out = stream.getvalue()
    assert "10/10" in out and "100%" in out
    stream2 = io.StringIO()
    with timed("step", stream=stream2):
        pass
    assert "step:" in stream2.getvalue()


def test_parse_key_val():
    assert parse_key_val("a=1,2") == ("a", "1,2")
    with pytest.raises(ValueError):
        parse_key_val("no-equals")


def test_color_helpers():
    u8 = color.to_u8(np.array([0.5, 1.0, 0.0, 1.0]))
    np.testing.assert_array_equal(u8, [127, 255, 0, 255])
    f32 = color.to_f32(np.array([255, 0, 127], dtype=np.uint8))
    assert f32[0] == 1.0 and f32[1] == 0.0


def test_view_cli(octree_dir, tmp_path, capsys):
    from point_cloud_viewer_tpu.cli import view

    shot = str(tmp_path / "shot.png")
    assert view.main([octree_dir, "--frames", "10", "--width", "160",
                      "--height", "120", "--screenshot", shot]) == 0
    import os

    assert os.path.exists(shot)


def test_every_cli_parses_help():
    """All 12 CLI modules import and answer --help (an import-time or
    argparse regression in any tool fails here, without running builds)."""
    import importlib

    import pytest as _pytest

    names = [
        "build_octree", "build_s2", "build_xray_quadtree", "export_ply",
        "inpaint_xray_quadtree", "merge_xray_quadtrees", "points_web_viewer",
        "query_points", "upgrade_octree", "upgrade_xray_quadtree", "view",
        "xray_web_viewer",
    ]
    for name in names:
        mod = importlib.import_module(f"point_cloud_viewer_tpu.cli.{name}")
        with _pytest.raises(SystemExit) as e:
            mod.main(["--help"])
        assert e.value.code == 0, name


def test_attempt_increasing_rlimit_to_max(tmp_path):
    """The open-file soft limit equals the hard limit after the helper runs
    (reference: src/read_write/mod.rs:43-56) — and build_octree invokes it
    (soft stays raised after a build even if this test lowered it first)."""
    import resource

    import numpy as np

    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.io.node_io import attempt_increasing_rlimit_to_max
    from point_cloud_viewer_tpu.octree.builder import build_octree

    soft0, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    try:
        if hard == resource.RLIM_INFINITY:
            lowered = 1024
        else:
            # Clamp to the hard limit: on tightly-limited systems hard//2
            # may undershoot and max(..., 256) may overshoot the hard cap.
            lowered = min(max(hard // 2, 1), hard)
        resource.setrlimit(resource.RLIMIT_NOFILE, (lowered, hard))
        attempt_increasing_rlimit_to_max()
        assert resource.getrlimit(resource.RLIMIT_NOFILE)[0] == hard

        # build_octree calls the helper itself: lower again, run a tiny
        # build, and check the soft limit ends up raised.
        resource.setrlimit(resource.RLIMIT_NOFILE, (lowered, hard))
        rng = np.random.default_rng(7)
        batch = PointsBatch(position=rng.random((64, 3)))
        build_octree(str(tmp_path / "rlimit_build"), 0.01, batch)
        assert resource.getrlimit(resource.RLIMIT_NOFILE)[0] == hard
    finally:
        resource.setrlimit(resource.RLIMIT_NOFILE, (soft0, hard))

"""Web backend tests: real HTTP round trips against both servers, binary
blob layout validation, and CLI smoke tests."""

import json
import os
import struct
import threading
import time
import urllib.request

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import Frustum, Isometry, Perspective
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.octree.node_id import NodeId
from point_cloud_viewer_tpu.octree.octree import Octree


@pytest.fixture(scope="module")
def served_octree(tmp_path_factory):
    rng = np.random.default_rng(5)
    n = 50_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 20.0,
        attributes={
            "color": rng.integers(0, 256, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    root = tmp_path_factory.mktemp("trees")
    out = str(root / "mycloud")
    build_octree(out, 0.001, batch)

    from point_cloud_viewer_tpu.viewer.web_backend import AppState, make_server

    state = AppState(prefix=str(root), init_octree_id="mycloud")
    server = make_server(state, ip="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", out
    server.shutdown()
    server.server_close()


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def _post(url: str, body: bytes) -> bytes:
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def test_init_tree(served_octree):
    base, _ = served_octree
    assert _get(base + "/init_tree").decode() == "mycloud"


def test_index_serves_client(served_octree):
    base, _ = served_octree
    html = _get(base + "/").decode()
    assert "<canvas" in html and "visible_nodes" in html


def test_visible_nodes_roundtrip(served_octree):
    base, out = served_octree
    octree = Octree.from_directory(out)
    eye = Isometry.from_axis_angle([1, 0, 0], 0.0, translation=[10.0, 10.0, 90.0])
    frustum = Frustum.new(eye, Perspective.from_fov(1.0, 1.2, 0.5, 300.0))
    # Column-major entries like the TS client sends.
    entries = frustum.clip_from_query.T.reshape(-1)
    matrix_param = ",".join(repr(float(v)) for v in entries)
    names = json.loads(_get(f"{base}/visible_nodes/mycloud/?matrix={matrix_param}"))
    expected = [str(n) for n in octree.get_visible_nodes(frustum.clip_from_query)]
    assert names == expected
    assert names[0] == "r"


def test_visible_nodes_bad_matrix(served_octree):
    base, _ = served_octree
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/visible_nodes/mycloud/?matrix=1,2,3")
    assert e.value.code == 400


def test_nodes_data_blob_layout(served_octree):
    base, out = served_octree
    octree = Octree.from_directory(out)
    names = ["r"] + [str(n) for n in octree.node_ids if n.level == 1][:2]
    blob = _post(f"{base}/nodes_data/mycloud/", json.dumps(names).encode())

    off = 0
    for name in names:
        meta = octree.node_meta(NodeId.from_str(name))
        minx, miny, minz, edge = struct.unpack_from("<dddd", blob, off)
        np.testing.assert_allclose([minx, miny, minz], meta.cube_min)
        assert edge == meta.edge_length
        num_points, bpc = struct.unpack_from("<IB", blob, off + 32)
        assert num_points == meta.num_points
        assert bpc == meta.position_encoding.bytes_per_coordinate
        off += 37
        off = (off + 7) & ~7
        pos_bytes = blob[off : off + num_points * 3 * bpc]
        # Decode and verify positions are inside the node cube.
        if bpc == 2:
            t = np.frombuffer(pos_bytes, "<u2").astype(np.float64) / 65535.0
        elif bpc == 1:
            t = np.frombuffer(pos_bytes, "<u1").astype(np.float64) / 255.0
        elif bpc == 4:
            t = np.frombuffer(pos_bytes, "<f4").astype(np.float64)
        else:
            t = np.frombuffer(pos_bytes, "<f8")
        pos = t.reshape(-1, 3) * edge + [minx, miny, minz]
        assert (pos >= meta.cube_min - 1e-9).all()
        assert (pos <= meta.cube_min + edge + 1e-9).all()
        off += len(pos_bytes)
        off = (off + 7) & ~7
        off += num_points * 3  # rgb
        off = (off + 7) & ~7
    assert off == len(blob)


def test_unknown_tree_404(served_octree):
    base, _ = served_octree
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/visible_nodes/nosuch/?matrix={','.join(['1.0'] * 16)}")
    # Strictly 404: a 500 would mean an unhandled server exception, not
    # the graceful unknown-tree rejection this contract tests.
    assert e.value.code == 404


def test_xray_server(tmp_path):
    from point_cloud_viewer_tpu.query.client import PointCloudClient
    from point_cloud_viewer_tpu.xray.backend import make_server
    from point_cloud_viewer_tpu.xray.build import XrayParameters, build_xray_quadtree

    rng = np.random.default_rng(6)
    batch = PointsBatch(
        position=rng.random((20_000, 3)) * 3.0,
        attributes={"color": rng.integers(0, 256, (20_000, 3), dtype=np.uint8)},
    )
    cloud = str(tmp_path / "cloud")
    build_octree(cloud, 0.001, batch)
    xdir = str(tmp_path / "xray")
    client = PointCloudClient.from_locations([cloud], num_threads=2)
    build_xray_quadtree(
        "xray",
        XrayParameters(
            output_directory=xdir, point_cloud_client=client,
            tile_size_px=64, pixel_size_m=0.05,
        ),
        num_threads=2,
    )
    server = make_server(xdir, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        meta = json.loads(_get(base + "/meta"))
        assert meta["tile_size"] == 64
        assert "bounding_rect" in meta
        identity = [1e-2, 0, 0, 0, 0, 1e-2, 0, 0, 0, 0, 1e-2, 0, 0, 0, 0, 1]
        tiles = json.loads(
            _get(f"{base}/nodes_for_level?level=0&matrix={','.join(map(str, identity))}")
        )
        assert tiles and tiles[0]["id"] == "r"
        png = _get(f"{base}/node_image/r")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        with pytest.raises(urllib.error.HTTPError):
            _get(f"{base}/node_image/r9")
    finally:
        server.shutdown()
        server.server_close()


def test_cli_build_and_query(tmp_path, capsys):
    from point_cloud_viewer_tpu.cli import build_octree as cli_build
    from point_cloud_viewer_tpu.cli import query_points as cli_query
    from point_cloud_viewer_tpu.cli import upgrade_octree as cli_upgrade

    out = str(tmp_path / "oct")
    rc = cli_build.main(
        [
            "/root/reference/src/test_data/xyz_f32_rgb_u8_intensity_f32.ply",
            "--output_directory", out,
        ]
    )
    assert rc == 0
    rc = cli_query.main([out, "--attributes", "color"])
    assert rc == 0
    assert "Streamed 8 points" in capsys.readouterr().out
    rc = cli_upgrade.main([out])
    assert rc == 0


def test_client_has_reference_render_controls(served_octree):
    """The served client carries the reference's render controls and loader
    discipline (octree_web_viewer/client/main.ts:59-87,
    octree_viewer.ts:299-368): point size / transparency / gamma /
    max-level controls, <=50-node batches, <=3 concurrent fetches, 250 ms
    settle, and the level cap while moving."""
    import urllib.request

    base, _out = served_octree
    html = urllib.request.urlopen(f"{base}/").read().decode()
    for control in ("ctl-size", "ctl-alpha", "ctl-gamma", "ctl-maxlevel",
                    "ctl-treeid"):
        assert control in html
    assert "BATCH_SIZE = 50" in html
    assert "MAX_IN_FLIGHT = 3" in html
    assert "250" in html  # settle interval
    assert "maxLevelToDisplay" in html
    assert "gamma" in html and "alpha" in html
    # First-person controller (reference control.ts:25-194): WASD/arrows +
    # Q/Z movement, wheel speed scaling with the 0.1 floor, tree switching.
    for marker in ("KeyW", "KeyQ", "KeyZ", "ArrowUp", "moveSpeed",
                   "Math.max(0.1", "switchTree"):
        assert marker in html, marker


def test_nodes_data_batched_posts(served_octree):
    """Several concurrent <=50-node POSTs (the client's fetch discipline)
    all round-trip."""
    import json
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from point_cloud_viewer_tpu.octree.octree import Octree

    base, out = served_octree
    tree_id = "mycloud"
    octree = Octree.from_directory(out)
    names = [str(n) for n in octree.node_ids]
    batches = [names[i : i + 50] for i in range(0, len(names), 50)] or [[]]

    def post(batch):
        req = urllib.request.Request(
            f"{base}/nodes_data/{tree_id}/",
            data=json.dumps(batch).encode(),
            headers={"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(req).read()

    with ThreadPoolExecutor(max_workers=3) as pool:
        blobs = list(pool.map(post, batches))
    assert all(len(b) > 0 for b in blobs if b is not None)


def test_xray_client_has_pan_zoom_keyboard():
    """The served xray client carries the reference controller behaviors
    (xray/client/control.ts): zoom-around-cursor, zoom->level selection,
    and WASD/arrow continuous panning."""
    import os

    client = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "point_cloud_viewer_tpu", "xray", "client.html",
    )
    with open(client) as f:
        html = f.read()
    assert "Zoom around the cursor" in html
    assert "pickLevel" in html
    for code in ("KeyW", "KeyA", "KeyS", "KeyD", "ArrowUp", "ArrowDown"):
        assert code in html


def test_float64_wire_decode_preserves_resolution(tmp_path):
    """A FLOAT64-encoded node (edge/resolution needing > 24 bits) must
    decode to the advertised resolution via the CLIENT's documented recipe
    (client.html parseBlob): t stays f64 through (t*edge + min - offset);
    truncating t to f32 FIRST provably breaks the guarantee (regression:
    the old client did exactly that)."""
    from point_cloud_viewer_tpu.viewer.web_backend import AppState, make_server

    rng = np.random.default_rng(8)
    n = 4000
    res = 1e-7
    base_pos = np.array([1e7, 2e7, 3e7])
    batch = PointsBatch(
        position=base_pos + rng.random((n, 3)) * 20.0,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    root = tmp_path / "trees"
    root.mkdir()
    out = str(root / "f64cloud")
    build_octree(out, res, batch)
    octree = Octree.from_directory(out)
    meta = octree.node_meta(NodeId.from_str("r"))
    assert meta.position_encoding.bytes_per_coordinate == 8, (
        "fixture must force FLOAT64")

    state = AppState(prefix=str(root), init_octree_id="f64cloud")
    server = make_server(state, ip="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        blob = _post(f"http://127.0.0.1:{port}/nodes_data/f64cloud/",
                     json.dumps(["r"]).encode())
    finally:
        server.shutdown()
        server.server_close()

    minx, miny, minz, edge = struct.unpack_from("<dddd", blob, 0)
    num_points, bpc = struct.unpack_from("<IB", blob, 32)
    off = (37 + 7) & ~7
    t = np.frombuffer(blob, "<f8", count=num_points * 3, offset=off).reshape(-1, 3)
    offset = np.array([minx + edge / 2, miny + edge / 2, minz + edge / 2])

    truth = octree.points_in_node(NodeId.from_str("r"), attributes=["color"])
    rel = truth.position - offset
    # New client recipe: decode in f64 first.
    dec = t * edge + [minx, miny, minz] - offset
    assert np.abs(dec - rel).max() <= res
    # Old recipe (f32-truncate t first) violates the resolution promise —
    # keeps this fixture honest about what the recipe change buys.
    old = t.astype(np.float32).astype(np.float64) * edge + [minx, miny, minz] - offset
    assert np.abs(old - rel).max() > res


def test_load_octree_single_flight(served_octree, monkeypatch):
    """Concurrent first requests for one uncached id run the multi-second
    Octree load exactly ONCE (the client fires /visible_nodes and
    /nodes_data together on startup)."""
    _, out = served_octree
    from point_cloud_viewer_tpu.viewer.web_backend import AppState

    state = AppState(prefix=os.path.dirname(out))
    loads = []
    real = Octree.from_directory.__func__

    def slow(cls, d):
        loads.append(d)
        time.sleep(0.2)  # widen the race window past thread startup skew
        return real(cls, d)

    monkeypatch.setattr(Octree, "from_directory", classmethod(slow))
    got = []
    threads = [
        threading.Thread(target=lambda: got.append(state.load_octree("mycloud")))
        for _ in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(loads) == 1
    assert len(got) == 6 and all(o is got[0] for o in got)
    # A failing load must not wedge later callers (the event is always set,
    # the loading slot always cleared): both attempts raise, neither hangs.
    for _ in range(2):
        with pytest.raises(FileNotFoundError):
            state.load_octree("nosuch")
    assert not state._loading


def test_node_names_json_vectorized_full_level_range():
    """_node_names_json (the /visible_nodes serializer) matches
    "r" + octal-path NodeId strings over the format's FULL level range
    (levels 0..40 — paths straddle the lo/hi u64 boundary from level 22),
    including empty input and order permutation."""
    from point_cloud_viewer_tpu.octree.octree import _node_names_json

    rng = np.random.default_rng(11)
    levels, his, los, expected = [], [], [], []
    for level in list(range(0, 41)) + [21, 22, 40]:
        path = int(rng.integers(0, 8)) if level == 0 else 0
        # Random path < 8^level via python bigints (numpy can't do 120-bit).
        path = 0
        for _ in range(level):
            path = (path << 3) | int(rng.integers(0, 8))
        levels.append(level)
        his.append(path >> 64)
        los.append(path & ((1 << 64) - 1))
        expected.append("r" if level == 0 else "r" + format(path, "o").zfill(level))
    levels = np.array(levels, dtype=np.uint8)
    his = np.array(his, dtype=np.uint64)
    los = np.array(los, dtype=np.uint64)

    order = rng.permutation(len(levels))
    got = json.loads(_node_names_json(levels, his, los, order))
    assert got == [expected[i] for i in order]
    assert _node_names_json(levels, his, los, np.array([], dtype=np.int64)) == b"[]"

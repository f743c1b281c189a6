"""Viewer runtime tests: camera semantics, pose store, LRU node cache,
adaptive budget, headless render loop + software rasterizer."""

import os
import time

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.octree.octree import Octree
from point_cloud_viewer_tpu.viewer.camera import Camera, CameraState, PoseStore
from point_cloud_viewer_tpu.viewer.render_loop import (
    NodeViewContainer,
    PointCloudRenderer,
    run_headless,
)
from point_cloud_viewer_tpu.viewer.software_raster import rasterize_points


def test_camera_pan_is_in_camera_frame():
    cam = Camera()
    cam.theta = np.pi / 2  # yaw 90deg: camera x now points along world y
    cam.moving["right"] = True
    assert cam.update(1.0)
    # Moved along world y by movement_speed.
    np.testing.assert_allclose(cam.position, [0.0, 10.0, 0.0], atol=1e-12)


def test_camera_forward_with_pitch():
    cam = Camera()
    cam.phi = np.pi / 2  # pitch up: camera -z now points along world...
    cam.moving["forward"] = True
    assert cam.update(1.0)
    # Rz(0)*Rx(pi/2) maps (0,0,-1) -> (0, 1, 0) approximately? Verify length.
    assert np.linalg.norm(cam.position) == pytest.approx(10.0)


def test_camera_wheel_and_turning():
    cam = Camera()
    speed = cam.movement_speed
    cam.mouse_wheel(2)
    # Sign-only step: one event is one 10% step regardless of magnitude,
    # with a 0.01 floor (reference camera.rs:296-301).
    assert cam.movement_speed == pytest.approx(speed * 1.1)
    cam.mouse_wheel(-7)
    assert cam.movement_speed == pytest.approx(speed * 1.1 * 0.9)
    cam.movement_speed = 0.0101
    for _ in range(50):
        cam.mouse_wheel(-1)
    assert cam.movement_speed == pytest.approx(0.01)
    cam.turning["left"] = True
    cam.update(0.5)
    assert cam.theta == pytest.approx(0.25)


def test_pose_store_roundtrip(tmp_path):
    store = PoseStore(str(tmp_path / "poses.json"))
    cam = Camera()
    cam.position = np.array([1.0, 2.0, 3.0])
    cam.theta, cam.phi = 0.4, -0.2
    store.save(3, cam.state())
    loaded = store.load(3)
    assert loaded is not None
    cam2 = Camera()
    cam2.set_state(loaded)
    np.testing.assert_array_equal(cam2.position, [1.0, 2.0, 3.0])
    assert cam2.theta == 0.4 and cam2.phi == -0.2
    assert store.load(7) is None


def test_rasterizer_paints_nearest():
    # Two points on the same pixel; nearer one must win.
    positions = np.array([[0.0, 0.0, -5.0], [0.0, 0.0, -2.0]])
    colors = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    from point_cloud_viewer_tpu.math.geometry import Frustum, Isometry, Perspective

    f = Frustum.new(Isometry.identity(), Perspective.from_fov(1.0, 1.0, 0.1, 100.0))
    img = rasterize_points(positions, colors, f.clip_from_query, 64, 64)
    center = img[31:33, 31:33].reshape(-1, 4)
    assert any((px[:3] == [0, 255, 0]).all() for px in center)


@pytest.fixture(scope="module")
def octree_dir(tmp_path_factory):
    rng = np.random.default_rng(11)
    n = 120_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 10.0,
        attributes={
            "color": rng.integers(30, 255, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    out = str(tmp_path_factory.mktemp("viewcloud"))
    build_octree(out, 0.001, batch)
    return out


def test_node_view_container_lru_and_shuffle(octree_dir):
    octree = Octree.from_directory(octree_dir)
    container = NodeViewContainer(octree, max_nodes_in_memory=2)
    ids = [n for n in octree.node_ids if octree.node_meta(n).num_points > 100][:4]
    for nid in ids:
        assert container.get_or_request(nid) is None  # async: not yet loaded
    deadline = time.time() + 60  # generous: suite runs share 1 CPU core
    loaded = 0
    while loaded < len(ids) and time.time() < deadline:
        loaded += container.consume_arrived()
        time.sleep(0.01)
    # LRU keeps at most 2.
    assert len(container._cache) <= 2
    # Arrival order is nondeterministic (4 loader threads), so the cache
    # may hold ANY two: drive the renderer's real loop — request until the
    # async reload lands — instead of assuming ids[-1] survived.
    view = None
    while view is None and time.time() < deadline:
        container.consume_arrived()
        view = container.get_or_request(ids[-1])
        time.sleep(0.01)
    assert view is not None
    # The prefix is a subsample, not the sorted head: positions of the first
    # tenth must span most of the node's extent.
    p, _ = view.prefix(10)
    full_span = view.positions.max(axis=0) - view.positions.min(axis=0)
    prefix_span = p.max(axis=0) - p.min(axis=0)
    assert (prefix_span > 0.5 * full_span).all()
    container.shutdown()


def test_device_cull_renderer_matches_host(octree_dir):
    """device_cull=True routes the per-frame visible-node calc through
    DeviceCullSession (HBM-resident node table, one dispatch per frame);
    the visible node SET must equal the host path's for the same camera
    (ordering may permute among screen-size near-ties: f32 device vs f64
    host — the reference's own heuristic-nondeterminism class)."""
    octree = Octree.from_directory(octree_dir)
    from point_cloud_viewer_tpu.viewer.camera import Camera

    cam = Camera(640, 480)
    cam.position = np.array([5.0, 5.0, 25.0])
    matrix = cam.world_to_gl()

    host = PointCloudRenderer(octree, width=640, height=480)
    dev = PointCloudRenderer(octree, width=640, height=480, device_cull=True)
    try:
        host.camera_changed(matrix)
        dev.camera_changed(matrix)
        deadline = time.time() + 60
        while time.time() < deadline:
            with host._visible_lock, dev._visible_lock:
                if host._visible and dev._visible:
                    break
            time.sleep(0.02)
        with host._visible_lock, dev._visible_lock:
            host_ids = set(host._visible)
            dev_ids = set(dev._visible)
        assert host_ids, "host path saw nothing — bad fixture"
        assert dev_ids == host_ids
    finally:
        host.shutdown()
        dev.shutdown()


def test_adaptive_budget():
    class Dummy:
        pass

    octree = Dummy()
    r = PointCloudRenderer.__new__(PointCloudRenderer)
    r.max_nodes_moving = 100
    r.node_views = Dummy()
    r.node_views.max_nodes = 10_000
    r._budget_frames = 0
    r._budget_window_start = 0.0
    # 12 frames over 1.2 s = 10 FPS avg while moving -> one -10% step.
    for i in range(1, 13):
        r.adapt_budget(True, now=i * 0.1)
    assert r.max_nodes_moving == 90
    # Fast frames over the next window while moving -> one +10% step.
    for i in range(13, 60):
        r.adapt_budget(True, now=1.2 + (i - 12) * 0.025)
    assert r.max_nodes_moving == 100
    # Sub-20-FPS while NOT moving adjusts nothing (reference lib.rs:220),
    # and a window adjusts AT MOST once regardless of frame count.
    start = r._budget_window_start
    for i in range(100):
        r.adapt_budget(False, now=start + 0.05 * (i + 1))
    assert r.max_nodes_moving == 100


def test_run_headless_renders(octree_dir, tmp_path):
    shot = str(tmp_path / "frame.png")
    stats = run_headless(octree_dir, num_frames=25, width=320, height=240,
                         screenshot_path=shot)
    assert stats.visible_nodes > 0
    assert stats.points_drawn > 0
    assert os.path.exists(shot)
    from PIL import Image

    img = np.asarray(Image.open(shot))
    assert img.shape == (240, 320, 4)
    # The cloud must actually be visible: many non-background pixels.
    background = np.array([17, 17, 20, 255])
    non_bg = (img != background).any(axis=2).sum()
    assert non_bg > 1000


def test_wireframe_box_overlay():
    from point_cloud_viewer_tpu.math.geometry import Frustum, Isometry, Perspective
    from point_cloud_viewer_tpu.viewer.software_raster import draw_wireframe_boxes

    f = Frustum.new(Isometry.identity(), Perspective.from_fov(1.0, 1.0, 0.1, 100.0))
    img = np.zeros((128, 128, 4), dtype=np.uint8)
    draw_wireframe_boxes(
        img,
        np.array([[-1.0, -1.0, -6.0]]),
        np.array([2.0]),
        f.clip_from_query,
    )
    yellow = (img[:, :, 0] == 255) & (img[:, :, 1] == 255) & (img[:, :, 2] == 0)
    assert yellow.sum() > 50  # outline visible


def test_render_with_node_boxes(octree_dir, tmp_path):
    octree = Octree.from_directory(octree_dir)
    renderer = PointCloudRenderer(octree, width=160, height=120)
    try:
        renderer.show_octree_nodes = True
        from point_cloud_viewer_tpu.viewer.camera import Camera

        cam = Camera(160, 120)
        center = octree.bounding_box.center()
        cam.position = center + np.array([0.0, 0.0, 30.0])
        m = cam.world_to_gl()
        renderer.camera_changed(m)
        deadline = time.time() + 60
        stats, image = renderer.draw(m, render=True)
        while (
            stats.visible_nodes == 0 or stats.nodes_drawn < stats.visible_nodes
        ) and time.time() < deadline:
            time.sleep(0.05)
            stats, image = renderer.draw(m, render=True)
        assert image is not None
        assert stats.nodes_drawn > 0
    finally:
        renderer.shutdown()


def test_planet_scale_render_precision(tmp_path):
    """The software viewer path is f64 end-to-end: an ECEF-scale cloud
    (|coords| ~6.4e6 m, features at ~0.1 m) must render without precision
    collapse — distinct nearby points land on distinct pixels (ROUND_NOTES
    §6 / round-1 weak #7)."""
    from point_cloud_viewer_tpu.math.wgs84 import local_frame_from_lat_lng

    rng = np.random.default_rng(123)
    n = 5_000
    # A 20m x 20m patch of points on the Earth's surface, in ECEF.
    local = (rng.random((n, 3)) - 0.5) * np.array([20.0, 20.0, 1.0])
    frame = local_frame_from_lat_lng(48.14, 11.57)
    ecef = frame.inverse().transform_points(local)
    assert np.abs(ecef).max() > 1e6  # genuinely planet-scale coordinates
    batch = PointsBatch(
        position=ecef,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    out = str(tmp_path / "ecef")
    build_octree(out, 0.01, batch)

    octree = Octree.from_directory(out)
    cam = Camera(width=400, height=300)
    center = octree.bounding_box.center()
    up = center / np.linalg.norm(center)
    cam.position = center + up * 30.0
    cam.phi = -np.pi / 2  # this camera model: look along -z after phi
    # Orient camera down the local vertical by aligning world_to_gl manually:
    # simplest robust check — project points directly with a look-at matrix.
    from point_cloud_viewer_tpu.math.geometry import Isometry, Perspective

    z = up
    x = np.cross([0.0, 0.0, 1.0], z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    rot = np.stack([x, y, z], axis=1)
    eye = Isometry(rot, center + up * 30.0)
    proj = Perspective.from_fov(1.0, 0.75, 0.1, 200.0)
    clip_from_world = proj.matrix @ eye.inverse().to_matrix4()

    img = rasterize_points(
        batch.position, batch.attributes["color"], clip_from_world, 400, 300
    )
    # Many distinct pixels painted: f32 world coords would collapse the
    # 20m patch at 6.4e6m offset into a handful of quantized positions.
    bg = np.array([17, 17, 20, 255], dtype=np.uint8)
    painted = np.any(img != bg, axis=-1).sum()
    assert painted > 1_000, painted


def test_joystick_mappings():
    """Axis->camera mapping parity with the reference
    (sdl_viewer/src/lib.rs:304-348): raw i16 axis values scale into
    pan/rotate exactly; device classification is by name."""
    from point_cloud_viewer_tpu.viewer.input import (
        SpaceMouseJoystick, XBoxJoystick, joystick_for_name,
    )

    assert isinstance(joystick_for_name("Xbox Wireless Controller"), XBoxJoystick)
    assert isinstance(joystick_for_name("3Dconnexion SpaceMouse"), SpaceMouseJoystick)

    cam = Camera()
    cam.theta = 0.0
    cam.phi = 0.0
    XBoxJoystick().act(cam, [1000, -2000, 0, 16000, -8000])
    # pan: right=1.0, forward=-2.0 (camera frame z); rotate: around=-0.5,
    # up=0.25.
    np.testing.assert_allclose(cam._pan, [1.0, 0.0, -2.0])
    np.testing.assert_allclose(cam._rotation_speed, [-0.5, 0.25])
    speed = cam.movement_speed
    moved = cam.update(1.0)
    assert moved
    # Identity orientation at theta=phi=0: the camera-frame pan is
    # world-aligned and scaled by movement_speed * dt.
    np.testing.assert_allclose(cam.position, np.array([1.0, 0.0, -2.0]) * speed)
    np.testing.assert_allclose(cam.theta, -0.5)
    np.testing.assert_allclose(cam.phi, 0.25)

    cam2 = Camera()
    SpaceMouseJoystick().act(cam2, [500, 500, -500, 250, 100, 400])
    np.testing.assert_allclose(cam2._pan, [1.0, -1.0, 1.0])
    # up = 0.5, around = 0.2 - 0.8 = -0.6
    np.testing.assert_allclose(cam2._rotation_speed, [-0.6, 0.5])


def test_lod_subsample_deterministic_per_node(octree_dir):
    """LOD subsample order is a function of the NODE ID alone — two
    independent containers (different loader threads, different arrival
    order) must produce identical shuffled prefixes."""
    octree = Octree.from_directory(octree_dir)
    nid = next(n for n in octree.node_ids if octree.node_meta(n).num_points > 100)
    views = []
    for _ in range(2):
        container = NodeViewContainer(octree, max_nodes_in_memory=4)
        deadline = time.time() + 60
        view = None
        while view is None and time.time() < deadline:
            container.consume_arrived()
            view = container.get_or_request(nid)
            time.sleep(0.01)
        assert view is not None
        views.append(view)
        container.shutdown()
    assert np.array_equal(views[0].positions, views[1].positions)
    assert np.array_equal(views[0].colors, views[1].colors)


def test_cull_thread_survives_degenerate_matrix(octree_dir):
    """A singular camera matrix (corrupt pose slot) raises LinAlgError in
    the frustum inverse; the visible-node thread must keep the previous
    visible set and stay alive for the next camera update."""
    octree = Octree.from_directory(octree_dir)
    r = PointCloudRenderer(octree, width=160, height=120)
    try:
        cam = Camera(160, 120)
        cam.position = np.array([5.0, 5.0, 25.0])  # above the 10m cloud
        good = cam.world_to_gl()
        deadline = time.time() + 60
        r.camera_changed(good)
        while time.time() < deadline:
            with r._visible_lock:
                before = list(r._visible)
            if before:
                break
            time.sleep(0.01)
        assert before, "good matrix never produced a visible set"
        r.camera_changed(np.zeros((4, 4)))  # singular: raises inside cull
        time.sleep(0.3)
        assert r._thread.is_alive()
        with r._visible_lock:
            assert list(r._visible) == before  # previous set kept
        # Non-finite matrices don't raise — NaN SAT comparisons cull
        # nothing — but must ALSO keep the previous set (loader-storm guard).
        r.camera_changed(np.full((4, 4), np.nan))
        time.sleep(0.3)
        assert r._thread.is_alive()
        with r._visible_lock:
            assert list(r._visible) == before
        # Thread still processes subsequent updates.
        r.camera_changed(good)
        time.sleep(0.3)
        assert r._thread.is_alive()
    finally:
        r.shutdown()

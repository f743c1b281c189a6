"""Windowed SDL shell tests — drive the real event loop with a scripted
FakeBackend (no libSDL2/display needed).

Covers the reference event match (sdl_viewer/src/lib.rs:481-591): movement
and turn keys, the t/u/i/j/k CT bindings, o/7/8/9/0 display toggles,
CTRL(+SHIFT)+digit pose slots, mouse drag rotate/pan, wheel speed, window
resize, joystick polling, and Escape/Quit loop exit.
"""

import json
import os

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.octree.octree import Octree
from point_cloud_viewer_tpu.viewer.camera import Camera, PoseStore
from point_cloud_viewer_tpu.viewer.render_loop import PointCloudRenderer
from point_cloud_viewer_tpu.viewer.sdl_shell import (
    KeyDown,
    KeyUp,
    MouseMotion,
    MouseWheel,
    Quit,
    Resize,
    dispatch_event,
    run_windowed,
)


@pytest.fixture(scope="module")
def octree_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 50_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 10.0,
        attributes={"color": rng.integers(30, 255, (n, 3), dtype=np.uint8)},
    )
    out = str(tmp_path_factory.mktemp("shellcloud"))
    build_octree(out, 0.001, batch)
    return out


class FakeBackend:
    """Scripted backend implementing the shell protocol.

    `frames` is a list of per-frame event lists; after it is exhausted the
    backend reports no events.  Presented images are recorded."""

    def __init__(self, frames, joystick_specs=()):
        self.frames = list(frames)
        self.presented = []
        self.closed = False
        self._joysticks = list(joystick_specs)

    def poll_events(self):
        return self.frames.pop(0) if self.frames else []

    def joysticks(self):
        return list(self._joysticks)

    def present(self, image):
        self.presented.append(np.asarray(image))

    def close(self):
        self.closed = True


def _harness(tmp_path, octree_dir):
    octree = Octree.from_directory(octree_dir)
    camera = Camera(320, 240)
    renderer = PointCloudRenderer(octree, cache_size_mb=10, width=320, height=240)
    poses = PoseStore(str(tmp_path / "poses.json"))
    return camera, renderer, poses


# -- dispatch_event unit coverage (reference lib.rs:481-587) -----------------


def test_move_and_turn_keys(tmp_path, octree_dir):
    camera, renderer, poses = _harness(tmp_path, octree_dir)
    try:
        for key, flag in [("w", "forward"), ("s", "backward"), ("a", "left"),
                          ("d", "right"), ("z", "down"), ("q", "up")]:
            assert dispatch_event(KeyDown(key), camera, renderer, poses)
            assert camera.moving[flag] is True
            dispatch_event(KeyUp(key), camera, renderer, poses)
            assert camera.moving[flag] is False
        for key, flag in [("left", "left"), ("right", "right"),
                          ("up", "up"), ("down", "down")]:
            dispatch_event(KeyDown(key), camera, renderer, poses)
            assert camera.turning[flag] is True
            dispatch_event(KeyUp(key), camera, renderer, poses)
            assert camera.turning[flag] is False
    finally:
        renderer.shutdown()


def test_display_and_ct_keys(tmp_path, octree_dir):
    camera, renderer, poses = _harness(tmp_path, octree_dir)
    try:
        assert renderer.show_octree_nodes is False
        dispatch_event(KeyDown("o"), camera, renderer, poses)
        assert renderer.show_octree_nodes is True
        g0, s0 = renderer.gamma, renderer.point_size
        dispatch_event(KeyDown("7"), camera, renderer, poses)
        assert renderer.gamma == pytest.approx(g0 - 0.1)
        dispatch_event(KeyDown("8"), camera, renderer, poses)
        dispatch_event(KeyDown("8"), camera, renderer, poses)
        assert renderer.gamma == pytest.approx(g0 + 0.1)
        dispatch_event(KeyDown("9"), camera, renderer, poses)
        assert renderer.point_size == pytest.approx(s0 - 0.1)
        dispatch_event(KeyDown("0"), camera, renderer, poses)
        assert renderer.point_size == pytest.approx(s0)
        # CT-mode bindings exist and don't crash (semantics tested in
        # test_viewer.py's camera suite).
        for key in ("t", "u", "i", "j", "k", "t"):
            dispatch_event(KeyDown(key), camera, renderer, poses)
    finally:
        renderer.shutdown()


def test_pose_slots_ctrl_digit(tmp_path, octree_dir):
    camera, renderer, poses = _harness(tmp_path, octree_dir)
    try:
        camera.position = np.array([5.0, -2.0, 9.0])
        camera.theta, camera.phi = 0.3, 0.7
        # CTRL+SHIFT+3 saves slot 2 (reference lib.rs:522-535: Num1->slot 0).
        dispatch_event(KeyDown("3", ctrl=True, shift=True), camera, renderer, poses)
        camera.position = np.zeros(3)
        camera.theta = camera.phi = 0.0
        # CTRL+3 loads it back (lib.rs:537-551).
        dispatch_event(KeyDown("3", ctrl=True), camera, renderer, poses)
        np.testing.assert_array_equal(camera.position, [5.0, -2.0, 9.0])
        assert camera.theta == pytest.approx(0.3)
        assert camera.phi == pytest.approx(0.7)
        # CTRL+digit with an empty slot is a no-op, not an error.
        dispatch_event(KeyDown("5", ctrl=True), camera, renderer, poses)
        np.testing.assert_array_equal(camera.position, [5.0, -2.0, 9.0])
        # The file holds slot '2' ('3' key -> index 2).
        with open(os.path.join(str(tmp_path), "poses.json")) as f:
            assert "2" in json.load(f)
    finally:
        renderer.shutdown()


def test_mouse_and_resize(tmp_path, octree_dir):
    camera, renderer, poses = _harness(tmp_path, octree_dir)
    try:
        theta0 = camera.theta
        dispatch_event(MouseMotion(15, 0, left=True), camera, renderer, poses)
        camera.update(0.016)
        assert camera.theta != theta0
        pos0 = camera.position.copy()
        dispatch_event(MouseMotion(0, 10, right=True), camera, renderer, poses)
        camera.update(0.016)
        assert not np.array_equal(camera.position, pos0)
        speed0 = camera.movement_speed
        dispatch_event(MouseWheel(2), camera, renderer, poses)
        assert camera.movement_speed > speed0
        dispatch_event(Resize(640, 480), camera, renderer, poses)
        assert (camera.width, camera.height) == (640, 480)
        assert (renderer.width, renderer.height) == (640, 480)
    finally:
        renderer.shutdown()


def test_escape_and_quit_exit(tmp_path, octree_dir):
    camera, renderer, poses = _harness(tmp_path, octree_dir)
    try:
        assert dispatch_event(KeyDown("escape"), camera, renderer, poses) is False
        assert dispatch_event(Quit(), camera, renderer, poses) is False
    finally:
        renderer.shutdown()


# -- the full loop through run_windowed --------------------------------------


def test_run_windowed_presents_frames_and_quits(octree_dir):
    # Move forward for a frame, save a pose, then quit via Escape; the
    # loop must present one image per frame and close the backend.
    backend = FakeBackend([
        [KeyDown("w")],
        [KeyUp("w"), KeyDown("1", ctrl=True, shift=True)],
        [KeyDown("escape")],
        [],  # never reached
    ])
    pose_path = os.path.join(octree_dir, "poses.json")
    try:
        stats = run_windowed(octree_dir, backend=backend, width=160,
                             height=120, cache_size_mb=10)
        assert backend.closed
        assert 3 <= len(backend.presented) <= 3
        for img in backend.presented:
            assert img.shape == (120, 160, 4)
        assert stats.visible_nodes >= 0
        assert os.path.exists(pose_path)
    finally:
        # The fixture is module-scoped: leaving the saved pose behind
        # would make later tests order-dependent.
        if os.path.exists(pose_path):
            os.remove(pose_path)


def test_run_windowed_max_frames_bound(octree_dir):
    backend = FakeBackend([])
    run_windowed(octree_dir, backend=backend, width=160, height=120,
                 cache_size_mb=10, max_frames=2)
    assert len(backend.presented) == 2
    assert backend.closed


def test_run_windowed_polls_joystick_each_frame(octree_dir):
    # An XBox pad with a pushed stick must be POLLED once per frame
    # through the live pump (reference lib.rs:588-591); the axis->motion
    # math itself is covered by test_joystick_mappings.
    calls = {"n": 0}

    def axes():
        calls["n"] += 1
        return [0, -20000, 0, 0, 0, 0]

    backend = FakeBackend(
        [[], [], [KeyDown("escape")]],
        joystick_specs=[("Xbox Wireless Controller", axes)],
    )
    stats = run_windowed(octree_dir, backend=backend, width=160, height=120,
                         cache_size_mb=10)
    assert len(backend.presented) == 3
    assert calls["n"] == 3, "joystick must be polled exactly once per frame"
    assert stats is not None


def test_run_windowed_gl_path(octree_dir):
    """The windowed loop presenting frames read back from the real GL
    pipeline (surfaceless EGL) instead of the software rasterizer."""
    pytest.importorskip("OpenGL")
    backend = FakeBackend([[KeyDown("0")], [Quit()]])
    try:
        stats = run_windowed(octree_dir, backend=backend, width=160,
                             height=120, cache_size_mb=10, use_gl=True)
    except RuntimeError as e:
        pytest.skip(f"no EGL context here: {e}")
    assert backend.closed
    assert len(backend.presented) == 2
    assert backend.presented[0].shape == (120, 160, 4)
    assert stats is not None


def test_sdl_backend_unavailable_raises():
    from point_cloud_viewer_tpu.viewer.input import sdl_available
    from point_cloud_viewer_tpu.viewer.sdl_shell import SdlBackend

    if sdl_available():
        pytest.skip("libSDL2 present on this machine")
    with pytest.raises(RuntimeError, match="SDL"):
        SdlBackend(100, 100)

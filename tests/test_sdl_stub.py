"""Execute SdlBackend's REAL ctypes layer against a scriptable fake libSDL2
(VERDICT r4 item 5).

The stub (native/sdl2_stub.cpp) hand-derives the SDL_Event struct layouts
from the SDL2 ABI in C — the C compiler computes the offsets — so a wrong
offset in sdl_shell.py's ctypes structs shows up here as garbled fields
instead of shipping silently.  Only the window-open syscall itself remains
environment-gated (no display); every byte of marshalling, the call
sequences, the pixel upload, and joystick polling execute for real.

Mirrors the FakeBackend suite's behavioral assertions
(tests/test_sdl_shell.py) through the real backend:
reference sdl_viewer/src/lib.rs:350-611.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.viewer.sdl_shell import (
    KeyDown,
    KeyUp,
    MouseMotion,
    MouseWheel,
    Quit,
    Resize,
    SdlBackend,
    run_windowed,
)

_SRC = os.path.join(
    os.path.dirname(__file__), "..", "point_cloud_viewer_tpu", "native",
    "sdl2_stub.cpp",
)

_KMOD_LSHIFT = 0x0001
_KMOD_LCTRL = 0x0040
_SC = {"w": 26, "1": 30, "3": 32, "escape": 41, "left": 80}


@pytest.fixture(scope="module")
def stub_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("sdlstub")
    so = str(d / "libsdl2_stub.so")
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-O1", "-o", so, os.path.abspath(_SRC)],
        check=True, capture_output=True,
    )
    return so


@pytest.fixture
def stub(stub_path):
    """The control-plane handle to the stub; resets its state per test."""
    lib = ctypes.CDLL(stub_path)
    lib.pcv_stub_get.restype = ctypes.c_int
    lib.pcv_stub_get.argtypes = [ctypes.c_char_p]
    lib.pcv_stub_pixel_sum.restype = ctypes.c_uint64
    lib.pcv_stub_tex_format.restype = ctypes.c_uint64
    lib.pcv_stub_window_title.restype = ctypes.c_char_p
    lib.pcv_stub_set_joystick.argtypes = [ctypes.c_char_p]
    lib.pcv_stub_set_axis.argtypes = [ctypes.c_int, ctypes.c_int16]
    lib.pcv_stub_reset()
    return lib


def _get(stub, name: str) -> int:
    v = stub.pcv_stub_get(name.encode())
    assert v != -0x7FFFFFFF, f"unknown stub counter {name}"
    return v


@pytest.fixture(scope="module")
def octree_dir(tmp_path_factory):
    rng = np.random.default_rng(11)
    n = 20_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 10.0,
        attributes={"color": rng.integers(30, 255, (n, 3), dtype=np.uint8)},
    )
    out = str(tmp_path_factory.mktemp("stubcloud"))
    build_octree(out, 0.001, batch)
    return out


def test_init_and_window_calls(stub, stub_path):
    backend = SdlBackend(640, 400, lib_path=stub_path)
    try:
        # SDL_INIT_VIDEO|SDL_INIT_JOYSTICK and SHOWN|RESIZABLE, as the
        # reference does (lib.rs:438-468).
        assert _get(stub, "init_flags") == 0x20 | 0x200
        assert (_get(stub, "window_w"), _get(stub, "window_h")) == (640, 400)
        assert _get(stub, "window_flags") == 0x4 | 0x20
        assert stub.pcv_stub_window_title() == b"point_cloud_viewer_tpu"
    finally:
        backend.close()
    assert _get(stub, "window_destroyed") == 1
    assert _get(stub, "renderer_destroyed") == 1
    assert _get(stub, "quit_called") == 1


def test_init_failure_surfaces_sdl_error(stub, stub_path):
    stub.pcv_stub_set_init_result(1)
    with pytest.raises(RuntimeError, match="stub-injected failure"):
        SdlBackend(100, 100, lib_path=stub_path)


def test_event_struct_marshalling(stub, stub_path):
    """Every SDL_Event variant the consumer reads, pushed as C structs and
    decoded through the Python ctypes layouts field by field."""
    backend = SdlBackend(320, 240, lib_path=stub_path)
    try:
        stub.pcv_stub_push_keydown(_SC["w"], 0)
        stub.pcv_stub_push_keydown(_SC["3"], _KMOD_LCTRL | _KMOD_LSHIFT)
        stub.pcv_stub_push_keydown(_SC["left"], 0)
        stub.pcv_stub_push_keydown(100, 0)  # unbound scancode: dropped
        stub.pcv_stub_push_keyup(_SC["w"])
        stub.pcv_stub_push_mousemotion(1, 50, 60, 15, -4)   # left drag
        stub.pcv_stub_push_mousemotion(4, 51, 61, -2, 7)    # right drag
        stub.pcv_stub_push_wheel(-3)
        stub.pcv_stub_push_windowevent(6, 800, 450)  # SIZE_CHANGED
        stub.pcv_stub_push_windowevent(1, 9, 9)      # SHOWN: ignored
        stub.pcv_stub_push_quit()
        events = backend.poll_events()
        assert events == [
            KeyDown("w"),
            KeyDown("3", ctrl=True, shift=True),
            KeyDown("left"),
            KeyUp("w"),
            MouseMotion(15, -4, left=True),
            MouseMotion(-2, 7, right=True),
            MouseWheel(-3),
            Resize(800, 450),
            Quit(),
        ]
        assert backend.poll_events() == []  # queue drained
    finally:
        backend.close()


def test_present_uploads_pixels(stub, stub_path):
    backend = SdlBackend(320, 240, lib_path=stub_path)
    try:
        img = np.arange(120 * 160 * 4, dtype=np.uint32).astype(np.uint8)
        img = img.reshape(120, 160, 4)
        backend.present(img)
        assert _get(stub, "textures_created") == 1
        assert (_get(stub, "tex_w"), _get(stub, "tex_h")) == (160, 120)
        assert stub.pcv_stub_tex_format() == 0x16762004  # ABGR8888
        assert _get(stub, "tex_access") == 1  # STREAMING
        assert _get(stub, "last_pitch") == 160 * 4
        assert stub.pcv_stub_pixel_sum() == int(img.sum())
        assert _get(stub, "render_clear") == 1
        assert _get(stub, "render_copy") == 1
        assert _get(stub, "render_present") == 1

        # A different frame size recreates the texture (old one destroyed).
        img2 = np.full((60, 80, 4), 7, dtype=np.uint8)
        backend.present(img2)
        assert _get(stub, "textures_created") == 2
        assert _get(stub, "textures_destroyed") == 1
        assert (_get(stub, "tex_w"), _get(stub, "tex_h")) == (80, 60)
        assert stub.pcv_stub_pixel_sum() == int(img2.sum())
    finally:
        backend.close()
    assert _get(stub, "textures_destroyed") == 2


def test_joystick_axis_marshalling(stub, stub_path):
    stub.pcv_stub_set_joystick(b"Xbox Wireless Controller")
    stub.pcv_stub_set_axis(1, -20000)  # negative: exercises c_int16 restype
    stub.pcv_stub_set_axis(3, 12345)
    backend = SdlBackend(320, 240, lib_path=stub_path)
    try:
        joys = backend.joysticks()
        assert len(joys) == 1
        name, axes_fn = joys[0]
        assert name == "Xbox Wireless Controller"
        assert axes_fn() == [0, -20000, 0, 12345, 0, 0]
    finally:
        backend.close()
    assert _get(stub, "joystick_closed") == 1


def test_run_windowed_through_real_ctypes(stub, stub_path, octree_dir):
    """The FULL windowed loop on the real SdlBackend: per-frame scripted
    C events (keydown W / pose save / escape), asserting what the
    FakeBackend suite asserts — one present per frame, pose file written,
    clean teardown (mirrors test_run_windowed_presents_frames_and_quits)."""
    stub.pcv_stub_push_keydown(_SC["w"], 0)
    stub.pcv_stub_push_frame_end()
    stub.pcv_stub_push_keyup(_SC["w"])
    stub.pcv_stub_push_keydown(_SC["1"], _KMOD_LCTRL | _KMOD_LSHIFT)
    stub.pcv_stub_push_frame_end()
    stub.pcv_stub_push_keydown(_SC["escape"], 0)

    backend = SdlBackend(160, 120, lib_path=stub_path)
    pose_path = os.path.join(octree_dir, "poses.json")
    try:
        stats = run_windowed(octree_dir, backend=backend, width=160,
                             height=120, cache_size_mb=10)
        assert _get(stub, "render_present") == 3  # one per frame
        assert _get(stub, "update_count") == 3
        assert _get(stub, "last_pitch") == 160 * 4
        assert stats.visible_nodes >= 0
        assert os.path.exists(pose_path)
        # Teardown ran through the real close() path.
        assert _get(stub, "quit_called") == 1
        assert _get(stub, "window_destroyed") == 1
    finally:
        if os.path.exists(pose_path):
            os.remove(pose_path)


def test_run_windowed_polls_stub_joystick_each_frame(stub, stub_path,
                                                     octree_dir):
    stub.pcv_stub_set_joystick(b"Xbox Wireless Controller")
    stub.pcv_stub_push_frame_end()
    stub.pcv_stub_push_frame_end()
    stub.pcv_stub_push_quit()
    backend = SdlBackend(160, 120, lib_path=stub_path)
    run_windowed(octree_dir, backend=backend, width=160, height=120,
                 cache_size_mb=10)
    assert _get(stub, "render_present") == 3
    # Six axes polled exactly once per frame (reference lib.rs:588-591).
    assert _get(stub, "axis_calls") == 3 * 6

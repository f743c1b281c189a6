"""Real OpenGL render path (the reference's sdl_viewer GPU pipeline).

The reference draws points through GLSL programs compiled by a live GL
driver (sdl_viewer/src/graphic/mod.rs, node_drawer.rs, shaders/*.vs).
This package is its counterpart, designed for headless operation: a
surfaceless EGL context (Mesa llvmpipe in this environment — a real,
conformant GL 4.x driver) renders into an offscreen framebuffer, with
glReadPixels screenshots.  On a machine with a display the same code runs
against the native GPU driver; only the context bootstrap differs.

Use `available()` before constructing contexts; everything degrades to the
numpy software rasterizer when no GL driver exists.
"""

from __future__ import annotations


def available() -> bool:
    """True when a headless GL context can be created on this machine."""
    try:
        from . import api

        return api.probe()
    except Exception:
        return False

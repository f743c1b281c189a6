"""PointCloudClient streaming tests: batch sizing, filters, early stop
(reference analogues: src/octree/tests.rs:83-136)."""

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import Aabb
from point_cloud_viewer_tpu.math.intervals import ClosedInterval
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.query.client import PointCloudClient
from point_cloud_viewer_tpu.query.point_query import PointQuery


@pytest.fixture(scope="module")
def cloud(tmp_path_factory):
    rng = np.random.default_rng(99)
    n = 200_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 10.0,
        attributes={
            "color": rng.integers(0, 256, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    out = str(tmp_path_factory.mktemp("cloud"))
    build_octree(out, 0.001, batch)
    return batch, out


def test_batch_count_exact(cloud):
    batch, out = cloud
    client = PointCloudClient.from_locations([out], batch_size=10_000, num_threads=4)
    sizes = []
    client.for_each_point_data(
        PointQuery(attributes=["color"]), lambda b: sizes.append(len(b))
    )
    assert sum(sizes) == len(batch)
    # All but at most num_threads trailing flushes are exactly batch_size
    # (one flush per worker; reference semantics, src/iterator.rs:147-166).
    full = [s for s in sizes if s == 10_000]
    assert len(sizes) - len(full) <= 4


def test_early_termination(cloud):
    _, out = cloud
    client = PointCloudClient.from_locations([out], batch_size=5_000, num_threads=4)

    class Boom(RuntimeError):
        pass

    calls = []

    def cb(batch):
        calls.append(len(batch))
        if len(calls) == 2:
            raise Boom("stop")

    with pytest.raises(Boom):
        client.for_each_point_data(PointQuery(attributes=["color"]), cb)
    assert len(calls) == 2


def test_interval_filter(cloud):
    batch, out = cloud
    client = PointCloudClient.from_locations([out], batch_size=50_000, num_threads=2)
    interval = ClosedInterval(0.25, 0.5)
    got = []
    client.for_each_point_data(
        PointQuery(
            attributes=["color", "intensity"],
            filter_intervals={"intensity": interval},
        ),
        lambda b: got.append(b),
    )
    total = sum(len(b) for b in got)
    expected = int(np.sum(interval.contains(batch.attributes["intensity"])))
    assert total == expected
    for b in got:
        assert interval.contains(b.attributes["intensity"]).all()


def test_filter_attribute_must_be_queried(cloud):
    _, out = cloud
    client = PointCloudClient.from_locations([out], num_threads=2)
    with pytest.raises(KeyError):
        client.for_each_point_data(
            PointQuery(
                attributes=["color"],
                filter_intervals={"intensity": ClosedInterval(0, 1)},
            ),
            lambda b: None,
        )


def test_aabb_location_total(cloud):
    batch, out = cloud
    client = PointCloudClient.from_locations([out], num_threads=2)
    box = Aabb([2.0, 2.0, 2.0], [5.0, 5.0, 5.0])
    total = 0

    def cb(b):
        nonlocal total
        total += len(b)

    client.for_each_point_data(
        PointQuery(attributes=["color"], location=box), cb
    )
    inner = Aabb(box.mins + 0.002, box.maxs - 0.002)
    outer = Aabb(box.mins - 0.002, box.maxs + 0.002)
    assert (
        int(inner.contains(batch.position).sum())
        <= total
        <= int(outer.contains(batch.position).sum())
    )


def test_bounding_box_union(cloud):
    _, out = cloud
    client = PointCloudClient.from_locations([out, out])
    bb = client.bounding_box()
    assert (bb.maxs > bb.mins).all()


def test_stream_is_lazy_and_cancellable(cloud):
    """stream() must yield before the full query completes and cancel
    cleanly when abandoned mid-iteration."""
    import threading

    from point_cloud_viewer_tpu.query.location import AllPoints

    batch, out = cloud
    client = PointCloudClient.from_locations([out], num_threads=2, batch_size=100)
    gen = client.stream(PointQuery(attributes=["color"], location=AllPoints()))
    first = next(gen)
    assert len(first) == 100  # yielded long before the 200k-point query ends
    gen.close()  # abandon: must cancel workers and join them, not deadlock
    # Count only OUR named workers — a global active_count() comparison
    # is racy against unrelated pool threads from other tests.
    workers = [t for t in threading.enumerate()
               if t.name == "pcv-stream-worker" and t.is_alive()]
    assert not workers, workers
    # A fresh full stream still works after an abandoned one.
    total = sum(len(b) for b in client.stream(
        PointQuery(attributes=["color"], location=AllPoints())
    ))
    assert total == len(batch)


def test_rebatcher_exact_and_order_preserving():
    """_Rebatcher must emit exact batch_size chunks in input order for any
    mix of part sizes (incl. one giant input batch — the path that used to
    re-copy the tail per emitted batch) and flush the remainder."""
    from point_cloud_viewer_tpu.query.client import _Rebatcher

    rng = np.random.default_rng(21)
    for sizes in ([250_000], [7, 3, 99_990], [1] * 25, [13, 250_001, 5, 0, 981]):
        out = []
        rb = _Rebatcher(10_000, out.append)
        chunks = []
        offset = 0
        for s in sizes:
            idx = np.arange(offset, offset + s, dtype=np.float64)
            chunks.append(idx)
            offset += s
            rb.push(PointsBatch(
                position=np.stack([idx, idx, idx], axis=1),
                attributes={"v": idx.astype(np.float32)},
            ))
        rb.flush()
        total = int(sum(sizes))
        assert [len(b) for b in out[:-1]] == [10_000] * (len(out) - 1 if total else 0)
        assert sum(len(b) for b in out) == total
        got = np.concatenate([b.position[:, 0] for b in out]) if out else np.empty(0)
        np.testing.assert_array_equal(got, np.arange(total, dtype=np.float64))
        gotv = np.concatenate([b.attributes["v"] for b in out]) if out else np.empty(0)
        np.testing.assert_array_equal(gotv, np.arange(total, dtype=np.float32))


def test_fully_inside_shortcut_sound_and_exact(cloud):
    """nodes_in_location_ex's fully_inside flag must be SOUND: every point
    of a flagged node passes the query's per-point containment test — so
    skipping the mask (query/client.py) cannot change results.  A box that
    strictly contains the whole cloud flags every node; a partial box's
    flags are verified point-by-point and the streamed result must equal
    brute force on the raw data."""
    from point_cloud_viewer_tpu.octree.octree import Octree
    from point_cloud_viewer_tpu.query.location import location_for

    batch, out = cloud
    octree = Octree.from_directory(out)

    # Whole-cloud box with margin: every node is fully inside (hi < maxs is
    # strict because Aabb.contains is half-open at the max).
    big = Aabb(batch.position.min(axis=0) - 1.0, batch.position.max(axis=0) + 1.0)
    ex = octree.nodes_in_location_ex(location_for(big))
    assert ex and all(fully for _, fully in ex)

    # Partial box: verify each flagged node point-by-point.
    center = batch.position.mean(axis=0)
    box = Aabb(center - 3.0, center + 3.0)
    loc = location_for(box)
    ex = octree.nodes_in_location_ex(loc)
    assert [nid for nid, _ in ex] == octree.nodes_in_location(loc)
    for nid, fully in ex:
        if fully:
            pts = octree.points_in_node(nid).position
            assert loc.contains(pts).all()

    # End-to-end: streamed result equals brute force over the DECODED
    # (quantized) positions — the exact per-point test the client applies
    # (colors re-identify points; compare as sorted row sets).
    client = PointCloudClient.from_locations([out], num_threads=2)
    all_pos, all_col = [], []
    client.for_each_point_data(
        PointQuery(attributes=["color"]),
        lambda b: (all_pos.append(b.position.copy()),
                   all_col.append(b.attributes["color"].copy())),
    )
    all_pos = np.concatenate(all_pos)
    all_col = np.concatenate(all_col)
    got = []
    client.for_each_point_data(
        PointQuery(attributes=["color"], location=box),
        lambda b: got.append(b.attributes["color"].copy()),
    )
    got = np.concatenate(got) if got else np.empty((0, 3), np.uint8)
    want = all_col[loc.contains(all_pos)]
    order = lambda a: a[np.lexsort(a.T)]
    np.testing.assert_array_equal(order(got), order(want))


def test_cell_union_fully_inside_skips_leaf_ids(tmp_path):
    """For S2 clouds, a storage cell CONTAINED in the query union is flagged
    fully_inside (bit-exact: every point's leaf cell is a descendant of the
    storage cell, hence in the union) and the streamed result still equals
    the per-point brute force."""
    from point_cloud_viewer_tpu.math import s2 as s2m
    from point_cloud_viewer_tpu.math.wgs84 import local_frame_from_lat_lng
    from point_cloud_viewer_tpu.s2_cells.cell_union import CellUnion
    from point_cloud_viewer_tpu.s2_cells.container import S2Cells
    from point_cloud_viewer_tpu.s2_cells.splitter import build_s2_cloud

    rng = np.random.default_rng(7)
    n = 60_000
    local = (rng.random((n, 3)) - 0.5) * np.array([400.0, 400.0, 30.0])
    frame = local_frame_from_lat_lng(12.3, 45.6)
    ecef = frame.inverse().transform_points(local)
    batch = PointsBatch(
        position=ecef,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    out = str(tmp_path / "s2")
    build_s2_cloud(out, batch)

    leaves = s2m.leaf_cell_ids_from_points(ecef[:200])
    union = CellUnion(np.unique(s2m.parent(leaves, 15)))
    cells = S2Cells.from_directory(out)
    ex = cells.nodes_in_location_ex(union)
    flags = {str(cid): fully for cid, fully in ex}
    inside = union.contains_cell_ids(cells.cell_ids)
    for cid, is_in in zip(cells.cell_ids, inside):
        tok = s2m.token(cid)
        if tok in flags:
            assert flags[tok] == bool(is_in)
    assert any(flags.values())  # the shortcut actually fires

    client = PointCloudClient.from_locations([out], num_threads=2)
    got = []
    client.for_each_point_data(
        PointQuery(attributes=["color"], location=union),
        lambda b: got.append(b.attributes["color"].copy()),
    )
    got = np.concatenate(got) if got else np.empty((0, 3), np.uint8)
    want = batch.attributes["color"][union.contains(ecef)]
    order = lambda a: a[np.lexsort(a.T)]
    np.testing.assert_array_equal(order(got), order(want))

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

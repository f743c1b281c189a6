"""Out-of-core streaming builder: bit-identical output to the in-memory
builder across tree shapes (deep splits, shallow leaves, tiny clouds)."""

import os

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.octree.streaming import build_octree_streaming


def _assert_same_output(a: str, b: str):
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(a, b, context="streaming vs in-core")


def _compare(tmp_path, batch, resolution, bucket_levels=2, batches=None):
    mem_dir = str(tmp_path / "mem")
    stream_dir = str(tmp_path / "stream")
    build_octree(mem_dir, resolution, batch)
    build_octree_streaming(
        stream_dir,
        resolution,
        batches if batches is not None else batch,
        bounding_box=None if batches is None else _bbox(batch),
        bucket_levels=bucket_levels,
        spill_directory=str(tmp_path / "spill"),
    )
    _assert_same_output(mem_dir, stream_dir)


def _bbox(batch):
    from point_cloud_viewer_tpu.math.geometry import Aabb

    return Aabb.bounding_points(batch.position)


def test_streaming_matches_memory_uniform(tmp_path):
    rng = np.random.default_rng(0)
    n = 300_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 50.0,
        attributes={
            "color": rng.integers(0, 255, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    _compare(tmp_path, batch, 0.001)


def test_streaming_matches_memory_clustered(tmp_path):
    """Clusters produce shallow leaves in some octants and deep splits in
    others — exercises the top-structure decisions."""
    rng = np.random.default_rng(1)
    parts = [
        rng.normal([5, 5, 5], 0.05, (150_000, 3)),  # dense tiny cluster
        rng.random((3_000, 3)) * 100.0,  # sparse wide
        rng.normal([80, 80, 10], 0.5, (60_000, 3)),
    ]
    position = np.concatenate(parts)
    batch = PointsBatch(
        position=position,
        attributes={"color": rng.integers(0, 255, (len(position), 3), dtype=np.uint8)},
    )
    _compare(tmp_path, batch, 0.001, bucket_levels=2)


def test_streaming_matches_memory_batched_input(tmp_path):
    """Iterator input (multiple batches) with an explicit bounding box."""
    rng = np.random.default_rng(2)
    n = 120_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 10.0,
        attributes={"color": rng.integers(0, 255, (n, 3), dtype=np.uint8)},
    )
    batches = [batch.slice(s, min(n, s + 25_000)) for s in range(0, n, 25_000)]
    _compare(tmp_path, batch, 0.01, batches=batches)


def test_streaming_empty_batch_in_stream(tmp_path):
    """A reader may yield a zero-length trailing chunk; the spill pass must
    skip it (regression: the run-boundary scan indexed an empty array)."""
    rng = np.random.default_rng(11)
    n = 20_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 10.0,
        attributes={"color": rng.integers(0, 255, (n, 3), dtype=np.uint8)},
    )
    empty = PointsBatch(
        position=np.zeros((0, 3)),
        attributes={"color": np.zeros((0, 3), dtype=np.uint8)},
    )
    batches = [empty, batch.slice(0, n // 2), empty, batch.slice(n // 2, n), empty]
    _compare(tmp_path, batch, 0.01, batches=batches)


def test_streaming_small_and_single(tmp_path):
    batch = PointsBatch(
        position=np.array([[1.0, 2.0, 3.0], [1.1, 2.1, 3.1]]),
        attributes={"color": np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)},
    )
    _compare(tmp_path, batch, 0.01)


def test_streaming_one_shot_iterator_without_bbox_raises(tmp_path):
    """A generator (one-shot) with no bounding_box would be exhausted by the
    bbox pass and silently build an EMPTY octree; it must raise instead."""
    rng = np.random.default_rng(12)
    batch = PointsBatch(position=rng.random((1000, 3)))
    with pytest.raises(ValueError, match="one-shot iterator"):
        build_octree_streaming(
            str(tmp_path / "out"), 0.01, (b for b in [batch])
        )


def test_streaming_unknown_attribute_fails_before_spill(tmp_path):
    """A typo'd attribute name must raise the same clear ValueError as
    build_octree, on the FIRST batch — not a KeyError after the bbox pass."""
    rng = np.random.default_rng(13)
    batch = PointsBatch(
        position=rng.random((1000, 3)),
        attributes={"color": rng.integers(0, 255, (1000, 3), dtype=np.uint8)},
    )
    with pytest.raises(ValueError, match="requested attributes not in input"):
        build_octree_streaming(
            str(tmp_path / "out"), 0.01, [batch], attributes=["colr"]
        )
    # Same check when the bbox is supplied (no pass 1).
    from point_cloud_viewer_tpu.math.geometry import Aabb

    with pytest.raises(ValueError, match="requested attributes not in input"):
        build_octree_streaming(
            str(tmp_path / "out2"), 0.01, [batch],
            bounding_box=Aabb.bounding_points(batch.position),
            attributes=["colr"],
        )


def test_streaming_bucket_levels_variants(tmp_path):
    rng = np.random.default_rng(3)
    n = 150_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 30.0,
        attributes={"color": rng.integers(0, 255, (n, 3), dtype=np.uint8)},
    )
    for b in (1, 3):
        _compare(tmp_path / f"b{b}", batch, 0.001, bucket_levels=b)


def test_streaming_resume_after_crash(tmp_path, monkeypatch):
    """A streaming build killed mid-bucket resumes from its spill-directory
    checkpoint and produces byte-identical output to an uninterrupted
    build (SURVEY §5 failure/recovery)."""
    import os

    import numpy as np

    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.octree import streaming as S

    rng = np.random.default_rng(77)
    n = 1_200_000  # 8 buckets of ~150k points: every bucket splits
    batch = PointsBatch(
        position=rng.random((n, 3)) * 64.0,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )

    ref_dir = str(tmp_path / "uninterrupted")
    S.build_octree_streaming(ref_dir, 0.01, batch, bucket_levels=1)

    crash_dir = str(tmp_path / "crashy")
    spill = str(tmp_path / "spill")
    real_build = S._build_bucket_subtree
    calls = {"n": 0}

    def exploding(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated crash")
        return real_build(*args, **kwargs)

    monkeypatch.setattr(S, "_build_bucket_subtree", exploding)
    try:
        S.build_octree_streaming(
            crash_dir, 0.01, batch, bucket_levels=1, spill_directory=spill
        )
        raise AssertionError("expected the simulated crash")
    except RuntimeError:
        pass
    monkeypatch.setattr(S, "_build_bucket_subtree", real_build)

    # Checkpoint state exists: spill marker + at least one finished bucket.
    assert os.path.exists(os.path.join(spill, S._SPILL_MARKER))
    assert any(f.startswith("_done_b") for f in os.listdir(spill))

    # Resume with the same call; data arg is still required by the API but
    # must NOT be re-read (pass 2 is skipped): hand in a poisoned iterator.
    def poisoned():
        raise AssertionError("resume must not re-stream the input")
        yield  # pragma: no cover

    from point_cloud_viewer_tpu.math.geometry import Aabb

    result = S.build_octree_streaming(
        crash_dir, 0.01, poisoned(),
        bounding_box=Aabb.bounding_points(batch.position),
        bucket_levels=1, spill_directory=spill,
    )
    assert result.num_points == n

    files_a = sorted(os.listdir(ref_dir))
    files_b = sorted(os.listdir(crash_dir))
    assert files_a == files_b
    for f in files_a:
        with open(os.path.join(ref_dir, f), "rb") as fa:
            a = fa.read()
        with open(os.path.join(crash_dir, f), "rb") as fb:
            b = fb.read()
        assert a == b, f


def test_streaming_restart_after_spill_crash(tmp_path):
    """A crash DURING the spill pass (partial bucket files, no completion
    marker) must not corrupt the rerun: stale spill files are cleared and
    the rebuilt output is byte-identical to a clean build."""
    import os

    import numpy as np

    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.octree import streaming as S

    rng = np.random.default_rng(13)
    n = 200_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 32.0,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )
    ref_dir = str(tmp_path / "clean")
    S.build_octree_streaming(ref_dir, 0.01, batch, bucket_levels=1)

    # Simulate an interrupted spill pass: partial bucket files, no marker.
    spill = str(tmp_path / "spill")
    os.makedirs(spill)
    with open(os.path.join(spill, "b0003.position"), "wb") as f:
        f.write(b"\x00" * 1234)  # truncated garbage from the dead run
    with open(os.path.join(spill, "b0003.color"), "wb") as f:
        f.write(b"\x07" * 99)

    out_dir = str(tmp_path / "rebuilt")
    S.build_octree_streaming(
        out_dir, 0.01, batch, bucket_levels=1, spill_directory=spill
    )
    files_a = sorted(os.listdir(ref_dir))
    files_b = sorted(os.listdir(out_dir))
    assert files_a == files_b
    for f in files_a:
        with open(os.path.join(ref_dir, f), "rb") as fa, open(
            os.path.join(out_dir, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f
    # Success clears the checkpoint.
    assert not os.path.exists(spill) or not os.listdir(spill)


def test_streaming_corrupt_marker_is_clean_slate(tmp_path):
    """An unparseable/empty spill marker (crash mid-write before the atomic
    replace existed, disk corruption) must be treated as 'no checkpoint' —
    the build rebuilds from scratch instead of raising ValueError forever."""
    from point_cloud_viewer_tpu.octree import streaming as S

    rng = np.random.default_rng(5)
    batch = PointsBatch(
        position=rng.random((5_000, 3)) * 40.0,
        attributes={"color": rng.integers(0, 256, (5_000, 3), dtype=np.uint8)},
    )
    mem_dir = str(tmp_path / "mem")
    build_octree(mem_dir, 0.01, batch)

    spill = str(tmp_path / "spill")
    os.makedirs(spill)
    # Truncated JSON marker.
    with open(os.path.join(spill, S._SPILL_MARKER), "w") as f:
        f.write('{"params": {"resol')
    out_dir = str(tmp_path / "stream")
    build_octree_streaming(
        out_dir, 0.01, batch, bucket_levels=1, spill_directory=spill
    )
    _assert_same_output(mem_dir, out_dir)

    # A VALID marker for different params must still raise.
    os.makedirs(spill, exist_ok=True)
    import json

    with open(os.path.join(spill, S._SPILL_MARKER), "w") as f:
        json.dump({"params": {"resolution": 0.5}}, f)
    with pytest.raises(ValueError, match="DIFFERENT build"):
        build_octree_streaming(
            str(tmp_path / "stream2"), 0.01, batch,
            bucket_levels=1, spill_directory=spill,
        )


def test_streaming_use_device_byte_identical(tmp_path):
    """The device-core bucket derivation (use_device=True) must produce
    byte-identical output to the host streaming build — this is how the
    device core scales past HBM (buckets bound the working set)."""
    import os

    import numpy as np

    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.octree.streaming import build_octree_streaming

    rng = np.random.default_rng(77)
    n = 250_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 40.0,
        attributes={
            "color": rng.integers(0, 256, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )
    host_dir = str(tmp_path / "host")
    dev_dir = str(tmp_path / "dev")
    build_octree_streaming(host_dir, 0.0005, batch, bucket_levels=1)
    build_octree_streaming(dev_dir, 0.0005, batch, bucket_levels=1,
                           use_device=True)
    fa, fb = sorted(os.listdir(host_dir)), sorted(os.listdir(dev_dir))
    assert fa == fb
    for f in fa:
        with open(os.path.join(host_dir, f), "rb") as a, open(
            os.path.join(dev_dir, f), "rb"
        ) as b:
            assert a.read() == b.read(), f


def test_streaming_device_pipeline_byte_identical(tmp_path):
    """With buckets holding > MAX_POINTS_PER_NODE points, the device path
    takes the PIPELINED route (one bucket's derivation dispatched ahead of
    the bucket being finished, FIFO completion) — output must stay
    byte-identical to the sequential host streaming build.  The 250k test
    above only exercises the no-subtree top-feed path; here at least 4
    buckets go through dispatch+finish with one in flight."""
    import os

    import numpy as np

    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.octree.streaming import build_octree_streaming

    rng = np.random.default_rng(78)
    n = 900_000
    # Concentrate mass in 4 octants so those buckets exceed the 100k split
    # threshold while the rest stay shallow (covers both loop branches
    # interleaved with in-flight work).
    octant = rng.integers(0, 4, n)
    position = rng.random((n, 3)) * 20.0
    position[:, 0] += (octant % 2) * 20.0
    position[:, 1] += (octant // 2) * 20.0
    batch = PointsBatch(
        position=position,
        attributes={
            "color": rng.integers(0, 256, (n, 3), dtype=np.uint8),
        },
    )
    host_dir = str(tmp_path / "host")
    dev_dir = str(tmp_path / "dev")
    build_octree_streaming(host_dir, 0.001, batch, bucket_levels=1)
    build_octree_streaming(dev_dir, 0.001, batch, bucket_levels=1,
                           use_device=True)
    fa, fb = sorted(os.listdir(host_dir)), sorted(os.listdir(dev_dir))
    assert fa == fb
    assert len(fa) > 12  # real subtrees were built, not just the top
    for f in fa:
        with open(os.path.join(host_dir, f), "rb") as a, open(
            os.path.join(dev_dir, f), "rb"
        ) as b:
            assert a.read() == b.read(), f


def test_streaming_resume_accepts_legacy_marker(tmp_path):
    """Spill checkpoints written before `total_cap` existed (always
    non-deep builds) must still resume instead of raising a
    params-mismatch error."""
    import json

    from point_cloud_viewer_tpu.octree import streaming as S

    rng = np.random.default_rng(3)
    n = 150_000  # one bucket holds everything and exceeds the node cap
    batch = PointsBatch(position=rng.random((n, 3)) * 3.9)
    bbox = _bbox(PointsBatch(position=np.array([[0.0, 0.0, 0.0], [8.0, 8.0, 8.0]])))
    spill = str(tmp_path / "spill")
    out1 = str(tmp_path / "a")

    # Interrupt after the spill pass so the marker survives.
    real = S._build_bucket_subtree

    def boom(*a, **k):
        raise RuntimeError("interrupt")

    S._build_bucket_subtree = boom
    try:
        with pytest.raises(RuntimeError):
            build_octree_streaming(
                out1, 0.01, batch, bounding_box=bbox, bucket_levels=1,
                spill_directory=spill,
            )
    finally:
        S._build_bucket_subtree = real

    # Age the marker to the pre-total_cap schema.
    marker_path = os.path.join(spill, S._SPILL_MARKER)
    with open(marker_path) as f:
        marker = json.load(f)
    assert marker["params"].pop("total_cap") == marker["params"]["depth_cap"]
    with open(marker_path, "w") as f:
        json.dump(marker, f)

    out2 = str(tmp_path / "b")
    build_octree_streaming(
        out2, 0.01, batch, bounding_box=bbox, bucket_levels=1,
        spill_directory=spill,
    )
    ref = str(tmp_path / "ref")
    build_octree_streaming(ref, 0.01, batch, bounding_box=bbox, bucket_levels=1)
    _assert_same_output(ref, out2)


def _byte_compare_dirs(a, b):
    from tests.conftest import assert_dirs_byte_equal

    assert_dirs_byte_equal(a, b, context="streaming device vs host")


def _one_point_leaf_batch():
    """>100k points fused at one spot force splitting to the depth cap;
    lone outliers separate into their own child at some level -> 1-point
    leaves whose sole point is LOD-promoted away (stride-8 takes index 0),
    leaving EMPTY nodes that meta must still record (num_points=0) — the
    reference's subsample behaves the same (generation.rs:195-253)."""
    import numpy as np

    from point_cloud_viewer_tpu.core.points_batch import PointsBatch

    rng = np.random.default_rng(99)
    n_dense = 100_003
    dense = np.full((n_dense, 3), 1.5) + rng.random((n_dense, 3)) * 1e-4
    # All outliers INSIDE the dense blob's level-1 bucket ([1,9)^3 once the
    # anchor stretches the root cube to edge 16), so one bucket derivation
    # carries several sole-occupant leaves; the anchor is its own
    # 1-point bucket.
    outliers = np.array([
        [3.0, 2.0, 1.5],
        [2.0, 5.0, 1.5],
        [6.0, 3.0, 2.0],
        [1.5, 6.0, 7.0],
        [17.0, 17.0, 17.0],  # anchor
    ])
    position = np.concatenate([dense, outliers])
    n = len(position)
    return PointsBatch(
        position=position,
        attributes={"color": rng.integers(0, 256, (n, 3), dtype=np.uint8)},
    )


def test_streaming_device_grouped_exchange_one_point_leaves(tmp_path):
    """The grouped device exchange (r5: order2 + level counts + extras,
    ~4 B/pt) must reproduce the host build byte-for-byte INCLUDING empty
    nodes from promoted-away 1-point leaves — the one tree fact the
    extras records exist for."""
    import os

    from point_cloud_viewer_tpu.octree.octree import Octree
    from point_cloud_viewer_tpu.octree.streaming import build_octree_streaming

    batch = _one_point_leaf_batch()
    host_dir, dev_dir = str(tmp_path / "host"), str(tmp_path / "dev")
    build_octree_streaming(host_dir, 0.01, batch, bucket_levels=1)
    phases = {}
    build_octree_streaming(dev_dir, 0.01, batch, bucket_levels=1,
                           use_device=True, phase_times=phases)
    _byte_compare_dirs(host_dir, dev_dir)
    # The scenario really produced zero-point meta nodes (the extras path).
    octree = Octree.from_directory(dev_dir)
    assert (octree.num_points == 0).sum() >= 1
    # And the exchange really was the grouped one (~4 B/pt, not 6).
    n = len(batch)
    assert 0 < phases.get("bucket_fetch_bytes", 0) < 5.5 * n


def test_streaming_device_extras_overflow_falls_back(tmp_path, monkeypatch):
    """With extras_cap forced to 1, the 3 sole-occupant leaves overflow the
    compact records; the finish path must fetch the classic (order, final,
    leaf) arrays and still be byte-identical."""
    import functools

    from point_cloud_viewer_tpu.octree.streaming import build_octree_streaming
    from point_cloud_viewer_tpu.ops import tree_build

    batch = _one_point_leaf_batch()
    host_dir, dev_dir = str(tmp_path / "host"), str(tmp_path / "dev")
    build_octree_streaming(host_dir, 0.01, batch, bucket_levels=1)

    orig = tree_build.tree_codes_grouped_on_device_padded
    monkeypatch.setattr(
        tree_build, "tree_codes_grouped_on_device_padded",
        functools.partial(orig, extras_cap=1),
    )
    phases = {}
    build_octree_streaming(dev_dir, 0.01, batch, bucket_levels=1,
                           use_device=True, phase_times=phases)
    _byte_compare_dirs(host_dir, dev_dir)
    # Fallback fetched the 6 B/pt arrays on top of order2.
    assert phases.get("bucket_fetch_bytes", 0) > 6 * len(batch)


def test_streaming_spill_no_native_fallback_byte_identical(tmp_path, monkeypatch):
    """The spill's bucket grouping falls back to np.argsort(kind='stable')
    when the native counting scatter is unavailable — output must stay
    byte-identical to the in-core build (and therefore to the native
    grouping path, which the other tests pin)."""
    from point_cloud_viewer_tpu import native

    monkeypatch.setattr(native, "counting_argsort", lambda ids, counts: None)
    rng = np.random.default_rng(23)
    n = 120_000
    batch = PointsBatch(
        position=rng.random((n, 3)) * 50.0,
        attributes={"color": rng.integers(0, 255, (n, 3), dtype=np.uint8)},
    )
    _compare(tmp_path, batch, 0.01)

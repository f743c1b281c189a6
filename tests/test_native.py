"""Native C++ kernel tests: build, parity with the numpy implementations."""

import numpy as np
import pytest

from point_cloud_viewer_tpu import native
from point_cloud_viewer_tpu.ops import codec, morton


@pytest.fixture(scope="module")
def nat():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return native


def test_native_morton_matches_numpy(nat):
    rng = np.random.default_rng(0)
    cells = rng.integers(0, 2**21, (50_000, 3)).astype(np.uint32)
    got = nat.morton_encode(cells)
    np.testing.assert_array_equal(got, morton.morton_encode(cells))


def test_native_radix_argsort_matches_numpy(nat):
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, 100_000, dtype=np.int64).astype(np.uint64)
    # Insert duplicates to exercise stability.
    keys[::17] = keys[0]
    sorted_keys, perm = nat.radix_argsort_u64(keys)
    expected_perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, expected_perm)
    np.testing.assert_array_equal(sorted_keys, keys[expected_perm])


def test_native_radix_argsort_multithreaded(nat, monkeypatch):
    """Force the multithreaded path (this host has 1 core, so without the
    override it never runs): per-pass recounted histograms must still give a
    stable, correct sort for multi-pass keys, including duplicate-heavy and
    constant-digit (shared-prefix) inputs."""
    monkeypatch.setenv("PCV_NATIVE_THREADS", "4")
    rng = np.random.default_rng(7)
    cases = [
        # 51-bit Morton-like keys, n not divisible by the thread count.
        rng.integers(0, 2**51, 100_003, dtype=np.int64).astype(np.uint64),
        # Shared high prefix (constant top digits -> skipped passes).
        (np.uint64(0x3F) << np.uint64(45))
        | rng.integers(0, 2**20, 64_001, dtype=np.int64).astype(np.uint64),
        # Tiny input (n < threads).
        rng.integers(0, 2**51, 3, dtype=np.int64).astype(np.uint64),
    ]
    cases[0][::13] = cases[0][1]  # duplicates exercise stability
    for keys in cases:
        sorted_keys, perm = nat.radix_argsort_u64(keys)
        expected_perm = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(perm, expected_perm)
        np.testing.assert_array_equal(sorted_keys, keys[expected_perm])


@pytest.mark.parametrize("dtype,enc", [(np.uint8, codec.PositionEncoding.UINT8),
                                       (np.uint16, codec.PositionEncoding.UINT16)])
def test_native_codec_matches_numpy(nat, dtype, enc):
    rng = np.random.default_rng(2)
    n = 10_000
    cube_min = rng.random((n, 3)) * 5
    edge = rng.random(n) + 0.5
    pos = cube_min + rng.random((n, 3)) * edge[:, None]
    got = nat.encode_positions(pos, cube_min, edge, dtype)
    expected = codec.encode_positions(pos, cube_min, edge, enc)
    np.testing.assert_array_equal(got, expected)

    dec = nat.decode_positions(got, cube_min, edge)
    expected_dec = codec.decode_positions(got, cube_min, edge, enc)
    np.testing.assert_allclose(dec, expected_dec, rtol=0, atol=1e-12)


def test_native_zero_edge(nat):
    pos = np.array([[1.0, 2.0, 3.0]])
    out = nat.encode_positions(pos, np.zeros((1, 3)), np.zeros(1), np.uint16)
    np.testing.assert_array_equal(out, [[0, 0, 0]])


def _numpy_quantize_encode(pos, root_min, edge, depth):
    scale = float(1 << depth)
    t = (pos - root_min) / edge
    cells = np.clip(np.floor(t * scale), 0, scale - 1).astype(np.uint32)
    hi = morton._spread3_u64
    codes = (hi(cells[:, 0]) << np.uint64(2)) | (hi(cells[:, 1]) << np.uint64(1)) | hi(cells[:, 2])
    return codes, cells


def test_native_quantize_morton_matches_numpy(nat):
    rng = np.random.default_rng(3)
    n = 50_000
    root_min = np.array([-3.0, 1.5, 7.25])
    edge = 123.456
    pos = root_min + rng.random((n, 3)) * edge
    # include points exactly on the min and max faces
    pos[0] = root_min
    pos[1] = root_min + edge
    pos[2] = root_min - 1.0   # below min -> clipped to cell 0
    pos[3] = root_min + edge * 2  # above max -> clipped to last cell
    for depth in (1, 10, 21):
        got_codes, got_cells = nat.quantize_morton(pos, root_min, edge, depth, want_cells=True)
        exp_codes, exp_cells = _numpy_quantize_encode(pos, root_min, edge, depth)
        np.testing.assert_array_equal(got_cells, exp_cells)
        np.testing.assert_array_equal(got_codes, exp_codes)


def test_quantize_and_encode_wrapper_matches_split_path():
    rng = np.random.default_rng(4)
    pos = rng.random((150_000, 3)) * 40.0  # above native threshold
    codes, cells = morton.quantize_and_encode(pos, np.zeros(3), 40.0, 15, want_cells=True)
    exp_cells = morton.quantize(pos, np.zeros(3), 40.0, 15)
    np.testing.assert_array_equal(cells, exp_cells)
    np.testing.assert_array_equal(codes, morton.morton_encode(exp_cells))
    sorted_codes, order = morton.argsort_codes(codes)
    exp_order = np.argsort(codes, kind="stable")
    np.testing.assert_array_equal(order, exp_order)
    np.testing.assert_array_equal(sorted_codes, codes[exp_order])


@pytest.mark.parametrize("dtype,enc", [
    (np.uint8, codec.PositionEncoding.UINT8),
    (np.uint16, codec.PositionEncoding.UINT16),
    (np.float32, codec.PositionEncoding.FLOAT32),
    (np.float64, codec.PositionEncoding.FLOAT64),
])
def test_native_gather_encode_matches_numpy(nat, dtype, enc):
    rng = np.random.default_rng(5)
    n, k = 9_000, 7
    pos = rng.random((n, 3)) * 100.0
    idx = rng.permutation(n).astype(np.int64)[: n - 13]
    bounds = np.sort(rng.choice(len(idx) - 1, k - 1, replace=False) + 1)
    offsets = np.concatenate([[0], bounds, [len(idx)]]).astype(np.int64)
    node_min = rng.random((k, 3)) * 50.0
    node_edge = rng.random(k) * 60.0 + 1.0
    # Degenerate (zero-edge) node: in the builder this only happens when
    # every point of the node coincides with its min — encode must give 0.
    node_edge[2] = 0.0
    pos[idx[offsets[2] : offsets[3]]] = node_min[2]
    got = nat.gather_encode(pos, idx, node_min, node_edge, offsets, dtype)
    counts = np.diff(offsets)
    pt_min = np.repeat(node_min, counts, axis=0)
    pt_edge = np.repeat(node_edge, counts)
    expected = codec.encode_positions(pos[idx], pt_min, pt_edge, enc)
    np.testing.assert_array_equal(got, expected)


def test_native_tree_levels_matches_numpy_pipeline(nat):
    """The native per-point kernel must reproduce the numpy top-down
    discover + bottom-up subsample pipeline node-for-node, point-for-point."""
    from point_cloud_viewer_tpu.core.constants import MAX_POINTS_PER_NODE
    from point_cloud_viewer_tpu.octree import builder as B

    rng = np.random.default_rng(6)
    n = 300_000
    # Clustered points so some nodes exceed MAX_POINTS_PER_NODE and deep
    # splits + promotions happen.
    centers = rng.random((5, 3)) * 100.0
    pos = np.concatenate([
        centers[i] + rng.normal(0, 0.5, (n // 5, 3)) for i in range(5)
    ])
    root_edge = 120.0
    depth = 9
    codes, _ = morton.quantize_and_encode(pos, np.zeros(3), root_edge, depth)
    codes, _ = morton.argsort_codes(codes)

    leaf, final = nat.tree_levels(codes, depth, depth, MAX_POINTS_PER_NODE)
    got = B._group_device_levels(codes, final, leaf, depth)

    levels = B._discover_levels(codes, len(codes), depth, root_edge, root_edge / (1 << depth) / 2)
    expected = B._subsample_bottom_up(levels)

    assert set(got) == set(expected)
    for lvl in expected:
        np.testing.assert_array_equal(got[lvl].paths, expected[lvl].paths)
        np.testing.assert_array_equal(got[lvl].offsets, expected[lvl].offsets)
        np.testing.assert_array_equal(got[lvl].idx, expected[lvl].idx)


def test_take_rows_matches_fancy_index(nat):
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 1000, 500).astype(np.int64)
    for arr in (
        rng.integers(0, 256, (1000, 3), dtype=np.uint8),
        rng.random(1000).astype(np.float32),
        rng.random((1000, 3)),
        rng.integers(0, 2**62, 1000).astype(np.uint64),
    ):
        got = nat.take_rows(arr, idx)
        np.testing.assert_array_equal(got, arr[idx])


def test_counting_argsort_matches_stable_sort():
    """native.counting_argsort == np.argsort(kind='stable') for small-range
    keys (the spill bucket grouping), including empty groups, empty input,
    and a single repeated key."""
    import numpy as np

    from point_cloud_viewer_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    for n, hi in ((0, 8), (1, 1), (57, 3), (100_000, 512), (65_536, 4096)):
        ids = rng.integers(0, hi, n, dtype=np.int64)
        counts = np.bincount(ids, minlength=hi)
        got = native.counting_argsort(ids, counts)
        np.testing.assert_array_equal(got, np.argsort(ids, kind="stable"))
    ids = np.full(1000, 7, dtype=np.int64)
    got = native.counting_argsort(ids, np.bincount(ids, minlength=8))
    np.testing.assert_array_equal(got, np.arange(1000))

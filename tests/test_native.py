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

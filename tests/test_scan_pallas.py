"""Pallas single-pass scan kernel (ops/scan_pallas): bit-equality with the
lax scans in interpret mode on the CPU test mesh, and equality of the full
looped tree derivation when its scans route through the kernel.  The same
kernel compiles and is measured on real TPU (ROUND_NOTES sort/scan
verdicts); interpret mode uses small blocks to stay fast."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_viewer_tpu.ops import morton, tree_build
from point_cloud_viewer_tpu.ops.scan_pallas import scan_1d

_REFS = {
    "max": jax.lax.cummax,
    "min": jax.lax.cummin,
    "sum": jnp.cumsum,
}


@pytest.mark.parametrize("kind", ["max", "min", "sum"])
@pytest.mark.parametrize("n", [5, 1024, 1025, 5000])
@pytest.mark.parametrize("reverse", [False, True])
def test_scan_matches_lax(kind, n, reverse):
    rng = np.random.default_rng(n + len(kind))
    x = jnp.asarray(rng.integers(-(10**6), 10**6, n).astype(np.int32))
    got = scan_1d(x, kind, reverse=reverse, interpret=True, rows=8)
    ref = _REFS[kind]
    want = ref(x[::-1])[::-1] if reverse else ref(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_scan_carry_crosses_blocks():
    """A value early in block 0 must dominate a max scan through the last
    block (the SMEM carry, not just block-local scans)."""
    n = 8 * 128 * 3 + 17  # several blocks at rows=8, ragged tail
    x = np.zeros(n, dtype=np.int32)
    x[5] = 10**6
    got = scan_1d(jnp.asarray(x), "max", interpret=True, rows=8)
    assert np.asarray(got)[-1] == 10**6
    gotr = scan_1d(
        jnp.asarray(x), "max", reverse=True, interpret=True, rows=8
    )
    assert np.asarray(gotr)[0] == 10**6


def test_looped_derivation_with_pallas_scans(monkeypatch):
    """_assign_and_promote_looped must produce identical (leaf, final)
    levels whether its scans run through _blocked_scan or the Pallas
    kernel — the integration contract behind the TPU fast path."""
    rng = np.random.default_rng(77)
    depth = 8
    cells = rng.integers(0, 2**depth, (30_000, 3), dtype=np.uint32)
    cells[:3000] = cells[0]  # a dense hot cell forces deep splits
    hi, lo = morton.morton_encode_device(jnp.asarray(cells), depth)
    hi, lo = jax.lax.sort((hi, lo), num_keys=2)

    base_leaf, base_cur = tree_build._assign_and_promote_looped(
        hi, lo, depth, depth, 100, 0, 0
    )

    def pallas_scan(x, kind, reverse=False):
        return scan_1d(x, kind, reverse=reverse, interpret=True, rows=8)

    monkeypatch.setattr(tree_build, "_scan", pallas_scan)
    p_leaf, p_cur = tree_build._assign_and_promote_looped(
        hi, lo, depth, depth, 100, 0, 0
    )
    np.testing.assert_array_equal(np.asarray(base_leaf), np.asarray(p_leaf))
    np.testing.assert_array_equal(np.asarray(base_cur), np.asarray(p_cur))

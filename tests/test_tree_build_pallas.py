"""Pallas leaf-assignment kernel: equality with the lax formulation
(interpret mode — runs on the CPU test mesh; the same kernels compile and
agree on real TPU, see ops/tree_build_pallas.py's measured verdict)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_viewer_tpu.ops import morton, tree_build
from point_cloud_viewer_tpu.ops.tree_build_pallas import leaf_levels_pallas


def _lax_leaf(hi, lo, depth, max_split, t):
    starts_all = tree_build._starts_all_levels(hi, lo, depth, max_split)
    n = hi.shape[0]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, max_split), 0)
    seg_start = jax.lax.cummax(jnp.where(starts_all, iota_n, 0), axis=0)
    nb = jnp.where(starts_all, iota_n, n)
    nxt = jax.lax.cummin(nb[::-1], axis=0)[::-1]
    seg_end = jnp.concatenate(
        [nxt[1:], jnp.full((1, max_split), n, dtype=nxt.dtype)], axis=0
    )
    counts = seg_end - seg_start
    small = counts <= t
    return jnp.where(
        jnp.any(small, axis=1), jnp.argmax(small, axis=1).astype(jnp.int32) + 1,
        max_split,
    )


@pytest.mark.parametrize("n,depth,t,kind", [
    (5000, 9, 100, "random"),
    (3000, 9, 10, "dups"),
    (2048, 5, 7, "exact-tile"),
    (100, 3, 2, "tiny"),
    (20_000, 12, 50, "multi-chunk"),  # crosses chunk carries (see below)
])
def test_pallas_leaf_matches_lax(n, depth, t, kind, monkeypatch):
    if kind == "multi-chunk":
        # Shrink the per-call chunk so the cross-chunk carry handoff is
        # exercised without interpreting millions of grid steps.
        from point_cloud_viewer_tpu.ops import tree_build_pallas as tbp

        monkeypatch.setattr(tbp, "_CHUNK", 8192)
    rng = np.random.default_rng(0)
    if kind == "dups":
        cells = rng.integers(0, 4, (n, 3)).astype(np.uint32)
    else:
        cells = rng.integers(0, 2 ** depth, (n, 3)).astype(np.uint32)
    codes = np.sort(morton.morton_encode(cells))
    hi, lo = morton.split_u64(codes)
    hi_j, lo_j = jnp.asarray(hi), jnp.asarray(lo)
    expect = np.asarray(_lax_leaf(hi_j, lo_j, depth, depth, t))
    got = np.asarray(
        leaf_levels_pallas(hi_j, lo_j, depth, depth, t, interpret=True)
    )
    np.testing.assert_array_equal(got, expect)

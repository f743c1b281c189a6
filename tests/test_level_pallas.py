"""Fused per-level Pallas kernels (ops/level_pallas): the fused
assign+promote must be bit-identical to the scan-composed looped
formulation, including the subtree (root_level/stop_level) semantics the
sharded and out-of-core builders rely on.  Interpret mode with small
blocks on the CPU mesh; the same kernels are compiled, verified and
measured on real TPU (ROUND_NOTES: 1.7-2.7x over the looped path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_viewer_tpu.ops import morton, tree_build as tb
from point_cloud_viewer_tpu.ops import level_pallas as LP


@pytest.fixture(autouse=True)
def _small_blocks(monkeypatch):
    monkeypatch.setattr(LP, "ROWS", 8)
    monkeypatch.setattr(LP, "_BLOCK", 8 * LP.LANES)


def _sorted_codes(n, depth, seed, dense_frac=0.1):
    rng = np.random.default_rng(seed)
    cells = rng.integers(0, 2**depth, (n, 3), dtype=np.uint32)
    cells[: int(n * dense_frac)] = cells[0]  # a hot cell forces deep splits
    hi, lo = morton.morton_encode_device(jnp.asarray(cells), depth)
    return jax.lax.sort((hi, lo), num_keys=2)


@pytest.mark.parametrize("root,stop", [(0, 0), (2, 2), (0, 3)])
def test_fused_matches_looped(root, stop):
    hi, lo = _sorted_codes(30_000, 8, seed=5)
    a_leaf, a_cur = tb._assign_and_promote_looped(hi, lo, 8, 8, 100, root, stop)
    f_leaf, f_cur = tb._assign_and_promote_fused(
        hi, lo, 8, 8, 100, root, stop, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a_leaf), np.asarray(f_leaf))
    np.testing.assert_array_equal(np.asarray(a_cur), np.asarray(f_cur))


def test_fused_inside_shard_map_matches_lax():
    """The correctness net for enabling the fused path on real multi-chip
    hardware (ops/tree_build.py gates it OFF inside shard_map today): run
    the fused kernels INSIDE shard_map on the 8-virtual-CPU mesh, per shard
    on its owned prefix-aligned subtree — exactly the distributed builder's
    call (parallel/sharded_build.py::make_sharded_tree_step) — and assert
    bit-identity with the pure-lax formulation the gate currently selects."""
    from jax.sharding import PartitionSpec as P
    from tests.conftest import cpu_mesh

    n_shards, per_shard, depth = 8, 4096, 7
    b_levels = 1  # each shard owns exactly one level-1 cell
    rng = np.random.default_rng(11)
    his, los = [], []
    for s in range(n_shards):
        # Codes whose top octant == shard id; a hot cell forces deep splits.
        cells = rng.integers(0, 2 ** (depth - 1), (per_shard, 3), dtype=np.uint32)
        cells[: per_shard // 8] = cells[0]
        cells += np.array(
            [(s >> 2) & 1, (s >> 1) & 1, s & 1], dtype=np.uint32
        ) << (depth - 1)
        hi, lo = morton.morton_encode_device(jnp.asarray(cells), depth)
        hi, lo = jax.lax.sort((hi, lo), num_keys=2)
        his.append(np.asarray(hi))
        los.append(np.asarray(lo))
    hi_g = jnp.asarray(np.concatenate(his))
    lo_g = jnp.asarray(np.concatenate(los))

    mesh = cpu_mesh(n_shards)

    def make(fn, **kw):
        return jax.jit(
            jax.shard_map(
                fn, mesh=mesh, in_specs=(P("shard"), P("shard")),
                out_specs=(P("shard"), P("shard")), **kw,
            )
        )

    # check_vma=False only for the INTERPRET run: the HLO interpreter
    # inlines the discharged kernel jaxpr into the shard_map trace, where
    # kernel-internal scalar/block mixes trip the vma checker.  The
    # compiled path keeps kernel internals opaque (pallas_call's
    # out_shapes carry the operand vma — ops/level_pallas.out_struct), so
    # production enabling does not need this.
    fused = make(
        lambda h, l: tb._assign_and_promote_fused(
            h, l, depth, depth, 100, b_levels, b_levels, interpret=True
        ),
        check_vma=False,
    )
    lax_twin = make(
        lambda h, l: tb._assign_and_promote_looped(
            h, l, depth, depth, 100, b_levels, b_levels
        )
    )
    f_leaf, f_cur = fused(hi_g, lo_g)
    a_leaf, a_cur = lax_twin(hi_g, lo_g)
    np.testing.assert_array_equal(np.asarray(a_leaf), np.asarray(f_leaf))
    np.testing.assert_array_equal(np.asarray(a_cur), np.asarray(f_cur))


def test_fused_ragged_and_single_segment():
    """Sizes straddling block boundaries, plus the all-one-cell cloud
    (a single segment spanning every block at every level)."""
    for n in [LP._BLOCK - 1, LP._BLOCK, LP._BLOCK + 1, 3 * LP._BLOCK + 17]:
        hi, lo = _sorted_codes(n, 6, seed=n)
        a = tb._assign_and_promote_looped(hi, lo, 6, 6, 50, 0, 0)
        f = tb._assign_and_promote_fused(hi, lo, 6, 6, 50, 0, 0, interpret=True)
        for x, y in zip(a, f):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    one = jnp.zeros(2 * LP._BLOCK + 5, dtype=jnp.uint32)
    a = tb._assign_and_promote_looped(one, one, 6, 6, 50, 0, 0)
    f = tb._assign_and_promote_fused(one, one, 6, 6, 50, 0, 0, interpret=True)
    for x, y in zip(a, f):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

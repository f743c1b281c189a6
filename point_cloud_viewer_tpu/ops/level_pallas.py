"""Pallas TPU kernels: fused per-level passes of the tree derivation.

The looped builder core (tree_build._assign_and_promote_looped) spends a
level iteration on several materialized (N,) i32 arrays: the scan inputs,
both scan outputs, seg_end, and the leaf/found updates.  These kernels
fuse each level's work into sweeps that read the u8 boundary-level array
and update u8 state in place:

* seg_start_pass  (fwd): b u8 -> seg_start i32 (the only i32 intermediate)
* leaf_update_pass (rev): b, seg_start, leaf u8, found u8 -> leaf, found
  (computes the EXCLUSIVE suffix-min of boundary positions — seg_end —
  on the fly, then count = seg_end - seg_start and the first-small-level
  update; leaf/found are aliased in place)
* promote_pass    (fwd): b, cur u8 -> cur (segmented rank via a chained
  cumsum + running-base carry; every 8th active point of each segment
  moves to the parent)

I/O per level: 5 B/elem (fwd) + 7 B/elem (rev) + 3 B/elem (promo)
vs ~40+ B/elem for the unfused formulation.  All quantities are exact
integer ops, so outputs are bit-identical to the unfused path (asserted
by tests in interpret mode and by an on-TPU core comparison).

Level arrives as an SMEM (1, 1) scalar so one compiled kernel serves
every level of the fori_loop.  Block scans reuse the roll-based helpers
from scan_pallas; grids execute sequentially per core, which is what
makes the running carries correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_pallas import LANES, _scan_block_fwd, _scan_block_rev, out_struct

ROWS = 1024  # (1024, 128) u8/i32 blocks; smaller than scan_1d's because
# these kernels hold several live block-sized temporaries at once.
_BLOCK = ROWS * LANES


def _gidx(i: jnp.ndarray) -> jnp.ndarray:
    """Global flat index of each element of block i, (ROWS, LANES) i32."""
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    return i * _BLOCK + row * LANES + lane


def _seg_start_kernel(lvl_ref, b_ref, out_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = jnp.int32(0)

    level = lvl_ref[0, 0]
    starts = b_ref[:].astype(jnp.int32) <= level
    val = jnp.where(starts, _gidx(i), 0)
    blk = _scan_block_fwd(val, "max")
    carry = carry_ref[0]
    out_ref[:] = jnp.maximum(blk, carry)
    carry_ref[0] = jnp.maximum(carry, blk[ROWS - 1, LANES - 1])


def _leaf_update_kernel(lvl_ref, thr_ref, n_ref, b_ref, seg_start_ref,
                        leaf_in_ref, found_in_ref, leaf_ref, found_ref,
                        carry_ref):
    i = pl.program_id(0)
    n = n_ref[0, 0]

    @pl.when(i == 0)
    def _():
        carry_ref[0] = n  # no boundary after the last element

    level = lvl_ref[0, 0]
    starts = b_ref[:].astype(jnp.int32) <= level
    nb = jnp.where(starts, _gidx(pl.num_programs(0) - 1 - i), n)
    # seg_end[j] = first boundary STRICTLY after j = exclusive suffix-min:
    # the inclusive suffix-min of the elements after j within the block,
    # folded with the carry from later blocks.
    incl = _scan_block_rev(nb, "min")
    # exclusive = inclusive at position j+1 in row-major order:
    # lanes shift left by one (roll c-1 is a left-rotate), lane c-1 takes
    # the NEXT row's lane 0, and the block's last element takes the carry.
    r, c = incl.shape
    lane_next = pltpu.roll(incl, c - 1, axis=1)  # lane k <- lane k+1 (wraps)
    row_below = pltpu.roll(incl[:, 0:1], r - 1, axis=0)  # row j <- row j+1
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    excl = jnp.where(lane < c - 1, lane_next, row_below)
    carry = carry_ref[0]
    last = (row == r - 1) & (lane == c - 1)
    excl = jnp.where(last, carry, excl)
    seg_end = jnp.minimum(excl, carry)

    count = seg_end - seg_start_ref[:]
    small = count <= thr_ref[0, 0]
    found = found_in_ref[:] != 0
    leaf = leaf_in_ref[:]
    leaf_ref[:] = jnp.where(
        (~found) & small, level.astype(jnp.uint8), leaf
    )
    found_ref[:] = (found | small).astype(jnp.uint8)
    carry_ref[0] = jnp.minimum(carry, incl[0, 0])


def _promote_kernel(lvl_ref, b_ref, cur_in_ref, cur_ref, sum_carry_ref,
                    base_carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_carry_ref[0] = jnp.int32(0)
        base_carry_ref[0] = jnp.int32(0)

    level = lvl_ref[0, 0]
    cur = cur_in_ref[:]
    active = (cur.astype(jnp.int32) == level).astype(jnp.int32)
    starts = b_ref[:].astype(jnp.int32) <= level
    c_blk = _scan_block_fwd(active, "sum")
    c = c_blk + sum_carry_ref[0]
    base_val = jnp.where(starts, c - active, 0)
    base_blk = _scan_block_fwd(base_val, "max")
    base = jnp.maximum(base_blk, base_carry_ref[0])
    rank = c - active - base
    promote = (active == 1) & ((rank & 7) == 0)
    cur_ref[:] = jnp.where(promote, (level - 1).astype(jnp.uint8), cur)
    sum_carry_ref[0] = c[ROWS - 1, LANES - 1]
    base_carry_ref[0] = base[ROWS - 1, LANES - 1]


def _smem_i32(v):
    return jnp.asarray(v, dtype=jnp.int32).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def seg_start_pass(b_pad, level, interpret: bool = False):
    """b (M*,) u8 padded to a block multiple -> seg_start (M*,) i32."""
    m = b_pad.shape[0] // LANES
    grid = m // ROWS
    ix = lambda i, *_: (i, 0)  # noqa: E731
    return pl.pallas_call(
        _seg_start_kernel,
        out_shape=out_struct((m, LANES), jnp.int32, b_pad),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, LANES), ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), ix, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(_smem_i32(level), b_pad.reshape(m, LANES)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def leaf_update_pass(b_pad, seg_start, leaf, found, level, threshold, n,
                     interpret: bool = False):
    """Reverse sweep: -> (leaf, found) updated in place (u8 arrays)."""
    m = b_pad.shape[0] // LANES
    grid = m // ROWS
    rev = lambda i, *_: (grid - 1 - i, 0)  # noqa: E731
    leaf2, found2 = pl.pallas_call(
        _leaf_update_kernel,
        out_shape=(
            out_struct((m, LANES), jnp.uint8, leaf),
            out_struct((m, LANES), jnp.uint8, found),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROWS, LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), rev, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(
        _smem_i32(level), _smem_i32(threshold), _smem_i32(n),
        b_pad.reshape(m, LANES), seg_start.reshape(m, LANES),
        leaf.reshape(m, LANES), found.reshape(m, LANES),
    )
    return leaf2.reshape(-1), found2.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def promote_pass(b_pad, cur, level, interpret: bool = False):
    """Forward sweep: -> cur updated in place (u8)."""
    m = b_pad.shape[0] // LANES
    grid = m // ROWS
    ix = lambda i, *_: (i, 0)  # noqa: E731
    out = pl.pallas_call(
        _promote_kernel,
        out_shape=out_struct((m, LANES), jnp.uint8, cur),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, LANES), ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), ix, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(_smem_i32(level), b_pad.reshape(m, LANES), cur.reshape(m, LANES))
    return out.reshape(-1)

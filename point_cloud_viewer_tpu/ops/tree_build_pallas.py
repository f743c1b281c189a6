"""Pallas TPU kernels for the builder's leaf-assignment stage.

The lax implementation (ops/tree_build._assign_and_promote) derives
per-level segment bounds with jax.lax.cummax/cummin over an (N, L) tensor:
XLA lowers each to a log-depth scan (~2*log2(N) full passes over ~1 GB at
16M points).  TPU Pallas grids execute SEQUENTIALLY, so a running carry in
scratch turns each direction into ONE pass:

* forward kernel: per level, the most recent segment-boundary index at or
  before each point (carry = per-level running max across tiles),
* backward kernel: consumes the forward result with REVERSED block index
  maps (no materialized flip), computes the next boundary strictly after
  each point, segment counts, and the leaf level directly:
  leaf = first level whose segment holds <= max_points points.

Boundary definition matches tree_build._starts_all_levels: the level-l
prefix of code i differs from code i-1 (row 0 is a boundary at every
level).  Level l occupies lane l-1; lanes are padded to L_PAD.

MEASURED VERDICT (TPU v5e, 16M-scale inputs at 8M where the remote
compile helper accepts the buffers): 136 ms vs the lax formulation's
112 ms — the (TILE, 32)/(TILE, 1) blocks use at most a quarter of the
128-lane VPU, which costs more than the single-pass scan saves.  The lax
path therefore stays the builder default ON DATA, and this module remains
the tested, bit-identical alternative (a lane-transposed layout is the
known next step if the leaf stage ever dominates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L_PAD = 32  # lane padding; max_split_level <= 21 always fits
TILE = 2048
_CHUNK = 4_194_304  # rows per pallas_call (compile-helper friendly)

_BIG = np.int32(2**30)


def _starts_block(xh, xl, hi_shift, lo_shift, use_hi, valid, iota):
    """(T, L_PAD) bool: does the level-(l+1) prefix change at each row?

    xh/xl: (T, 1) u32 xor with the previous code; the per-lane shift
    parameters arrive pre-split as u32 arrays (hi_shift/lo_shift in
    [0, 31], use_hi/valid in {0, 1}) so every select is ARITHMETIC —
    Mosaic rejects broadcasting (1, L) boolean masks against (T, L)
    vectors ("unsupported target bitwidth for truncation")."""
    hi_part = xh >> hi_shift  # (T, L)
    lo_part = xh | (xl >> lo_shift)  # nonzero iff prefix differs, shift<32
    one = jnp.uint32(1)
    v = (use_hi * hi_part + (one - use_hi) * lo_part) * valid
    # Row 0 is a boundary at every level (incl. padding lanes — harmless,
    # their segment spans everything so counts stay > threshold).
    first_row = jnp.where(iota == 0, one, jnp.uint32(0))  # (T, 1)
    return (v | first_row) != 0


def _tile_scan_max(v):
    """Inclusive running max along axis 0 of (T, L) via log2(T) shifts."""
    t = v.shape[0]
    step = 1
    while step < t:
        shifted = jnp.pad(v, ((step, 0), (0, 0)), constant_values=-_BIG)[:-step]
        v = jnp.maximum(v, shifted)
        step *= 2
    return v


def _tile_suffix_min(v):
    """Inclusive suffix min (over j >= i) along axis 0, shifting from below
    (Mosaic has no `rev`)."""
    t = v.shape[0]
    step = 1
    while step < t:
        shifted = jnp.pad(v, ((0, step), (0, 0)), constant_values=_BIG)[step:]
        v = jnp.minimum(v, shifted)
        step *= 2
    return v


def _fwd_kernel(hs_ref, ls_ref, uh_ref, vl_ref, base_ref, carry_in_ref,
                xh_ref, xl_ref, out_ref, carry_out_ref, carry_ref):
    k = pl.program_id(0)
    t = xh_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) + k * t + base_ref[0]

    @pl.when(k == 0)
    def _init():
        carry_ref[:] = carry_in_ref[:]

    starts = _starts_block(xh_ref[:], xl_ref[:], hs_ref[:], ls_ref[:],
                           uh_ref[:], vl_ref[:], iota)
    v = jnp.where(starts, iota, -_BIG)
    v = _tile_scan_max(v)
    v = jnp.maximum(v, carry_ref[:])
    out_ref[:] = v
    carry_ref[:] = v[-1:, :]
    carry_out_ref[:] = v[-1:, :]


def _bwd_kernel(hs_ref, ls_ref, uh_ref, vl_ref, meta_ref, carry_in_ref,
                xh_ref, xl_ref, segstart_ref, leaf_ref, carry_out_ref,
                carry_ref):
    """Reverse pass over reversed blocks: next boundary strictly after each
    point, then counts + leaf level.  meta_ref (SMEM): [n, max_points,
    max_split_level, base_row]."""
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    t = xh_ref.shape[0]
    n = meta_ref[0]
    max_points = meta_ref[1]
    levels_n = meta_ref[2]
    # This block holds rows [(nk-1-k)*t, ...) of this CHUNK of the arrays.
    row0 = (nk - 1 - k) * t + meta_ref[3]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) + row0

    @pl.when(k == 0)
    def _init():
        carry_ref[:] = carry_in_ref[:]

    starts = _starts_block(xh_ref[:], xl_ref[:], hs_ref[:], ls_ref[:],
                           uh_ref[:], vl_ref[:], iota)
    b = jnp.where(starts, iota, _BIG)
    below = carry_ref[:]  # inclusive min over ALL rows below this tile
    within = _tile_suffix_min(b)  # min over j >= i within the tile
    nxt_incl = jnp.minimum(within, below)
    carry_ref[:] = nxt_incl[:1, :]
    # Strictly after i: inclusive-from-(i+1); the tile's last row sees the
    # below-blocks carry.
    nxt = jnp.concatenate([nxt_incl[1:], below], axis=0)
    seg_end = jnp.where(nxt >= _BIG, n, nxt)
    counts = seg_end - segstart_ref[:]
    small = counts <= max_points
    lane = jax.lax.broadcasted_iota(jnp.int32, small.shape, 1)
    first = jnp.min(jnp.where(small, lane + 1, _BIG), axis=1, keepdims=True)
    leaf_ref[:] = jnp.where(first >= _BIG, levels_n, first)
    carry_out_ref[:] = nxt_incl[:1, :]


@functools.partial(
    jax.jit,
    static_argnames=("depth", "max_split_level", "max_points", "interpret"),
)
def leaf_levels_pallas(hi, lo, depth, max_split_level, max_points,
                       interpret=False):
    """Per-point leaf level over SORTED (hi, lo) codes — the Pallas twin of
    the leaf stage in tree_build._assign_and_promote (identical results;
    tests assert equality).  N must not be astronomically larger than
    TILE*2^30 (indices are i32)."""
    n = hi.shape[0]
    n_pad = -(-max(n, 1) // TILE) * TILE
    pad = n_pad - n

    # xor with the previous code (row 0 handled as a boundary in-kernel).
    prev_hi = jnp.concatenate([hi[:1], hi[:-1]])
    prev_lo = jnp.concatenate([lo[:1], lo[:-1]])
    xh = (hi ^ prev_hi)[:, None]
    xl = (lo ^ prev_lo)[:, None]
    if pad:
        # Padding rows are their own segments (boundary everywhere) so they
        # never extend a real segment: xor all-ones.
        ones = jnp.full((pad, 1), 0xFFFFFFFF, dtype=jnp.uint32)
        xh = jnp.concatenate([xh, ones])
        xl = jnp.concatenate([xl, ones])

    levels = np.arange(1, L_PAD + 1)
    shifts = 3 * (depth - levels)
    valid_np = (levels <= max_split_level) & (shifts >= 0)
    use_hi_np = valid_np & (shifts >= 32)
    hs = jnp.asarray(
        np.where(use_hi_np, shifts - 32, 0).astype(np.uint32)[None, :]
    )
    ls = jnp.asarray(
        np.where(valid_np & ~use_hi_np, shifts, 0).astype(np.uint32)[None, :]
    )
    uh = jnp.asarray(use_hi_np.astype(np.uint32)[None, :])
    vl = jnp.asarray(valid_np.astype(np.uint32)[None, :])

    # Chunked invocation: each pallas_call covers <= _CHUNK rows so AOT
    # buffer assignments stay small (the remote compile helper on this
    # machine rejects ~1.5 GB intermediates); the per-level carries thread
    # between chunk calls as tiny (1, L_PAD) arrays.
    lane_params = (hs, ls, uh, vl)
    lane_spec = pl.BlockSpec((1, L_PAD), lambda k: (0, 0))
    carry_spec = pl.BlockSpec((1, L_PAD), lambda k: (0, 0))

    def chunk_bounds():
        out = []
        start = 0
        while start < n_pad:
            stop = min(start + _CHUNK, n_pad)
            out.append((start, stop))
            start = stop
        return out

    bounds = chunk_bounds()
    seg_chunks = []
    carry = jnp.full((1, L_PAD), -_BIG, dtype=jnp.int32)
    for start, stop in bounds:
        rows = stop - start
        grid = (rows // TILE,)
        base = jnp.asarray([start], dtype=jnp.int32)
        seg, carry = pl.pallas_call(
            _fwd_kernel,
            grid=grid,
            in_specs=[
                lane_spec, lane_spec, lane_spec, lane_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                carry_spec,
                pl.BlockSpec((TILE, 1), lambda k: (k, 0)),
                pl.BlockSpec((TILE, 1), lambda k: (k, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TILE, L_PAD), lambda k: (k, 0)),
                carry_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, L_PAD), jnp.int32),
                jax.ShapeDtypeStruct((1, L_PAD), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((1, L_PAD), jnp.int32)],
            interpret=interpret,
        )(*lane_params, base, carry, xh[start:stop], xl[start:stop])
        seg_chunks.append(seg)

    leaf_chunks = [None] * len(bounds)
    carry = jnp.full((1, L_PAD), _BIG, dtype=jnp.int32)
    for ci in range(len(bounds) - 1, -1, -1):
        start, stop = bounds[ci]
        rows = stop - start
        nk = rows // TILE
        grid = (nk,)
        meta = jnp.asarray(
            [n, max_points, max_split_level, start], dtype=jnp.int32
        )
        rev_spec = pl.BlockSpec((TILE, 1), lambda k, nk=nk: (nk - 1 - k, 0))
        rev_spec_l = pl.BlockSpec(
            (TILE, L_PAD), lambda k, nk=nk: (nk - 1 - k, 0)
        )
        leaf_c, carry = pl.pallas_call(
            _bwd_kernel,
            grid=grid,
            in_specs=[
                lane_spec, lane_spec, lane_spec, lane_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                carry_spec,
                rev_spec, rev_spec, rev_spec_l,
            ],
            out_specs=[rev_spec, carry_spec],
            out_shape=[
                jax.ShapeDtypeStruct((rows, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, L_PAD), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((1, L_PAD), jnp.int32)],
            interpret=interpret,
        )(*lane_params, meta, carry, xh[start:stop], xl[start:stop],
          seg_chunks[ci])
        leaf_chunks[ci] = leaf_c

    leaf = jnp.concatenate(leaf_chunks, axis=0)
    return leaf[:n, 0]

"""Pallas TPU kernel: single-pass 1D prefix scans (max / min / sum, i32).

The builder's device core runs ~4 full-array scans per level x 21 levels
(ops/tree_build).  TPU Pallas grids execute SEQUENTIALLY on a core, so a
scan is ONE pass over HBM: each grid step loads an (R, 128) block into
VMEM, scans it entirely on-chip (lane-axis log-shifts + row-axis
log-shifts + combine — all VPU, no HBM traffic), folds in a running carry
kept in SMEM scratch, and writes the result.

MEASURED (v5e, cummax, dispatch floor subtracted via 2-vs-22 iteration
loops): this kernel runs at a flat ~55-58 ns per M elements at every size
(16M 0.93 ms / 128M 7.02 ms — 138-146 GB/s effective for the 2-pass
traffic; the lane rolls keep it VPU-bound short of the 341 GB/s
bandwidth probe).  XLA's blocked-scan lowering
(tree_build._blocked_scan) beats it below ~20M (16M: 0.70 ms) but hits a
layout cliff above (32M 3.07 / 64M 6.01 / 128M 12.23 ms), and the flat
lax.cummax lowering is 7x worse still (52.9 ms at 128M) — hence the
size-gated dispatch in tree_build._scan.  This is the full-lane layout
called out as the "known next step" in ops/tree_build_pallas.py's
measured verdict (that kernel's (TILE, 32) blocks used 1/4 of the VPU).

Reverse (suffix) scans process blocks in reverse grid order with
shift-from-below within the block — no materialized flip.

Exactness: max/min/sum over int32 are associative and exact, so any
block decomposition is bit-identical to the flat scan (tests compare
against jax.lax.cummax/cummin/cumsum in interpret mode on CPU; a
measured TPU run asserted fwd+rev bit-equality with lax at 16M for all
three ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 2048  # rows per block: (2048, 128) i32 = 1 MB in VMEM
_BLOCK = ROWS * LANES


def out_struct(shape, dtype, like):
    """ShapeDtypeStruct carrying the input's varying-manual-axes set so
    pallas_call works inside shard_map (check_vma requires outputs to
    declare how they vary across mesh axes)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)

_IDENT = {
    "max": -(2**31),
    "min": 2**31 - 1,
    "sum": 0,
}
_OPS = {
    "max": jnp.maximum,
    "min": jnp.minimum,
    "sum": jnp.add,
}


def _scan_block_fwd(v, kind):
    """Full inclusive scan of an (R, 128) block in row-major element
    order: lane-axis scan within each row, then fold row prefixes."""
    op = _OPS[kind]
    ident = jnp.int32(_IDENT[kind])
    r, c = v.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    step = 1
    while step < c:
        rolled = pltpu.roll(v, step, axis=1)
        v = op(v, jnp.where(lane >= step, rolled, ident))
        step *= 2
    # v[:, -1] now holds row totals; exclusive row-prefix via row shifts.
    row = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    tot = v[:, c - 1 : c]  # (R, 1) inclusive row totals
    pre = jnp.where(row >= 1, pltpu.roll(tot, 1, axis=0), ident)
    step = 1
    while step < r:
        rolled = pltpu.roll(pre, step, axis=0)
        pre = op(pre, jnp.where(row >= step + 1, rolled, ident))
        step *= 2
    return op(v, pre)


def _scan_block_rev(v, kind):
    """Suffix (right-to-left) scan of an (R, 128) block in row-major
    order, shifting from below/right — Mosaic has no reverse."""
    op = _OPS[kind]
    ident = jnp.int32(_IDENT[kind])
    r, c = v.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    step = 1
    while step < c:
        # roll is circular and rejects negative shifts: -step == c - step.
        rolled = pltpu.roll(v, c - step, axis=1)
        v = op(v, jnp.where(lane < c - step, rolled, ident))
        step *= 2
    row = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    tot = v[:, 0:1]  # (R, 1) inclusive row suffix totals
    pre = jnp.where(row < r - 1, pltpu.roll(tot, r - 1, axis=0), ident)
    step = 1
    while step < r:
        rolled = pltpu.roll(pre, r - step, axis=0)
        pre = op(pre, jnp.where(row < r - step - 1, rolled, ident))
        step *= 2
    return op(v, pre)


def _make_kernel(kind: str, reverse: bool, rows: int):
    op = _OPS[kind]

    def kernel(x_ref, o_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = jnp.int32(_IDENT[kind])

        blk = (
            _scan_block_rev(x_ref[:], kind)
            if reverse
            else _scan_block_fwd(x_ref[:], kind)
        )
        carry = carry_ref[0]
        o_ref[:] = op(blk, carry)
        total = blk[0, 0] if reverse else blk[rows - 1, LANES - 1]
        carry_ref[0] = op(carry, total)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("kind", "reverse", "interpret", "rows")
)
def _scan_padded(xp, kind: str, reverse: bool, interpret: bool, rows: int):
    m = xp.shape[0]  # multiple of `rows`
    grid = m // rows
    if reverse:
        index_map = lambda i: (grid - 1 - i, 0)  # noqa: E731
    else:
        index_map = lambda i: (i, 0)  # noqa: E731
    return pl.pallas_call(
        _make_kernel(kind, reverse, rows),
        out_shape=out_struct((m, LANES), jnp.int32, xp),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, LANES), index_map, memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rows, LANES), index_map, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(xp)


def scan_1d(
    x: jnp.ndarray, kind: str, reverse: bool = False,
    interpret: bool = False, rows: int = ROWS,
) -> jnp.ndarray:
    """Inclusive prefix (or suffix, `reverse`) scan of a 1D int32 array.
    Bit-identical to jax.lax.cummax/cummin/jnp.cumsum (+[::-1] twins).
    `rows`: block height — the default is the production size; tests use
    small blocks so interpret mode stays fast."""
    assert x.dtype == jnp.int32, x.dtype
    n = x.shape[0]
    ident = _IDENT[kind]
    pad = (-n) % (rows * LANES)
    # Identity padding after the data is neutral in both directions: a
    # prefix scan never reads past n, and a suffix scan folds identity
    # elements in before reaching real data.
    xp = jnp.pad(x, (0, pad), constant_values=ident)
    out = _scan_padded(
        xp.reshape(-1, LANES), kind, reverse, interpret, rows
    ).reshape(-1)
    return out[:n] if pad else out

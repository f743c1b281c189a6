"""Device-resident octree construction core.

Everything between raw positions and per-node file bytes, as one jitted XLA
program over fixed-shape arrays — no recursion, no host round-trips:

1. Morton encode + global sort (u32 key pairs).
2. Leaf assignment WITHOUT top-down recursion: along any root-to-leaf path
   cell counts are non-increasing, so a point's leaf is the FIRST level
   where its cell holds <= MAX_POINTS_PER_NODE points (the reference's
   should_split rule, src/octree/generation.rs:128-150, re-derived as a
   per-point property).  Per-level cell counts come from segmented scans
   over the sorted codes (cummax/cummin of boundary positions).
3. LOD promotion as D passes of segmented ranking: at each level, among
   points currently resident at that level, every 8th point of each node
   (rank % 8 == 0) moves to the parent — the reference's subsampling rule
   (generation.rs:224-229) — implemented with a segmented cumsum.
4. Node-local normalized coordinates for fixpoint encoding, derived from
   the grid cells (max extra error: half a leaf cell <= resolution/2).

The result: each point's final tree level + normalized in-node coordinates;
grouping into nodes is a host-side slice over the already-sorted order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import MAX_POINTS_PER_NODE
from . import morton


class DeviceTreeResult(NamedTuple):
    code_hi: jnp.ndarray  # (N,) sorted Morton code, bits 32..62
    code_lo: jnp.ndarray  # (N,) bits 0..31
    order: jnp.ndarray  # (N,) uint32 permutation: sorted -> original index
    final_level: jnp.ndarray  # (N,) int32 tree level each point ends up in
    leaf_level: jnp.ndarray  # (N,) int32 pre-promotion leaf level
    t_norm: jnp.ndarray  # (N, 3) f32 node-normalized coordinates in [0,1)


# XLA lowers a flat N-element scan as O(log2 N) shifted-select passes
# (~27 full-array passes at 128M).  A blocked two-phase scan — inner scan
# along a 256-wide minor axis (8 passes) + a tiny row-prefix scan +
# one combine — moves ~3x less data; measured 2.2x on cummax at 128M on
# the v5e (37.5 ms vs 81.2 ms).  Exact for max/min and integer sums.
_SCAN_BLOCK = 256


def _blocked_scan(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    n = x.shape[0]
    c = _SCAN_BLOCK
    if n < 4 * c:
        op = {"max": jax.lax.cummax, "min": jax.lax.cummin,
              "sum": jnp.cumsum}[kind]
        return op(x)
    if kind == "max":
        op, scan, ident = jnp.maximum, jax.lax.cummax, jnp.iinfo(x.dtype).min
    elif kind == "min":
        op, scan, ident = jnp.minimum, jax.lax.cummin, jnp.iinfo(x.dtype).max
    else:
        op, scan, ident = jnp.add, jnp.cumsum, 0
    pad = (-n) % c
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), ident, x.dtype)])
    m = x.reshape(-1, c)
    inner = scan(m, axis=1)
    row_pre = scan(inner[:, -1])
    row_excl = jnp.concatenate(
        [jnp.full((1,), ident, x.dtype), row_pre[:-1]]
    )
    out = op(inner, row_excl[:, None]).reshape(-1)
    return out[:n] if pad else out


# Scan implementation switch: "auto" resolves at trace time to the Pallas
# single-pass kernel (ops/scan_pallas) on TPU for large arrays, and to
# _blocked_scan elsewhere (small arrays, CPU test meshes, shard_map on
# virtual devices, any backend without Mosaic).  Results are bit-identical
# either way (i32 max/min/sum are exact and associative).  NOTE: with the
# fused level kernels taking n >= 4M on TPU, the >= 20M Pallas branch is
# reached only from the looped cross-check path and benchmarks — it stays
# because it is the measured fallback if the fused path is ever disabled.
#
# Measured per-scan (v5e, cummax, dispatch-floor subtracted via 2-vs-22
# iteration loops): pallas is flat at ~55-58 ns/M elems (16M 0.93 ms,
# 128M 7.02 ms); the blocked lowering matches it below ~20M (16M 0.70 ms)
# but hits an XLA cliff above (32M 3.07, 64M 6.01, 128M 12.23 ms — ~96
# ns/M).  Flat lax.cummax: 6.6/52.9 ms at 16/128M.  Hence the size gate.
_SCAN_IMPL = "auto"
_PALLAS_SCAN_MIN_N = 20_000_000


def _scan(x: jnp.ndarray, kind: str, reverse: bool = False) -> jnp.ndarray:
    impl = _SCAN_IMPL
    if impl == "auto":
        # Resolve from the default DEVICE, not the default backend: the
        # test harness keeps the TPU backend registered but pins
        # computation to a CPU mesh via jax_default_device.  Inside
        # shard_map (varying manual axes on the operand) stay on the
        # pure-lax formulation — proven under SPMD partitioning, while
        # Pallas-in-shard_map cannot be validated on this single-chip
        # machine.
        dev = jax.config.jax_default_device or jax.devices()[0]
        on_tpu = getattr(dev, "platform", None) == "tpu"
        in_shard_map = bool(getattr(jax.typeof(x), "vma", frozenset()))
        impl = (
            "pallas"
            if on_tpu and not in_shard_map
            and x.shape[0] >= _PALLAS_SCAN_MIN_N
            else "blocked"
        )
    if impl == "pallas" or impl == "pallas_interpret":
        from .scan_pallas import scan_1d

        return scan_1d(
            x, kind, reverse=reverse, interpret=impl == "pallas_interpret"
        )
    if reverse:
        return _blocked_scan(x[::-1], kind)[::-1]
    return _blocked_scan(x, kind)


def _segmented_rank(active: jnp.ndarray, seg_starts: jnp.ndarray) -> jnp.ndarray:
    """Rank of each active element among active elements of its segment."""
    c = _scan(active.astype(jnp.int32), "sum")
    # cumsum value just before the segment start
    base = _scan(
        jnp.where(seg_starts, c - active.astype(jnp.int32), 0), "max"
    )
    return c - active.astype(jnp.int32) - base


def _starts_all_levels(hi: jnp.ndarray, lo: jnp.ndarray, depth: int,
                       max_level: int, min_level: int = 1) -> jnp.ndarray:
    """(N, L) bool: does the level-l prefix change at each point, for
    l = min_level..max_level (one column per level)?
    One vectorized xor + per-column shifts instead of L separate passes."""
    n = hi.shape[0]
    x_hi = hi ^ jnp.concatenate([hi[:1] ^ jnp.uint32(1), hi[:-1]])
    x_lo = lo ^ jnp.concatenate([lo[:1] ^ jnp.uint32(1), lo[:-1]])
    levels = jnp.arange(min_level, max_level + 1)
    shifts = 3 * (depth - levels)  # (L,)
    sh = shifts[None, :].astype(jnp.uint32)
    hi_b = x_hi[:, None]
    lo_b = x_lo[:, None]
    # nonzero(code_xor >> shift):
    #   shift >= 32 -> x_hi >> (shift-32) != 0
    #   shift <  32 -> (x_hi != 0) | (x_lo >> shift != 0)
    ge32 = shifts[None, :] >= 32
    hi_shift = jnp.where(ge32, sh - jnp.uint32(32), jnp.uint32(0))
    starts = jnp.where(
        ge32,
        (hi_b >> hi_shift) != 0,
        (hi_b != 0) | ((lo_b >> sh) != 0),
    )
    return starts.at[0, :].set(True)


def _bound_levels(hi, lo, depth):
    """Per-point u8 boundary level: the shallowest level whose prefix
    changes between codes i-1 and i (index 0 forced to 0 = a boundary at
    every level; codes equal to their predecessor get depth+1 = never)."""
    x_hi = hi ^ jnp.concatenate([hi[:1] ^ jnp.uint32(0xFFFFFFFF), hi[:-1]])
    x_lo = lo ^ jnp.concatenate([lo[:1] ^ jnp.uint32(0xFFFFFFFF), lo[:-1]])
    hsb = jnp.where(
        x_hi != 0,
        jnp.int32(63) - jax.lax.clz(x_hi).astype(jnp.int32),
        jnp.int32(31) - jax.lax.clz(x_lo).astype(jnp.int32),
    )
    return jnp.where(
        (x_hi | x_lo) == 0,
        jnp.int32(depth + 1),
        jnp.maximum(jnp.int32(depth) - hsb // 3, 0),
    ).astype(jnp.uint8)


# Above this size on TPU the fused per-level Pallas kernels
# (ops/level_pallas) replace the scan-composed loop bodies: each level
# becomes 2-3 sweeps over u8 state instead of several materialized i32
# arrays.  Bit-identical (tests + on-TPU core comparison).
_FUSED_MIN_N = 4_000_000


def _assign_and_promote_fused(hi, lo, depth, max_split_level,
                              max_points_per_node, root_level, stop_level,
                              interpret: bool = False):
    """Fused-kernel twin of _assign_and_promote_looped (TPU path).

    State lives in u8 (leaf/found/cur) padded once to a kernel block
    multiple; padding carries boundary level 255 (never a segment start)
    and trails all real data, so it never perturbs real segment bounds or
    promotion ranks."""
    from . import level_pallas as LP

    n = hi.shape[0]
    b = _bound_levels(hi, lo, depth)
    pad = (-n) % LP._BLOCK
    b_pad = jnp.pad(b, (0, pad), constant_values=255)

    # Both loop carries derive from `b` (hence from `hi`) so they inherit
    # its sharding-varying type under shard_map — a plain jnp.zeros is
    # replicated-typed and the fori_loop would reject the varying carry
    # (same constraint as the looped twin's initial carries).
    leaf0 = jnp.pad(
        jnp.zeros_like(b, dtype=jnp.uint8) + jnp.uint8(max_split_level),
        (0, pad), constant_values=max_split_level,
    )
    found0 = jnp.pad(
        jnp.zeros_like(b, dtype=jnp.uint8), (0, pad), constant_values=0
    )

    def leaf_body(i, carry):
        leaf, found = carry
        level = (root_level + 1 + i).astype(jnp.int32)
        seg_start = LP.seg_start_pass(b_pad, level, interpret=interpret)
        return LP.leaf_update_pass(
            b_pad, seg_start, leaf, found, level,
            jnp.int32(max_points_per_node), jnp.int32(n),
            interpret=interpret,
        )

    leaf_pad, _ = jax.lax.fori_loop(
        0, max_split_level - root_level, leaf_body, (leaf0, found0)
    )

    def promo_body(i, cur):
        level = (max_split_level - i).astype(jnp.int32)
        active_any = jnp.any(cur[:n].astype(jnp.int32) == level)
        return jax.lax.cond(
            active_any,
            lambda c: LP.promote_pass(b_pad, c, level, interpret=interpret),
            lambda c: c,
            cur,
        )

    cur_pad = jax.lax.fori_loop(
        0, max_split_level - stop_level, promo_body, leaf_pad
    )
    return (
        leaf_pad[:n].astype(jnp.int32),
        cur_pad[:n].astype(jnp.int32),
    )


def _assign_and_promote_looped(hi, lo, depth, max_split_level,
                               max_points_per_node, root_level, stop_level):
    """The production formulation of leaf assignment + LOD promotion: a
    lax.fori_loop over levels with (N,) blocked-scan temporaries.

    Why this shape (all measured on the v5e, 2 reps, device-resident):
    * fori_loop, not a Python loop — an unrolled level loop lets the XLA
      scheduler interleave all levels' scans and keep every 0.5 GB
      temporary alive at once (23.6 GB at 128M -> OOM); the loop
      serializes them to O(N) live bytes.
    * _scan, not flat lax.cummax/cumsum — the blocked lowering moves ~3x
      less data, and above 20M the Pallas single-pass kernel
      (ops/scan_pallas) halves it again.

    DISPATCH NOTE: on TPU at n >= _FUSED_MIN_N the dispatcher prefers
    _assign_and_promote_fused (ops/level_pallas — 1.8-2.7x faster still),
    so this formulation serves n < 4M on TPU, non-TPU backends, and the
    cross-check tests; the matrix twin below is the second independent
    implementation guarding the tree rules (bit-identical by test)."""
    n = hi.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    # One u8 boundary-level array instead of re-deriving segment starts
    # from the 8-byte code xor at every level of both loops.
    bound_level = _bound_levels(hi, lo, depth)

    def starts_at(level):
        """Segment starts for a TRACED level."""
        return bound_level <= level.astype(jnp.uint8)

    def leaf_body(i, carry):
        leaf, found = carry
        level = root_level + 1 + i
        starts = starts_at(level)
        seg_start = _scan(jnp.where(starts, iota, 0), "max")
        nb = jnp.where(starts, iota, n)
        nxt = _scan(nb, "min", reverse=True)
        seg_end = jnp.concatenate([nxt[1:], jnp.full((1,), n, dtype=nxt.dtype)])
        small = (seg_end - seg_start) <= max_points_per_node
        leaf = jnp.where(~found & small, level, leaf)
        return leaf, found | small

    # Initial carries derive from `hi` so they inherit its sharding-varying
    # type under shard_map (a plain jnp.full is replicated-typed and the
    # fori_loop would reject the varying output carry).
    leaf0 = jnp.zeros_like(hi, dtype=jnp.int32) + jnp.int32(max_split_level)
    found0 = jnp.zeros_like(hi, dtype=bool)
    leaf, _ = jax.lax.fori_loop(
        0, max_split_level - root_level, leaf_body, (leaf0, found0)
    )

    def promo_body(i, cur):
        level = max_split_level - i
        starts = starts_at(level)
        active = cur == level

        def _promote_level(args):
            cur_, active_, starts_, level_ = args
            rank = _segmented_rank(active_, starts_)
            promote = active_ & (rank % 8 == 0)
            return jnp.where(promote, level_ - 1, cur_)

        return jax.lax.cond(
            jnp.any(active),
            _promote_level,
            lambda args: args[0],
            (cur, active, starts, level),
        )

    cur = jax.lax.fori_loop(
        0, max_split_level - stop_level, promo_body, leaf
    )
    return leaf, cur


def _assign_and_promote(hi, lo, depth, max_split_level, max_points_per_node,
                        root_level: int = 0, stop_level: int = 0):
    """Sorted (hi, lo) codes -> (leaf_level, final_level) int32 per point.

    Leaf: first level whose segment holds <= max_points_per_node points
    (capped at max_split_level).  Promotion: per level deepest-first, every
    8th resident point of each node moves to the parent (the reference's
    subsampling rule, src/octree/generation.rs:224-229).  Levels with no
    resident points are skipped at runtime (lax.cond); a gather-based rank
    was measured 2.8x SLOWER than cumsum+cummax on TPU.

    root_level/stop_level give the subtree semantics of the native
    tree_levels kernel (pcv_native.cpp): level-root segments split
    unconditionally (leaves live at levels root+1..max_split) and promotion
    stops at stop_level — points resting AT stop_level are the residual a
    caller's top pass continues from.  This is what each shard of the
    distributed builder runs after the all-to-all (its owned level-B
    subtrees need no cross-shard data)."""
    assert root_level <= stop_level <= max_split_level
    assert root_level < max_split_level
    n = hi.shape[0]
    levels_n = max_split_level - root_level
    dev = jax.config.jax_default_device or jax.devices()[0]
    # The fused Pallas path is single-chip only for now: inside shard_map
    # (varying manual axes) we stay on the pure-lax formulations, which
    # are proven under SPMD partitioning — Pallas-in-shard_map cannot be
    # validated on this single-chip machine.  The correctness net for
    # flipping this gate on real multi-chip hardware exists:
    # tests/test_level_pallas.py::test_fused_inside_shard_map_matches_lax
    # runs the fused kernels inside shard_map (interpret mode, 8-CPU mesh)
    # and asserts bit-identity with the lax path.
    in_shard_map = bool(getattr(jax.typeof(hi), "vma", frozenset()))
    if (
        getattr(dev, "platform", None) == "tpu"
        and not in_shard_map
        and n >= _FUSED_MIN_N
    ):
        return _assign_and_promote_fused(
            hi, lo, depth, max_split_level, max_points_per_node,
            root_level, stop_level,
        )
    if n * levels_n >= _LOOPED_MIN_ELEMS:
        return _assign_and_promote_looped(
            hi, lo, depth, max_split_level, max_points_per_node,
            root_level, stop_level,
        )
    return _assign_and_promote_matrix(
        hi, lo, depth, max_split_level, max_points_per_node,
        root_level=root_level, stop_level=stop_level,
    )


# Above this (N x L) working set the fori_loop + blocked-scan formulation
# wins decisively on TPU (16M x 21: 108.6 ms looped vs 214.1 ms matrix;
# 64M+: matrix OOMs); below it — test-sized inputs and virtual-CPU mesh
# shards — the level-batched matrix vectorizes better on CPU backends and
# keeps the suite fast.
_LOOPED_MIN_ELEMS = 64_000_000


def _assign_and_promote_matrix(hi, lo, depth, max_split_level,
                               max_points_per_node,
                               root_level: int = 0, stop_level: int = 0):
    """Level-batched (N, L) scan-matrix formulation — the independent
    cross-check twin of _assign_and_promote_looped (bit-identical by
    test).  Slower (214 vs 109 ms at 16M) and memory-heavy past ~37M, so
    never the default; kept because two structurally different
    implementations guard the tree rules."""
    n = hi.shape[0]
    levels_n = max_split_level - root_level
    starts_all = _starts_all_levels(
        hi, lo, depth, max_split_level, min_level=root_level + 1
    )  # (N, L) for levels root_level+1..max_split_level
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, levels_n), 0)
    seg_start = jax.lax.cummax(jnp.where(starts_all, iota_n, 0), axis=0)
    nb = jnp.where(starts_all, iota_n, n)
    nxt = jax.lax.cummin(nb[::-1], axis=0)[::-1]
    seg_end = jnp.concatenate(
        [nxt[1:], jnp.full((1, levels_n), n, dtype=nxt.dtype)], axis=0
    )
    counts = seg_end - seg_start  # (N, L)
    small = counts <= max_points_per_node
    has_leaf = jnp.any(small, axis=1)
    leaf = jnp.where(
        has_leaf,
        jnp.argmax(small, axis=1).astype(jnp.int32) + root_level + 1,
        max_split_level,
    )

    cur = leaf
    for level in range(max_split_level, stop_level, -1):
        starts = starts_all[:, level - root_level - 1]
        active = cur == level

        def _promote_level(args):
            cur_, active_, starts_ = args
            rank = _segmented_rank(active_, starts_)
            promote = active_ & (rank % 8 == 0)
            return jnp.where(promote, level - 1, cur_)

        cur = jax.lax.cond(
            jnp.any(active),
            _promote_level,
            lambda args: args[0],
            (cur, active, starts),
        )
    return leaf, cur


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "max_split_level", "max_points_per_node", "root_level",
        "stop_level",
    ),
)
def build_tree_device_codes(
    hi: jnp.ndarray,  # (N,) uint32 Morton code bits 32..62 (unsorted)
    lo: jnp.ndarray,  # (N,) uint32 bits 0..31
    depth: int,
    max_split_level: int,
    max_points_per_node: int = MAX_POINTS_PER_NODE,
    root_level: int = 0,
    stop_level: int = 0,
):
    """Minimal-transfer build core: host-encoded Morton codes in (8 B/pt up),
    (order u32, final u8, leaf u8) out (6 B/pt down) — the host already has
    the unsorted codes, so sorted codes are recovered there as codes[order].
    Same leaf/promotion rules as build_tree_device; root_level/stop_level
    give the subtree semantics of the native tree_levels kernel (the
    out-of-core bucket builds and the sharded per-shard derivation)."""
    n = hi.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).squeeze(-1)
    # num_keys=3 with is_stable=False everywhere in this package: idx is
    # unique per (real) element, so keying on it reproduces the stable
    # (hi, lo) order exactly, and XLA's unstable 3-key sort measured 20%
    # faster than the stable 2-key sort on the v5e (358 -> 288 ms @ 64M).
    hi, lo, idx = jax.lax.sort((hi, lo, idx), num_keys=3, is_stable=False)
    leaf, cur = _assign_and_promote(hi, lo, depth, max_split_level,
                                    max_points_per_node,
                                    root_level=root_level,
                                    stop_level=stop_level)
    return idx, cur.astype(jnp.uint8), leaf.astype(jnp.uint8)


# --- power-of-two shape padding for variable-size device calls -----------
#
# jit compiles one program PER INPUT SHAPE.  The per-bucket (streaming)
# and per-fat-cell (deep) derivations call the device core with
# data-dependent sizes — unpadded, a 64-bucket build pays up to 64 XLA
# compiles (60-300 s each through a remote relay).  Padding to the next
# power of two collapses those to ~log2(spread) compiles.
#
# The sentinel rows are hi = lo = 0xFFFFFFFF, which is byte-identity-safe:
#  * real codes occupy <= 3*MAX_DEPTH = 63 bits, so real hi <= 0x7FFFFFFF
#    — every sentinel sorts STRICTLY after every real row (u32 keys), so
#    slots [0, n) of the sorted output are exactly the real rows and
#    idx[:n] is the real permutation;
#  * _bound_levels gives the first sentinel a level-0 boundary (the XOR
#    with the last real code has bit 63 set -> hsb = 63 -> clamp to 0), so
#    the sentinel run starts a NEW segment at every level >= 1 and never
#    joins (or terminates late) any real cell's run — counts, leaf levels
#    and promotion ranks of real rows are untouched (level-root segments
#    split unconditionally, so the shared level-0 count is never read);
#  * consecutive sentinels are equal (boundary depth+1, never a start), so
#    they form one inert trailing run whose own leaf/promotion values are
#    sliced off with everything else past n.
_PAD_MIN = 1 << 16


def pad_codes_pow2(hi, lo):
    """Host numpy u32 code halves -> (padded hi, padded lo, real n).

    Padded sizes come from the {2^k, 3*2^(k-1)} bucket ladder (steps of
    1.33x/1.5x) rather than pure powers of two: pad bytes ride the full
    host->device upload (the measured binding phase of the streaming
    device path on relayed links), and the extra mid bucket cuts the
    average upload waste from ~1.39x to ~1.2x for at most 2x compile
    variety.  Sentinel fill is 0xFFFFFFFF in BOTH halves: real hi words
    carry only Morton bits 32..62 (bit 31 clear), so sentinels sort
    strictly after every real row and share no code prefix with one."""
    import numpy as np

    n = int(hi.shape[0])
    if n:
        p = 1 << (n - 1).bit_length()  # next pow2 >= n
        mid = 3 * (p >> 2)             # 1.5 * previous pow2
        n_pad = max(_PAD_MIN, mid if n <= mid else p)
    else:
        n_pad = 0
    if n_pad > n:
        fill = np.full(n_pad - n, 0xFFFFFFFF, dtype=np.uint32)
        hi = np.concatenate([hi, fill])
        lo = np.concatenate([lo, fill])
    return hi, lo, n


def pad_rows_pow2(arr, floor: int = 512):
    """Pad a host array's leading axis to the next power of two (>= floor)
    by repeating row 0 — the compile-bucketing policy for per-row device
    kernels (one compiled program per size bucket, not per distinct node
    point count).  Row 0's duplicates are inert for pure per-row kernels;
    the caller slices the result back to real_n.  Returns (padded, real_n)."""
    import numpy as np

    n = int(arr.shape[0])
    n_pad = max(floor, 1 << (n - 1).bit_length()) if n else 0
    if n_pad > n:
        pad = np.broadcast_to(arr[:1], (n_pad - n,) + arr.shape[1:])
        arr = np.concatenate([arr, pad])
    return arr, n


def tree_codes_on_device_padded(
    hi, lo, depth, max_split_level,
    max_points_per_node: int = MAX_POINTS_PER_NODE,
    root_level: int = 0, stop_level: int = 0, device=None,
):
    """build_tree_device_codes over power-of-two-padded host codes.

    Returns UNFORCED device arrays (idx, final, leaf) of the PADDED length
    plus the real n — dispatch stays async (deep builds overlap sub-build
    dispatches across mesh devices), and the caller slices [:n] after
    np.asarray.  Results for rows [0, n) are bit-identical to the unpadded
    call (see pad_codes_pow2's safety argument)."""
    hi, lo, n = pad_codes_pow2(hi, lo)
    if device is not None:
        hi, lo = jax.device_put(hi, device), jax.device_put(lo, device)
    d_idx, d_final, d_leaf = build_tree_device_codes(
        jnp.asarray(hi), jnp.asarray(lo), depth, max_split_level,
        max_points_per_node, root_level, stop_level,
    )
    return d_idx, d_final, d_leaf, n


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "max_split_level", "max_points_per_node", "root_level",
        "stop_level", "extras_cap",
    ),
)
def build_tree_device_codes_grouped(
    hi: jnp.ndarray,  # (N,) uint32 Morton code bits 32..62 (unsorted)
    lo: jnp.ndarray,  # (N,) uint32 bits 0..31
    n_real,           # dynamic scalar: rows [n_real:] are pad sentinels
    depth: int,
    max_split_level: int,
    max_points_per_node: int = MAX_POINTS_PER_NODE,
    root_level: int = 0,
    stop_level: int = 0,
    extras_cap: int = 512,
):
    """Grouped-exchange build core (VERDICT r4 item 6): subtree grouping
    moves ON DEVICE so the host fetch is ~4 B/pt instead of the 6 B/pt of
    (order u32, final u8, leaf u8).

    Returns, in fetch order of the fast path:
      * order2  (u32/pt) — the permutation sorted by (final_level, code),
        values = ORIGINAL indices.  Stable within a level by code, so each
        level's slice is already in code order and every node is one
        contiguous run; the host recovers per-node paths/counts from
        codes[order2] runs (it already holds the unsorted codes).
      * level_counts (i32 × (max_split_level+2)) — points per final level;
        the last bin counts pad sentinels and is discarded.
      * extras_idx/extras_level/extras_total — the ONLY tree facts not
        derivable from final-occupancy closure: 1-point leaves, whose sole
        point is always LOD-promoted away (stride-8 rule takes index 0), so
        the node is real (meta records it with num_points=0, matching the
        reference's empty-after-subsample children, generation.rs:195-253)
        but no point's final level witnesses it.  Compacted to a fixed
        `extras_cap` slots (+1 spill slot); if extras_total > extras_cap
        the host falls back to the classic per-point exchange below.
      * order/final/leaf — the classic (code-sorted) exchange, returned but
        NOT fetched unless the extras overflow (JAX transfers per-array).
    """
    n = hi.shape[0]
    if n == 0:  # static shape: empty input -> empty exchange
        e32 = jnp.zeros(0, jnp.uint32)
        e8 = jnp.zeros(0, jnp.uint8)
        return (e32, jnp.zeros(max_split_level + 2, jnp.int32),
                jnp.zeros(extras_cap, jnp.uint32),
                jnp.zeros(extras_cap, jnp.uint8), jnp.int32(0),
                e32, e8, e8)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).squeeze(-1)
    hi, lo, idx = jax.lax.sort((hi, lo, idx), num_keys=3, is_stable=False)
    leaf, cur = _assign_and_promote(hi, lo, depth, max_split_level,
                                    max_points_per_node,
                                    root_level=root_level,
                                    stop_level=stop_level)

    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    real = pos < n_real
    # Sentinels must sort after every real row REGARDLESS of their own
    # (data-dependent) promotion outcome.
    key = jnp.where(real, cur, max_split_level + 1)

    # Stable sort by final level (ties keep code order): (key, pos) is
    # unique, so the unstable 2-key sort reproduces the stable order.
    _, _, order2 = jax.lax.sort(
        (key.astype(jnp.uint32), pos.astype(jnp.uint32), idx),
        num_keys=2, is_stable=False,
    )

    level_counts = jax.ops.segment_sum(
        jnp.ones_like(key), key, num_segments=max_split_level + 2
    )

    # --- 1-point-leaf extras over the code-sorted order -------------------
    # Adjacent points share a leaf iff same leaf level AND same code prefix
    # at that level.  Shift amounts are kept in [0, 32) per word (>>32 on
    # u32 is undefined in XLA).
    s = (3 * (depth - leaf)).astype(jnp.uint32)  # prefix shift, <= 63
    s1 = s[1:]
    hi_shift = jnp.where(s1 >= 32, s1 - 32, 0)
    lo_shift = jnp.where(s1 < 32, s1, 0)
    eq_wide = (hi[1:] >> hi_shift) == (hi[:-1] >> hi_shift)  # s >= 32
    eq_narrow = (hi[1:] == hi[:-1]) & (
        (lo[1:] >> lo_shift) == (lo[:-1] >> lo_shift)
    )  # s < 32
    same = (leaf[1:] == leaf[:-1]) & jnp.where(s1 >= 32, eq_wide, eq_narrow)
    run_start = jnp.concatenate(
        [jnp.ones(1, dtype=bool), ~same]
    )
    next_start = jnp.concatenate([run_start[1:], jnp.ones(1, dtype=bool)])
    sole = run_start & next_start & real

    rank = jnp.cumsum(sole.astype(jnp.int32)) - 1
    extras_total = rank[-1] + 1
    slot = jnp.where(sole & (rank < extras_cap), rank, extras_cap)
    extras_idx = jnp.zeros(extras_cap + 1, jnp.uint32).at[slot].set(idx)
    extras_level = jnp.zeros(extras_cap + 1, jnp.uint8).at[slot].set(
        leaf.astype(jnp.uint8)
    )

    return (order2, level_counts, extras_idx[:extras_cap],
            extras_level[:extras_cap], extras_total,
            idx, cur.astype(jnp.uint8), leaf.astype(jnp.uint8))


def tree_codes_grouped_on_device_padded(
    hi, lo, depth, max_split_level,
    max_points_per_node: int = MAX_POINTS_PER_NODE,
    root_level: int = 0, stop_level: int = 0, device=None,
    extras_cap: int = None,
):
    """build_tree_device_codes_grouped over power-of-two-padded host codes.

    Returns (outputs tuple as above, real n); all arrays UNFORCED device
    buffers of padded length — the caller fetches order2[:n] etc. and only
    touches the classic per-point arrays on extras overflow.  extras_cap
    scales with the padded shape by default (one compile per size bucket);
    tests override it to force the overflow fallback."""
    hi, lo, n = pad_codes_pow2(hi, lo)
    if device is not None:
        hi, lo = jax.device_put(hi, device), jax.device_put(lo, device)
    if extras_cap is None:
        extras_cap = max(512, hi.shape[0] >> 6)
    out = build_tree_device_codes_grouped(
        jnp.asarray(hi), jnp.asarray(lo), jnp.int32(n), depth,
        max_split_level, max_points_per_node, root_level, stop_level,
        extras_cap,
    )
    return out, n


@jax.jit
def sort_codes_device(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Stable device sort of split u64 Morton codes -> u32 permutation
    (sorted -> original index).  Used by the deep (level > 21) build path,
    whose derivation happens per re-rooted subtree rather than in one
    program; the host recovers sorted codes as codes[order]."""
    n = hi.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).squeeze(-1)
    _, _, idx = jax.lax.sort((hi, lo, idx), num_keys=3, is_stable=False)
    return idx


def argsort_codes_on_device(codes):
    """Host-facing wrapper: u64 numpy codes -> (sorted codes, int64 order)
    with the sort itself on the default JAX device.  Shared by the deep
    build's top pass and the streaming builder's deep bucket path; inputs
    are power-of-two padded with out-of-range sentinel codes (strictly
    greater than any real code) so repeated variable-size calls reuse one
    compiled program per size bucket — order[:n] is the real permutation."""
    import numpy as np

    hi, lo = morton.split_u64(codes)
    hi, lo, n = pad_codes_pow2(hi, lo)
    order = np.asarray(
        sort_codes_device(jnp.asarray(hi), jnp.asarray(lo))
    )[:n].astype(np.int64)
    return codes[order], order


@functools.partial(
    jax.jit, static_argnames=("depth", "max_split_level", "max_points_per_node")
)
def build_tree_device(
    cells: jnp.ndarray,  # (N, 3) uint32 grid cells at `depth`
    depth: int,
    max_split_level: int,
    max_points_per_node: int = MAX_POINTS_PER_NODE,
) -> DeviceTreeResult:
    """The full build core on device.  `max_split_level`: deepest level
    nodes may exist at (resolution cap), <= depth."""
    n = cells.shape[0]
    hi, lo = morton.morton_encode_device(cells, depth)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).squeeze(-1)
    # Sort only the keys + permutation and GATHER the payload afterwards:
    # ~3x faster than carrying all columns through the sort network.
    hi, lo, idx = jax.lax.sort((hi, lo, idx), num_keys=3, is_stable=False)
    sorted_cells = cells[idx]
    cx, cy, cz = sorted_cells[:, 0], sorted_cells[:, 1], sorted_cells[:, 2]

    leaf, cur = _assign_and_promote(hi, lo, depth, max_split_level,
                                    max_points_per_node)

    # ---- node-normalized coordinates --------------------------------------
    # node of a point spans 2^(depth - cur) cells per axis.
    s = (depth - cur).astype(jnp.uint32)
    def norm(c):
        local = c - ((c >> s) << s)
        return (local.astype(jnp.float32) + 0.5) / jnp.exp2(s.astype(jnp.float32))

    t_norm = jnp.stack([norm(cx), norm(cy), norm(cz)], axis=-1)
    return DeviceTreeResult(
        code_hi=hi, code_lo=lo, order=idx, final_level=cur, leaf_level=leaf,
        t_norm=t_norm,
    )

"""Multi-chip sharded octree building: Morton-prefix partitioning with ICI
all-to-all exchange.

The reference is single-process (rayon + crossbeam, SURVEY §2.9); its
distributed analogue here follows the scaling-book recipe: pick a 1-D mesh,
shard the point dimension, and let each step be an SPMD program —

1. each shard quantizes + Morton-encodes its local points (VPU),
2. sorts locally by code (XLA's native sort),
3. buckets points by code prefix (bucket k = the code range owned by
   device k; contiguous after the local sort),
4. exchanges buckets with ONE `jax.lax.all_to_all` over the mesh axis
   (rides ICI on real hardware),
5. re-sorts the received points: every shard now owns a disjoint,
   globally-sorted Morton range, from which node discovery and LOD
   subsampling proceed independently per shard (no further communication;
   node ranges never straddle shards because shard boundaries are code
   prefixes).

Buckets are capacity-padded to keep shapes static (invalid slots carry the
max code and sort to the tail); overflow is counted and reported so callers
can retry with a larger capacity factor.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import morton
from .mesh import SHARD_AXIS

# A HOST constant on purpose: a module-level jnp scalar is a jax.Array
# committed to the import-time default device (the TPU when this package
# is imported before tests pin CPU), and XLA lowering then fetches its
# value THROUGH that device - a relay hiccup turns every CPU-mesh test
# into a hang.  np.uint32 lowers as a pure host constant.
_INVALID = np.uint32(0xFFFFFFFF)


class ShardedSortResult(NamedTuple):
    """Per-shard globally-sorted Morton ranges (leading dim sharded)."""

    code_hi: jnp.ndarray  # (n * cap,) per shard
    code_lo: jnp.ndarray
    positions: jnp.ndarray  # (n * cap, 3) f32, aligned with codes
    valid_count: jnp.ndarray  # (1,) per shard: how many slots are real points
    overflow: jnp.ndarray  # (1,) per shard: points dropped by capacity


def _local_step(
    positions: jnp.ndarray,  # (P, 3) local points, f32
    root_min: jnp.ndarray,  # (3,)
    root_edge: jnp.ndarray,  # ()
    *,
    n_shards: int,
    depth: int,
    capacity: int,
) -> ShardedSortResult:
    p = positions.shape[0]
    scale = jnp.float32(1 << depth)
    t = (positions - root_min) / root_edge
    cells = jnp.clip(jnp.floor(t * scale), 0.0, scale - 1.0).astype(jnp.uint32)
    hi, lo = morton.morton_encode_device(cells, depth)

    # Local sort by code, carrying positions.
    hi, lo, px, py, pz = jax.lax.sort(
        (hi, lo, positions[:, 0], positions[:, 1], positions[:, 2]), num_keys=2
    )

    # Owner shard of a code: equal slices of the code range.  Codes are
    # 3*depth <= 63 bits, so hi (code bits 32..62) spans [0, 2^(3*depth-32)).
    if n_shards == 1:
        bucket = jnp.zeros(p, dtype=jnp.int32)
    else:
        hi_range = 1 << max(3 * depth - 32, 1)
        slice_size = jnp.uint32(max(int(np.ceil(hi_range / n_shards)), 1))
        bucket = jnp.minimum(hi // slice_size, jnp.uint32(n_shards - 1)).astype(jnp.int32)

    counts = jnp.bincount(bucket, length=n_shards)  # (n,)
    offsets = jnp.cumsum(counts) - counts
    kept = jnp.minimum(counts, capacity)
    overflow = jnp.sum(counts - kept)

    # Scatter-free packing: slot (j, c) <- sorted point offsets[j] + c.
    slot_c = jax.lax.broadcasted_iota(jnp.int32, (n_shards, capacity), 1)
    src = jnp.minimum(offsets[:, None] + slot_c, p - 1)
    valid = slot_c < kept[:, None]

    def take(x, fill):
        v = x[src.reshape(-1)].reshape(n_shards, capacity)
        return jnp.where(valid, v, fill)

    send_hi = take(hi, _INVALID)
    send_lo = take(lo, _INVALID)
    send_pos = jnp.stack(
        [take(px, 0.0), take(py, 0.0), take(pz, 0.0)], axis=-1
    )  # (n, cap, 3)

    # The exchange: one all-to-all per array over the mesh axis.
    recv_hi = jax.lax.all_to_all(send_hi, SHARD_AXIS, split_axis=0, concat_axis=0, tiled=True)
    recv_lo = jax.lax.all_to_all(send_lo, SHARD_AXIS, split_axis=0, concat_axis=0, tiled=True)
    recv_pos = jax.lax.all_to_all(send_pos, SHARD_AXIS, split_axis=0, concat_axis=0, tiled=True)
    recv_counts = jax.lax.all_to_all(
        kept[:, None], SHARD_AXIS, split_axis=0, concat_axis=0, tiled=True
    )

    # Globalize: my shard now owns one contiguous code range; sort it.
    flat = n_shards * capacity
    r_hi, r_lo, rx, ry, rz = jax.lax.sort(
        (
            recv_hi.reshape(flat),
            recv_lo.reshape(flat),
            recv_pos[..., 0].reshape(flat),
            recv_pos[..., 1].reshape(flat),
            recv_pos[..., 2].reshape(flat),
        ),
        num_keys=2,
    )
    valid_count = jnp.sum(recv_counts).reshape(1)
    return ShardedSortResult(
        code_hi=r_hi,
        code_lo=r_lo,
        positions=jnp.stack([rx, ry, rz], axis=-1),
        valid_count=valid_count,
        overflow=overflow.reshape(1),
    )


def _node_stats(result: ShardedSortResult, depth: int, level: int) -> jnp.ndarray:
    """Number of non-empty octree nodes at `level` in this shard's range —
    run-length count over code prefixes (per-shard; summing over shards is
    exact because shard boundaries are prefix boundaries for levels whose
    prefix length >= the bucket bits)."""
    shift = 3 * (depth - level)
    if shift < 32:
        raise ValueError("stats_level too deep: need 3*(depth-level) >= 32")
    # Prefix of the 63-bit code (hi holds code bits 32..62).
    prefix = result.code_hi >> jnp.uint32(shift - 32)
    prefix_prev = jnp.concatenate([prefix[:1] + jnp.uint32(1), prefix[:-1]])
    n = result.code_hi.shape[0]
    slots = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    is_valid = slots < result.valid_count[0]
    new_run = (prefix != prefix_prev) & is_valid
    return jnp.sum(new_run)


class ShardedCellSortResult(NamedTuple):
    """Exchange result carrying exact point indices (leading dim sharded)."""

    code_hi: jnp.ndarray
    code_lo: jnp.ndarray
    index: jnp.ndarray  # (n * cap,) uint32 original point index
    valid_count: jnp.ndarray  # (1,)
    overflow: jnp.ndarray  # (1,)


def make_sharded_cell_sort_step(
    mesh: Mesh,
    *,
    depth: int = morton.MAX_DEPTH,
    capacity_factor: float = 2.0,
):
    """Exact distributed Morton sort: takes host-quantized (N, 3) u32 cells
    (sharded on dim 0) plus implicit global indices, returns per-shard
    globally-sorted disjoint code ranges with the original point index
    carried through the all-to-all — the communication core of the real
    multi-chip builder (results are bit-identical to the host sort)."""
    n_shards = mesh.devices.size

    def step(cells, base_index):
        p = cells.shape[0]
        capacity = max(8, int(np.ceil(capacity_factor * p / n_shards)))
        hi, lo = morton.morton_encode_device(cells, depth)
        idx = (
            jax.lax.broadcasted_iota(jnp.uint32, (p, 1), 0).squeeze(-1)
            + base_index[0]
        )
        hi, lo, idx = jax.lax.sort((hi, lo, idx), num_keys=3, is_stable=False)

        if n_shards == 1:
            bucket = jnp.zeros(p, dtype=jnp.int32)
        else:
            hi_range = 1 << max(3 * depth - 32, 1)
            slice_size = jnp.uint32(max(int(np.ceil(hi_range / n_shards)), 1))
            bucket = jnp.minimum(hi // slice_size, jnp.uint32(n_shards - 1)).astype(
                jnp.int32
            )
        counts = jnp.bincount(bucket, length=n_shards)
        offsets = jnp.cumsum(counts) - counts
        kept = jnp.minimum(counts, capacity)
        overflow = jnp.sum(counts - kept)

        slot_c = jax.lax.broadcasted_iota(jnp.int32, (n_shards, capacity), 1)
        src = jnp.minimum(offsets[:, None] + slot_c, p - 1)
        valid = slot_c < kept[:, None]

        def take(x, fill):
            v = x[src.reshape(-1)].reshape(n_shards, capacity)
            return jnp.where(valid, v, fill)

        send = [take(hi, _INVALID), take(lo, _INVALID), take(idx, _INVALID)]
        recv = [
            jax.lax.all_to_all(s, SHARD_AXIS, split_axis=0, concat_axis=0, tiled=True)
            for s in send
        ]
        recv_counts = jax.lax.all_to_all(
            kept[:, None], SHARD_AXIS, split_axis=0, concat_axis=0, tiled=True
        )
        flat = n_shards * capacity
        r_hi, r_lo, r_idx = jax.lax.sort(
            tuple(r.reshape(flat) for r in recv), num_keys=3, is_stable=False
        )
        return ShardedCellSortResult(
            code_hi=r_hi,
            code_lo=r_lo,
            index=r_idx,
            valid_count=jnp.sum(recv_counts).reshape(1),
            overflow=overflow.reshape(1),
        )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=ShardedCellSortResult(
            code_hi=P(SHARD_AXIS),
            code_lo=P(SHARD_AXIS),
            index=P(SHARD_AXIS),
            valid_count=P(SHARD_AXIS),
            overflow=P(SHARD_AXIS),
        ),
    )
    return jax.jit(sharded)


def sharded_morton_sort(
    cells: np.ndarray,
    mesh: Mesh,
    depth: int,
    capacity_factor: float = 2.0,
    max_retries: int = 3,
    stats: Optional[dict] = None,
):
    """Host wrapper: distributed Morton sort of (N, 3) u32 cells over the
    mesh -> (codes_sorted u64 (N,), order int64 (N,)), bit-identical to the
    host path.  Pads N to a multiple of the mesh size (pad cells carry the
    max cell and are dropped afterwards); retries with doubled capacity if
    any shard bucket overflows.  `stats`, if given, records the attempt
    count, final capacity factor, and last overflow."""
    n = len(cells)
    n_shards = mesh.devices.size
    if n == 0:
        # padded=0 would make the shard-stride arange step zero.
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    padded = -(-n // n_shards) * n_shards
    cells_padded = np.full((padded, 3), (1 << depth) - 1, dtype=np.uint32)
    cells_padded[:n] = cells
    base = np.arange(0, padded, padded // n_shards, dtype=np.uint32)
    sharding = NamedSharding(mesh, P(SHARD_AXIS))

    factor = capacity_factor
    attempts = 0
    for _ in range(max_retries):
        step = make_sharded_cell_sort_step(mesh, depth=depth, capacity_factor=factor)
        result = step(
            jax.device_put(cells_padded, sharding),
            jax.device_put(base, sharding),
        )
        overflow = int(np.sum(np.asarray(result.overflow)))
        attempts += 1
        if stats is not None:
            stats.update(
                attempts=attempts, final_factor=factor, last_overflow=overflow
            )
        if overflow == 0:
            break
        factor *= 2.0
    else:
        raise RuntimeError("sharded sort capacity overflow after retries")

    hi = np.asarray(result.code_hi).reshape(n_shards, -1)
    lo = np.asarray(result.code_lo).reshape(n_shards, -1)
    idx = np.asarray(result.index).reshape(n_shards, -1)
    counts = np.asarray(result.valid_count).reshape(n_shards)
    parts_codes = []
    parts_idx = []
    for s in range(n_shards):
        c = counts[s]
        parts_codes.append(morton.join_u64(hi[s, :c], lo[s, :c]))
        parts_idx.append(idx[s, :c].astype(np.int64))
    codes = np.concatenate(parts_codes)
    order = np.concatenate(parts_idx)
    # Drop the padding points (they sorted to the very end).
    if padded != n:
        keep = order < n
        codes = codes[keep]
        order = order[keep]
    return codes, order


class ShardedTreeResult(NamedTuple):
    """Full distributed derivation output (leading dim sharded): per slot the
    original point index plus its tree levels; slots with index >= N are
    padding/capacity fill and must be dropped by the host."""

    index: jnp.ndarray  # (n * cap,) uint32 original point index, code-sorted
    final_level: jnp.ndarray  # (n * cap,) uint8 post-promotion level
    leaf_level: jnp.ndarray  # (n * cap,) uint8 pre-promotion leaf level
    overflow: jnp.ndarray  # (1,) per shard (always 0: capacity is exact)


def make_sharded_tree_step(
    mesh: Mesh,
    *,
    depth: int,
    b_levels: int,
    max_split_level: int,
    capacity: int,
    max_points_per_node: int,
):
    """The WHOLE distributed derivation as one SPMD program (the design
    doc's step 5, finally implemented): after the all-to-all each shard owns
    complete level-`b_levels` subtrees (the owner table is prefix-aligned),
    so leaf assignment and LOD promotion run per shard on device with NO
    further communication — promotion stops at b_levels; what rests there is
    the residual the host's shallow top pass finishes (exactly the
    out-of-core builder's bucket decomposition, octree/streaming.py).

    Reference analogue: the rayon scope that parallelizes the whole build,
    /root/reference/src/octree/generation.rs:152-193."""
    n_shards = mesh.devices.size
    num_buckets = 8**b_levels
    shift = 3 * (depth - b_levels)

    def step(hi, lo, base_index, owner_table):
        from ..ops.tree_build import _assign_and_promote

        p = hi.shape[0]
        idx = (
            jax.lax.broadcasted_iota(jnp.uint32, (p, 1), 0).squeeze(-1)
            + base_index[0]
        )
        hi, lo, idx = jax.lax.sort((hi, lo, idx), num_keys=3, is_stable=False)

        # Owner shard of a point: lookup of its level-B prefix in the
        # host-balanced table.  Host pads carry code 2^(3*depth) whose
        # prefix is exactly num_buckets -> the table's extra last entry.
        if shift >= 32:
            prefix = hi >> jnp.uint32(shift - 32)
        else:
            prefix = (hi << jnp.uint32(32 - shift)) | (lo >> jnp.uint32(shift))
        owner = owner_table[jnp.minimum(prefix, jnp.uint32(num_buckets)).astype(jnp.int32)]

        counts = jnp.bincount(owner, length=n_shards)
        offsets = jnp.cumsum(counts) - counts
        kept = jnp.minimum(counts, capacity)
        overflow = jnp.sum(counts - kept)

        slot_c = jax.lax.broadcasted_iota(jnp.int32, (n_shards, capacity), 1)
        src = jnp.minimum(offsets[:, None] + slot_c, p - 1)
        valid = slot_c < kept[:, None]

        def take(x):
            v = x[src.reshape(-1)].reshape(n_shards, capacity)
            return jnp.where(valid, v, _INVALID)

        send = [take(hi), take(lo), take(idx)]
        recv = [
            jax.lax.all_to_all(s, SHARD_AXIS, split_axis=0, concat_axis=0, tiled=True)
            for s in send
        ]
        flat = n_shards * capacity
        r_hi, r_lo, r_idx = jax.lax.sort(
            tuple(r.reshape(flat) for r in recv), num_keys=3, is_stable=False
        )
        # Capacity-fill slots carry code (0xFFFF.., 0xFFFF..) and host pads
        # 2^(3*depth): both sort past every real code (real codes have
        # <= 3*depth <= 63 bits) and form their own segments, so the
        # derivation below never mixes them with real points.
        leaf, final = _assign_and_promote(
            r_hi, r_lo, depth, max_split_level, max_points_per_node,
            root_level=b_levels, stop_level=b_levels,
        )
        return ShardedTreeResult(
            index=r_idx,
            final_level=final.astype(jnp.uint8),
            leaf_level=leaf.astype(jnp.uint8),
            overflow=overflow.reshape(1),
        )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P()),
        out_specs=ShardedTreeResult(
            index=P(SHARD_AXIS),
            final_level=P(SHARD_AXIS),
            leaf_level=P(SHARD_AXIS),
            overflow=P(SHARD_AXIS),
        ),
    )
    return jax.jit(sharded)


def sharded_tree_levels(
    codes: np.ndarray,
    mesh: Mesh,
    depth: int,
    b_levels: int,
    max_split_level: int,
    max_points_per_node: int,
) -> list:
    """Host wrapper for the full distributed derivation: (N,) u64 unsorted
    Morton codes -> per shard (order int64, final_level u8, leaf_level u8),
    each in globally-sorted code order over that shard's owned level-B
    subtrees (shards concatenated = the global sorted order).

    The owner table is balanced from the EXACT per-cell counts (one host
    bincount), so the all-to-all capacity is exact and overflow impossible —
    no retry loop.  Each shard's (order, levels) feed the standard host
    grouping + encode machinery independently (octree/builder.py)."""
    n = len(codes)
    n_shards = mesh.devices.size
    assert n < 0xFFFFFFFF, "u32 point indices: sharded build caps at 2^32-1 points"
    if n == 0:
        # padded=0 would make the shard-stride arange step zero.
        return [
            (np.empty(0, np.int64), np.empty(0, np.uint8), np.empty(0, np.uint8))
            for _ in range(n_shards)
        ]
    padded = -(-n // n_shards) * n_shards
    pad_code = np.uint64(1) << np.uint64(3 * depth)
    codes_p = np.full(padded, pad_code, dtype=np.uint64)
    codes_p[:n] = codes

    num_buckets = 8**b_levels
    prefix = (codes_p >> np.uint64(3 * (depth - b_levels))).astype(np.int64)
    cell_counts = np.bincount(
        np.minimum(prefix, num_buckets), minlength=num_buckets + 1
    )[:num_buckets]
    before = np.cumsum(cell_counts) - cell_counts
    owner = np.minimum(
        (before * n_shards) // max(n, 1), n_shards - 1
    ).astype(np.int32)
    owner_table = np.concatenate([owner, np.int32([n_shards - 1])])

    src_shard = np.repeat(np.arange(n_shards), padded // n_shards)
    dst = owner_table[np.minimum(prefix, num_buckets)]
    pair_counts = np.bincount(
        src_shard * n_shards + dst, minlength=n_shards * n_shards
    )
    capacity = max(8, int(pair_counts.max()))

    hi, lo = morton.split_u64(codes_p)
    base = np.arange(0, padded, padded // n_shards, dtype=np.uint32)
    sharding = NamedSharding(mesh, P(SHARD_AXIS))
    replicated = NamedSharding(mesh, P())
    step = make_sharded_tree_step(
        mesh,
        depth=depth,
        b_levels=b_levels,
        max_split_level=max_split_level,
        capacity=capacity,
        max_points_per_node=max_points_per_node,
    )
    result = step(
        jax.device_put(hi, sharding),
        jax.device_put(lo, sharding),
        jax.device_put(base, sharding),
        jax.device_put(owner_table, replicated),
    )
    assert int(np.sum(np.asarray(result.overflow))) == 0, "exact capacity overflowed"

    idx = np.asarray(result.index).reshape(n_shards, -1)
    fin = np.asarray(result.final_level).reshape(n_shards, -1)
    leaf = np.asarray(result.leaf_level).reshape(n_shards, -1)
    out = []
    for s in range(n_shards):
        keep = idx[s] < n  # drops capacity fill AND host pads
        out.append((idx[s][keep].astype(np.int64), fin[s][keep], leaf[s][keep]))
    return out


def make_sharded_build_step(
    mesh: Mesh,
    *,
    depth: int = morton.MAX_DEPTH,
    capacity_factor: float = 2.0,
    stats_level: int = 3,
):
    """Returns a jitted SPMD step: (positions (N, 3) f32 sharded on dim 0,
    root_min (3,), root_edge ()) -> (ShardedSortResult, nodes_at_level (n,)).

    This is the communication core of the distributed builder and the
    multi-chip dry-run payload."""
    n_shards = mesh.devices.size

    def step(positions, root_min, root_edge):
        p_local = positions.shape[0]  # per-shard count under shard_map
        capacity = max(8, int(np.ceil(capacity_factor * p_local / n_shards)))
        result = _local_step(
            positions,
            root_min,
            root_edge,
            n_shards=n_shards,
            depth=depth,
            capacity=capacity,
        )
        nodes = _node_stats(result, depth, stats_level).reshape(1)
        total_nodes = jax.lax.psum(nodes, SHARD_AXIS)
        return result, total_nodes

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(), P()),
        out_specs=(
            ShardedSortResult(
                code_hi=P(SHARD_AXIS),
                code_lo=P(SHARD_AXIS),
                positions=P(SHARD_AXIS),
                valid_count=P(SHARD_AXIS),
                overflow=P(SHARD_AXIS),
            ),
            P(),
        ),
    )
    return jax.jit(sharded)

"""Jitted device kernels for the viewer inner loop: frustum culling + LOD
selection over every octree node in one pass.

This is the TPU replacement for the reference's per-frame heap traversal
(src/octree/mod.rs:228-283): node cubes live on device as flat (K,) arrays;
each frame is one jitted call — corner expansion, SAT projections (a batched
matmul on the MXU), hemicube screen-size estimation, and a top-k/sort for
display priority.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

REL_IN = 0
REL_CROSS = 1
REL_OUT = 2

# Unit cube corners, x fastest (matches octree.octree._CORNER_UNIT).
_CORNER_UNIT = np.array(
    [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], dtype=np.float32
)


def node_corners(mins: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """(K, 3) mins + (K,) edges -> (K, 8, 3) cube corners."""
    unit = jnp.asarray(_CORNER_UNIT, dtype=mins.dtype)
    return mins[:, None, :] + unit[None, :, :] * edges[:, None, None]


def sat_relation_device(
    axes: jnp.ndarray,  # (A, 3) separating axes
    query_min_proj: jnp.ndarray,  # (A,) query corners' min projection
    query_max_proj: jnp.ndarray,  # (A,)
    corners: jnp.ndarray,  # (K, 8, 3)
) -> jnp.ndarray:
    """Batched SAT relations (K,) int8: 0=In, 1=Cross, 2=Out."""
    proj = jnp.einsum("kcd,ad->kca", corners, axes)  # (K, 8, A) — MXU matmul
    b_min = proj.min(axis=1)
    b_max = proj.max(axis=1)
    out = jnp.any((b_min > query_max_proj) | (b_max < query_min_proj), axis=1)
    cross = jnp.any((query_min_proj > b_min) | (b_max > query_max_proj), axis=1)
    return jnp.where(out, REL_OUT, jnp.where(cross, REL_CROSS, REL_IN)).astype(jnp.int8)


def relative_sizes_on_screen_device(
    matrix: jnp.ndarray, corners: jnp.ndarray
) -> jnp.ndarray:
    """Projected screen-size heuristic (K,), the hemicube-clamped xy area of
    the projected cube (reference: src/octree/mod.rs:119-139)."""
    q = jnp.einsum("kcd,rd->kcr", corners, matrix[:3, :3]) + matrix[:3, 3]
    w = jnp.einsum("kcd,d->kc", corners, matrix[3, :3]) + matrix[3, 3]
    p = q / w[..., None]
    x = jnp.clip(p[..., 0], -1.0, 1.0)
    y = jnp.clip(p[..., 1], -1.0, 1.0)
    return (x.max(axis=1) - x.min(axis=1)) * (y.max(axis=1) - y.min(axis=1))


def _cull_core(matrix, axes, query_min_proj, query_max_proj, node_mins,
               node_edges, num_points):
    corners = node_corners(node_mins, node_edges)
    relation = sat_relation_device(axes, query_min_proj, query_max_proj, corners)
    sizes = relative_sizes_on_screen_device(matrix, corners)
    visible = (relation != REL_OUT) & (num_points > 0)
    # Invisible nodes get -inf priority -> sorted last.
    priority = jnp.where(visible, sizes, -jnp.inf)
    order = jnp.argsort(-priority)
    return order.astype(jnp.int32), sizes, visible


@jax.jit
def frustum_cull_lod_select(
    matrix: jnp.ndarray,  # (4, 4) clip_from_query
    axes: jnp.ndarray,  # (A, 3) cached separating axes
    query_min_proj: jnp.ndarray,  # (A,)
    query_max_proj: jnp.ndarray,  # (A,)
    node_mins: jnp.ndarray,  # (K, 3)
    node_edges: jnp.ndarray,  # (K,)
    num_points: jnp.ndarray,  # (K,) int32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The per-frame step: returns (priority_order (K,) int32, sizes (K,),
    visible (K,) bool).  priority_order lists ALL node indices sorted by
    descending screen size with invisible nodes pushed to the end; callers
    take the first `visible.sum()` entries."""
    return _cull_core(matrix, axes, query_min_proj, query_max_proj,
                      node_mins, node_edges, num_points)


# Many frames in one dispatch (vmapped over matrix + per-frame axes); used
# by the headless viewer benchmark to amortize dispatch latency.
frustum_cull_lod_select_frames = jax.jit(
    jax.vmap(_cull_core, in_axes=(0, 0, 0, 0, None, None, None))
)


def frustum_cull_lod_select_host(
    matrix: np.ndarray,
    axes: np.ndarray,
    query_min_proj: np.ndarray,
    query_max_proj: np.ndarray,
    node_mins: np.ndarray,
    node_edges: np.ndarray,
    num_points: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host twin of frustum_cull_lod_select (same SAT + screen-size rules,
    native C++ kernel with a numpy fallback).

    On relay-attached accelerators a single device dispatch costs ~30 ms of
    round-trip latency; interactive-scale node tables (<~100k) are culled
    here in well under a frame instead.  The device kernel remains the path
    for huge tables and batched (multi-frame / multi-query) workloads."""
    from .. import native

    out = native.cull_lod_select(
        matrix, axes, query_min_proj, query_max_proj,
        node_mins, node_edges, num_points,
    )
    if out is not None:
        return out
    # numpy fallback (same math as the device kernel, host-resident)
    mins = np.asarray(node_mins, dtype=np.float32)
    edges = np.asarray(node_edges, dtype=np.float32)
    corners = mins[:, None, :] + _CORNER_UNIT[None, :, :] * edges[:, None, None]
    proj = np.einsum("kcd,ad->kca", corners, np.asarray(axes, np.float32))
    b_min, b_max = proj.min(axis=1), proj.max(axis=1)
    out_mask = np.any(
        (b_min > query_max_proj) | (b_max < query_min_proj), axis=1
    )
    m = np.asarray(matrix, dtype=np.float32)
    q = np.einsum("kcd,rd->kcr", corners, m[:3, :3]) + m[:3, 3]
    w = np.einsum("kcd,d->kc", corners, m[3, :3]) + m[3, 3]
    p = q / w[..., None]
    x = np.clip(p[..., 0], -1.0, 1.0)
    y = np.clip(p[..., 1], -1.0, 1.0)
    sizes = (x.max(axis=1) - x.min(axis=1)) * (y.max(axis=1) - y.min(axis=1))
    visible = (~out_mask) & (np.asarray(num_points) > 0)
    priority = np.where(visible, sizes, -np.inf)
    order = np.argsort(-priority, kind="stable").astype(np.int32)
    return order, sizes.astype(np.float32), visible


def frustum_axes_and_projections(frustum) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side per-frame prep: cached separating axes of the frustum vs
    AABBs plus the query-corner projections (A is data-dependent; computed
    once per frame, tiny)."""
    cached = frustum.intersector().cached_axes_for_aabb()
    proj = cached.corners @ cached.axes.T  # (8, A)
    return (
        cached.axes.astype(np.float32),
        proj.min(axis=0).astype(np.float32),
        proj.max(axis=0).astype(np.float32),
    )


def pad_cull_axes(axes, qmin, qmax, a_cap: int):
    """Pad a frame's SAT axes to width a_cap with inert sentinels: a zero
    axis projects everything to 0, which the [-inf, inf] query range never
    separates, so relations are unchanged."""
    a = len(axes)
    ax = np.zeros((a_cap, 3), np.float32)
    qn = np.full(a_cap, -np.inf, np.float32)
    qx = np.full(a_cap, np.inf, np.float32)
    ax[:a] = axes
    qn[:a] = qmin
    qx[:a] = qmax
    return ax, qn, qx


def prep_frustum_frames(frustums, axis_capacity: int = 0):
    """Host prep for a multi-frame cull dispatch: per-frame cached axes
    padded to a common width (>= axis_capacity), stacked into (F, 4, 4)
    matrices + (F, A, 3)/(F, A)/(F, A) axis arrays."""
    prep = [frustum_axes_and_projections(f) for f in frustums]
    a_cap = max([int(axis_capacity)] + [len(p[0]) for p in prep])
    mats, axs, qns, qxs = [], [], [], []
    for f, (axes, qmin, qmax) in zip(frustums, prep):
        ax, qn, qx = pad_cull_axes(axes, qmin, qmax, a_cap)
        mats.append(f.clip_from_query.astype(np.float32))
        axs.append(ax)
        qns.append(qn)
        qxs.append(qx)
    return np.stack(mats), np.stack(axs), np.stack(qns), np.stack(qxs)


class DeviceCullSession:
    """Device-resident cull + LOD selection across frames.

    The node table (mins/edges/num_points) uploads ONCE and stays in HBM;
    each frame ships only a 4x4 matrix and <= `axis_capacity` padded SAT
    axes (padding axes are all-zero with an infinite query range, so they
    can never separate — relations are unchanged), keeping every frame the
    SAME compiled program regardless of the frustum's data-dependent axis
    count.  `step` is one dispatch per frame; `step_frames` amortizes the
    dispatch over a whole camera path (one vmapped dispatch for F frames)
    — the production shapes for a local-TPU viewer host and for offline
    visibility precomputation respectively.  Replaces per-frame re-upload
    of the table (reference keeps its nodes in host RAM and re-walks them
    per frame, src/octree/mod.rs:228-283).

    Determinism contract: `step` is bit-equal to frustum_cull_lod_select
    on the padded inputs (same program), and `step_frames` to
    frustum_cull_lod_select_frames.  Between the single-frame and vmapped
    programs, VISIBLE SETS agree but screen-size floats may differ in
    rounding (XLA may associate the projection matmuls differently per
    program, and the hemicube clamp amplifies ulps for cubes straddling
    w=0), so display order may permute among near-ties — the same class
    of nondeterminism as the reference's screen-size heuristic."""

    def __init__(self, node_mins, node_edges, num_points,
                 axis_capacity: int = 32) -> None:
        self.a_cap = int(axis_capacity)
        self._mins = jnp.asarray(node_mins, dtype=jnp.float32)
        self._edges = jnp.asarray(node_edges, dtype=jnp.float32)
        self._num_points = jnp.asarray(num_points, dtype=jnp.int32)

    def _pad(self, axes, qmin, qmax):
        a = len(axes)
        if a > self.a_cap:  # grow once; next frames reuse the new width
            self.a_cap = int(a * 2)
        return pad_cull_axes(axes, qmin, qmax, self.a_cap)

    def step(self, frustum) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One frame -> (priority_order (K,) i32, sizes (K,), visible (K,)),
        bit-equal to frustum_cull_lod_select on the unpadded inputs."""
        axes, qmin, qmax = frustum_axes_and_projections(frustum)
        ax, qn, qx = self._pad(axes, qmin, qmax)
        order, sizes, visible = frustum_cull_lod_select(
            jnp.asarray(frustum.clip_from_query, dtype=jnp.float32),
            jnp.asarray(ax), jnp.asarray(qn), jnp.asarray(qx),
            self._mins, self._edges, self._num_points,
        )
        return np.asarray(order), np.asarray(sizes), np.asarray(visible)

    def step_frames(self, frustums) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """F frames in ONE dispatch -> ((F, K) orders, sizes, visible)."""
        frustums = list(frustums)
        if not frustums:
            k = len(self._edges)
            return (
                np.empty((0, k), np.int32),
                np.empty((0, k), np.float32),
                np.empty((0, k), bool),
            )
        need = max(
            len(frustum_axes_and_projections(f)[0]) for f in frustums
        )
        if need > self.a_cap:
            self.a_cap = int(need * 2)
        mats, axs, qns, qxs = prep_frustum_frames(frustums, self.a_cap)
        order, sizes, visible = frustum_cull_lod_select_frames(
            jnp.asarray(mats), jnp.asarray(axs),
            jnp.asarray(qns), jnp.asarray(qxs),
            self._mins, self._edges, self._num_points,
        )
        return np.asarray(order), np.asarray(sizes), np.asarray(visible)

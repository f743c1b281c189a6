"""Pallas TPU kernel: fused frustum cull + screen-size estimation.

The lax version (ops/culling.py) materializes a (K, 8, A) projection tensor
in HBM; this kernel tiles the node table into VMEM blocks and fuses corner
expansion, SAT projections, the hemicube screen-size heuristic, and
visibility into one pass over the node table.

Kernel shape notes (Mosaic-friendly): everything stays 2D —
(TILE, A_PAD) for SAT and (TILE, 1) for scalars-per-node; the 8 cube
corners are an unrolled Python loop updating running min/max, so there are
no tiny-contraction matmuls (Mosaic rejects K=3 dots) and no 3D layouts.
Axes are padded to A_PAD with zero vectors whose query interval is [-1, 1],
neutral for both the separation and the containment test.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A_PAD = 32  # fixed separating-axis count (frusta need <= 26)
TILE = 512  # nodes per grid step


def _kernel(matrix_ref, axes_t_ref, qmin_ref, qmax_ref, mins_ref, edges_ref,
            npoints_ref, priority_ref, visible_ref):
    mins = mins_ref[:]  # (TILE, 3)
    edges = edges_ref[:]  # (TILE, 1)
    ax = axes_t_ref[0:1, :]  # (1, A_PAD)
    ay = axes_t_ref[1:2, :]
    az = axes_t_ref[2:3, :]

    big = jnp.float32(3.4e38)
    b_min = jnp.full((mins.shape[0], A_PAD), big, dtype=jnp.float32)
    b_max = -b_min
    x_min = jnp.full((mins.shape[0], 1), big, dtype=jnp.float32)
    x_max = -x_min
    y_min = x_min
    y_max = -x_min

    m = matrix_ref  # (4, 4) in SMEM, scalar reads
    for c in range(8):
        ux, uy, uz = float(c & 1), float((c >> 1) & 1), float((c >> 2) & 1)
        cx = mins[:, 0:1] + ux * edges  # (TILE, 1)
        cy = mins[:, 1:2] + uy * edges
        cz = mins[:, 2:3] + uz * edges
        # SAT projection of this corner onto all axes.
        proj = cx * ax + cy * ay + cz * az  # (TILE, A_PAD)
        b_min = jnp.minimum(b_min, proj)
        b_max = jnp.maximum(b_max, proj)
        # Screen-space position (hemicube-clamped).
        qx = m[0, 0] * cx + m[0, 1] * cy + m[0, 2] * cz + m[0, 3]
        qy = m[1, 0] * cx + m[1, 1] * cy + m[1, 2] * cz + m[1, 3]
        w = m[3, 0] * cx + m[3, 1] * cy + m[3, 2] * cz + m[3, 3]
        px = jnp.clip(qx / w, -1.0, 1.0)
        py = jnp.clip(qy / w, -1.0, 1.0)
        x_min = jnp.minimum(x_min, px)
        x_max = jnp.maximum(x_max, px)
        y_min = jnp.minimum(y_min, py)
        y_max = jnp.maximum(y_max, py)

    separated = (b_min > qmax_ref[:]) | (b_max < qmin_ref[:])  # (TILE, A_PAD)
    out = jnp.max(separated.astype(jnp.float32), axis=1, keepdims=True) > 0.0
    sizes = (x_max - x_min) * (y_max - y_min)  # (TILE, 1)
    visible = (~out) & (npoints_ref[:] > 0)
    priority_ref[:] = jnp.where(visible, sizes, -jnp.inf)
    visible_ref[:] = visible.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cull_pallas(matrix, axes_t, qmin, qmax, mins, edges, num_points,
                 interpret=False):
    k = mins.shape[0]
    grid = (k // TILE,)
    priority, visible = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, A_PAD), lambda i: (0, 0)),
            pl.BlockSpec((1, A_PAD), lambda i: (0, 0)),
            pl.BlockSpec((1, A_PAD), lambda i: (0, 0)),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.int8),
        ],
        interpret=interpret,
    )(matrix, axes_t, qmin, qmax, mins, edges, num_points)
    return priority[:, 0], visible[:, 0]


def frustum_cull_lod_select_pallas(
    matrix: np.ndarray,
    axes: np.ndarray,
    qmin: np.ndarray,
    qmax: np.ndarray,
    node_mins: np.ndarray,
    node_edges: np.ndarray,
    num_points: np.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused Pallas cull: returns (priority (K,) f32 with -inf for invisible,
    visible (K,) bool).  Inputs are padded to the tile size internally."""
    k = len(node_mins)
    a = len(axes)
    if a > A_PAD:
        raise ValueError(f"too many separating axes: {a} > {A_PAD}")
    k_pad = -(-max(k, 1) // TILE) * TILE

    # Axes transposed to (4, A_PAD) — 4 rows for sublane alignment; row 3 unused.
    axes_t = np.zeros((4, A_PAD), dtype=np.float32)
    axes_t[:3, :a] = np.asarray(axes, dtype=np.float32).T
    qmin_p = np.full((1, A_PAD), -1.0, dtype=np.float32)
    qmax_p = np.full((1, A_PAD), 1.0, dtype=np.float32)
    qmin_p[0, :a] = qmin
    qmax_p[0, :a] = qmax
    mins_p = np.zeros((k_pad, 3), dtype=np.float32)
    mins_p[:k] = node_mins
    edges_p = np.zeros((k_pad, 1), dtype=np.float32)
    edges_p[:k, 0] = node_edges
    np_p = np.zeros((k_pad, 1), dtype=np.int32)
    np_p[:k, 0] = num_points

    priority, visible = _cull_pallas(
        jnp.asarray(matrix, dtype=jnp.float32),
        jnp.asarray(axes_t),
        jnp.asarray(qmin_p),
        jnp.asarray(qmax_p),
        jnp.asarray(mins_p),
        jnp.asarray(edges_p),
        jnp.asarray(np_p),
        interpret=interpret,
    )
    return priority[:k], visible[:k].astype(bool)

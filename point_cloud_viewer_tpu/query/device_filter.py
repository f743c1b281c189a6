"""Device (TPU) per-point query filtering — SURVEY §7.5's batched decode +
cull + interval filter as device kernels (reference per-point loop:
src/iterator.rs:93-119).

One jitted f64 kernel per geometry (the x64-scoped pattern of
xray/device_splat.py): box, OBB, frustum, S2 cell union, plus the
attribute interval filter — each mirrors its host twin's exact operation
sequence (math/geometry.py contains(); math/s2_device.py for the
trig-free point->cell-id + id-range membership).  WebMercatorRect — whose
membership runs through transcendental geodetic math that device XLA does
not reproduce bit-for-bit — goes through the hybrid exact scheme in
math/web_mercator_device.py (device classifies with a calibrated
conservative margin, host refines only the boundary band), so all six
geometries run on device with bit-equal masks.

`point_filter_mask` returns None when a query cannot run on device; the
caller falls back to the host path (PointQuery.filter_batch does this
automatically when use_device=True).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Scoped x64 (same pattern as xray/device_splat.py): membership compares
# must run in f64 to match the host bit-for-bit.
from jax._src.config import enable_x64 as _enable_x64

from ..math.geometry import Aabb, Frustum, Obb
from .location import AllPoints, GeometryLocation


@jax.jit
def _box_mask(p, mins, maxs):
    return jnp.all((mins <= p) & (p < maxs), axis=-1)


@jax.jit
def _obb_mask(p, rot_t, translation, half_extent):
    local = p @ rot_t + translation
    return jnp.all(jnp.abs(local) <= half_extent, axis=-1)


@jax.jit
def _frustum_mask(p, m):
    q = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    clip = q / w[..., None]
    return jnp.all((clip > -1.0) & (clip < 1.0), axis=-1)


@functools.partial(jax.jit, static_argnames=("n_intervals",))
def _interval_mask(values, lows, highs, n_intervals):
    keep = jnp.ones(values.shape[1], dtype=bool)
    for i in range(n_intervals):
        keep = keep & (values[i] >= lows[i]) & (values[i] <= highs[i])
    return keep


def _is_cell_union(location) -> bool:
    from ..s2_cells.cell_union import CellUnion

    return isinstance(location, CellUnion) and len(location) > 0


def point_filter_mask(
    location,
    positions: np.ndarray,
    intervals: Optional[Dict[str, object]] = None,
    attributes: Optional[Dict[str, np.ndarray]] = None,
) -> Optional[np.ndarray]:
    """(N, 3) f64 positions -> (N,) bool keep mask computed on the default
    JAX device, or None if this query's geometry/filters cannot run there
    (host fallback).  Bit-equal to the host mask for box/OBB/frustum +
    scalar interval filters."""
    from ..math.web_mercator import WebMercatorRect

    geometry = getattr(location, "geometry", None)
    wm_keep: Optional[np.ndarray] = None
    if isinstance(location, AllPoints):
        mask = None  # no geometric test; intervals may still apply
    elif isinstance(location, GeometryLocation) and isinstance(
        geometry, WebMercatorRect
    ):
        from ..math.web_mercator_device import rect_contains_device

        try:
            wm_keep = rect_contains_device(geometry, positions)
        except Exception:
            # Backend can't run the f64 transcendental kernel (calibration
            # probe or compile failed): host fallback, like any other
            # unsupported geometry.
            return None
        mask = None  # intervals (if any) still go through the kernel below
    elif isinstance(location, GeometryLocation) and isinstance(geometry, Aabb):
        mask = ("box", geometry)
    elif isinstance(location, GeometryLocation) and isinstance(geometry, Obb):
        mask = ("obb", geometry)
    elif isinstance(location, GeometryLocation) and isinstance(
        geometry, Frustum
    ):
        mask = ("frustum", geometry)
    elif _is_cell_union(location):
        mask = ("cell_union", location)
    else:
        return None  # custom location types: host only

    intervals = intervals or {}
    for name, interval in intervals.items():
        data = (attributes or {}).get(name)
        if data is None or np.asarray(data).ndim != 1:
            return None  # missing attribute: let the host path raise
        if not np.issubdtype(np.asarray(data).dtype, np.number):
            return None

    if mask is None and not intervals:
        # Nothing left to compute on device: for WebMercatorRect the hybrid
        # mask is already in hand (uploading positions again just to AND
        # with all-ones would double the relay transfer); for AllPoints the
        # answer is trivially all-ones.
        if wm_keep is not None:
            return wm_keep
        return np.ones(np.atleast_2d(positions).shape[0], dtype=bool)

    # Pad the batch to the next power of two: node point counts are all
    # distinct, and jit compiles one program PER SHAPE — unpadded, a
    # stream over K nodes pays K compiles (minutes each through a remote
    # relay).  Padding rows duplicate row 0; their mask values are sliced
    # off below, and row 0's own result is unaffected (pure per-point
    # kernels).
    from ..ops.tree_build import pad_rows_pow2

    pos2d, n_real = pad_rows_pow2(np.atleast_2d(positions))
    n_pad = pos2d.shape[0]

    with _enable_x64(True):
        keep = None
        if mask is not None:
            p = jnp.asarray(pos2d, dtype=jnp.float64)
        if mask is None:
            pass  # intervals only: positions never leave the host
        elif mask[0] == "box":
            g = mask[1]
            keep = _box_mask(
                p, jnp.asarray(g.mins, dtype=jnp.float64),
                jnp.asarray(g.maxs, dtype=jnp.float64),
            )
        elif mask[0] == "obb":
            g = mask[1]
            iso = g.obb_from_query
            keep = _obb_mask(
                p,
                jnp.asarray(iso.rotation.T, dtype=jnp.float64),
                jnp.asarray(iso.translation, dtype=jnp.float64),
                jnp.asarray(g.half_extent, dtype=jnp.float64),
            )
        elif mask[0] == "cell_union":
            from ..math.s2_device import _union_mask

            union = mask[1]
            keep = _union_mask(
                p,
                jnp.asarray(union._range_min, dtype=jnp.uint64),
                jnp.asarray(union._range_max, dtype=jnp.uint64),
            )
        else:
            keep = _frustum_mask(
                p, jnp.asarray(mask[1].clip_from_query, dtype=jnp.float64)
            )
        if intervals:
            names = sorted(intervals)
            vals_np = np.stack(
                [np.asarray(attributes[n], dtype=np.float64) for n in names]
            )
            if n_pad > n_real:
                vals_np = np.concatenate(
                    [
                        vals_np,
                        np.broadcast_to(
                            vals_np[:, :1], (len(names), n_pad - n_real)
                        ),
                    ],
                    axis=1,
                )
            vals = jnp.asarray(vals_np)
            lows = jnp.asarray(
                np.array([intervals[n].lower_bound for n in names], dtype=np.float64)
            )
            highs = jnp.asarray(
                np.array([intervals[n].upper_bound for n in names], dtype=np.float64)
            )
            im = _interval_mask(vals, lows, highs, len(names))
            keep = im if keep is None else keep & im
        result = np.asarray(keep)[:n_real]
    if wm_keep is not None:
        result = result & wm_keep
    return result

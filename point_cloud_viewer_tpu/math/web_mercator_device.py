"""Device (TPU) WebMercatorRect point containment — the last of the six
query geometries to run on the accelerator (SURVEY §7.5/7.6).

The host test (math/web_mercator.py::WebMercatorRect.contains, mirroring
reference src/geometry/web_mercator_rect.rs:119-125) runs ECEF -> geodetic
(Bowring) -> normalized Web Mercator through transcendental libm whose
rounding the device's XLA math library does not reproduce bit-for-bit.
Rather than give up bit-equality (the contract every other device filter
keeps), this module uses a **hybrid exact** scheme:

1. the device runs the SAME f64 algorithm (identical operation sequence:
   3-iteration Bowring, the reference's latitude clamp, the same y
   formula) and classifies every point against the rect with a
   conservative margin `delta`:
       definitely-inside   (>= nw + delta and < se - delta on both axes)
       definitely-outside  (< nw - delta or >= se + delta on either axis)
       uncertain           (within delta of a boundary)
2. the host recomputes ONLY the uncertain points with its exact libm path.

The final mask equals the host mask bit-for-bit provided the device's
projection error stays below `delta`.  `delta` is not guessed: a one-time
per-process probe projects a fixed grid of ECEF points on both host and
device and sets `delta = max(1e-9, 1000 x observed max error)` — three
orders of magnitude of safety over whatever precision the backend
actually delivers (some accelerator platforms emulate f64 transcendentals
at reduced precision).  1e-9 normalized units is ~4 cm on the equator, so
in the normal f64 case the uncertain band is geometrically negligible and
the host refinement touches ~0 points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax._src.config import enable_x64 as _enable_x64

from . import wgs84
from .web_mercator import LAT_BOUND_RAD, ecef_to_web_mercator


def _wmc_project(p):
    """jnp mirror of wgs84.ecef_to_geodetic (lat/lon only) followed by
    web_mercator.lat_lng_to_web_mercator — identical operation order so a
    true-f64 backend agrees to a few ulp."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    lon = jnp.arctan2(y, x)
    pr = jnp.hypot(x, y)
    theta = jnp.arctan2(z * wgs84.SEMI_MAJOR_M, pr * wgs84.SEMI_MINOR_M)
    for _ in range(3):
        sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
        lat = jnp.arctan2(
            z + wgs84.ECC2_SQ * wgs84.SEMI_MINOR_M * sin_t**3,
            pr - wgs84.ECC_SQ * wgs84.SEMI_MAJOR_M * cos_t**3,
        )
        theta = jnp.arctan2(
            wgs84.SEMI_MINOR_M * jnp.sin(lat), wgs84.SEMI_MAJOR_M * jnp.cos(lat)
        )
    lat = jnp.clip(lat, -LAT_BOUND_RAD, LAT_BOUND_RAD)
    sin_y = jnp.sin(lat)
    mx = 0.5 + lon / (2.0 * jnp.pi)
    my = 0.5 - jnp.log((1.0 + sin_y) / (1.0 - sin_y)) * (0.25 / jnp.pi)
    return jnp.stack([mx, my], axis=-1)


@jax.jit
def _classify(p, nw, se, delta):
    """-> (definite_in, uncertain) bool masks (N,)."""
    wmc = _wmc_project(p)
    definite_in = jnp.all((wmc >= nw + delta) & (wmc < se - delta), axis=-1)
    definite_out = jnp.any((wmc < nw - delta) | (wmc >= se + delta), axis=-1)
    return definite_in, ~(definite_in | definite_out)


@functools.lru_cache(maxsize=1)
def _calibrated_delta() -> float:
    """Probe the live backend's projection error on a fixed global grid.

    Returns the conservative margin, or raises if the backend cannot run
    the f64 kernel at all (caller falls back to host)."""
    lat = np.linspace(-1.48, 1.48, 41)
    lon = np.linspace(-np.pi, np.pi, 41, endpoint=False)
    lat_g, lon_g = np.meshgrid(lat, lon)
    alt = np.linspace(-500.0, 10000.0, lat_g.size).reshape(lat_g.shape)
    probe = wgs84.geodetic_to_ecef(lat_g, lon_g, alt).reshape(-1, 3)
    host = ecef_to_web_mercator(probe)
    with _enable_x64(True):
        dev = np.asarray(_wmc_project(jnp.asarray(probe, dtype=jnp.float64)))
    err = float(np.max(np.abs(dev - host)))
    if not np.isfinite(err):
        raise RuntimeError("device WebMercator probe produced non-finite values")
    return max(1e-9, err * 1000.0)


def rect_contains_device(rect, positions: np.ndarray) -> np.ndarray:
    """(N, 3) f64 ECEF -> (N,) bool, bit-equal to rect.contains(positions).

    Device classifies with the calibrated margin; host refines the
    uncertain band.  Raises if the backend can't run f64 (caller falls
    back to the host path)."""
    from ..ops.tree_build import pad_rows_pow2

    delta = _calibrated_delta()
    pos2d = np.atleast_2d(np.asarray(positions, dtype=np.float64))
    # Pad to a power of two: one compiled program per size bucket, not per
    # node point count (shared policy with query/device_filter.py).
    pos2d_padded, n_real = pad_rows_pow2(pos2d)
    nw = rect.north_west.normalized.reshape(2)
    se = rect.south_east.normalized.reshape(2)
    with _enable_x64(True):
        definite_in, uncertain = _classify(
            jnp.asarray(pos2d_padded, dtype=jnp.float64),
            jnp.asarray(nw, dtype=jnp.float64),
            jnp.asarray(se, dtype=jnp.float64),
            jnp.float64(delta),
        )
        # np.array (copy): the zero-copy view of a jax buffer is read-only
        # and the refinement below writes into keep.
        keep = np.array(definite_in)[:n_real]
        uncertain = np.asarray(uncertain)[:n_real]
    idx = np.flatnonzero(uncertain)
    if len(idx):
        keep[idx] = rect.contains(pos2d[idx])
    return keep

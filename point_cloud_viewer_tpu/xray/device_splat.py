"""Device (TPU) splat kernels for x-ray tile generation.

The reference's hot loop accumulates per-pixel hash maps point by point
(/root/reference/xray/src/generation.rs:99-136); the host strategies in
generation.py turn that into np.unique/bincount segment reductions.  These
are their jitted twins: one scatter-add / segment-sum program per strategy
family over (pixel, z-bucket) keys, with a fixed (image_size^2,) output so
shapes stay static under jit.

Exactness policy (the strategy tests assert identical u8 images):
* XRay occupancy and color sums reduce in INTEGERS — bit-exact vs host.
* Intensity / height-stddev moments reduce in f64 (x64 enabled for the
  call via JAX's scoped config; the TPU emulates f64).  Scatter-add
  association may differ from numpy's sequential bincount, but f64 sums of
  float32-precision values are EXACT (no rounding at all) whenever the
  summand exponent span is <= 29 binary orders — true for any real
  intensity/height data — so the results are bit-equal to the host's.

Host discretization (generation.discretize, f64) is kept — quantization
must be bit-exact with the reference — the device runs the O(N) reduction,
which is where the time goes.

Binned (pixel, bin) accumulation keys are dynamic-width; the device path
covers binning=None (the reference's default and its benchmarked
configuration), host strategies cover the rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_Z_KEYS = 2048  # z in [0, 1024] inclusive; keys are pix * 2048 + z


@functools.partial(jax.jit, static_argnames=("image_size",))
def _xray_occupancy(key: jnp.ndarray, image_size: int):
    """Distinct (pixel, z-bucket) count per pixel from PACKED u32 keys
    (pix * 2048 + z — exactly what the strategy accumulates, so only
    4 B/pt ship to the device): sort, mark run starts, then per-pixel
    counts via cumsum + searchsorted boundary slicing.  Scatter-free: TPU
    scatter serializes (measured 59 ms vs 16 ms for this epilogue at 8M)."""
    npx = image_size * image_size
    (key,) = jax.lax.sort((key,))
    prev = jnp.concatenate([key[:1] ^ jnp.uint32(1), key[:-1]])
    first = (key != prev).astype(jnp.int32)
    cf = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(first)])
    pix_sorted = key // jnp.uint32(_Z_KEYS)
    bounds = jnp.searchsorted(
        pix_sorted, jnp.arange(npx + 1, dtype=jnp.uint32)
    )
    return cf[bounds[1:]] - cf[bounds[:-1]]


@functools.partial(jax.jit, static_argnames=("image_size",))
def _color_sums(pix: jnp.ndarray, color: jnp.ndarray, image_size: int):
    """Integer per-pixel color sums + counts (exact: u8 inputs, u32 sums
    hold 2^24 points per pixel against the 100k node cap)."""
    npx = image_size * image_size
    sums = jnp.zeros((npx, 3), dtype=jnp.uint32)
    sums = sums.at[pix].add(color.astype(jnp.uint32))
    counts = jnp.zeros(npx, dtype=jnp.int32).at[pix].add(1)
    return sums, counts


# Scoped x64 (jax 0.9 removed the public jax.experimental.enable_x64; the
# config object itself is the context manager).
from jax._src.config import enable_x64 as _enable_x64  # noqa: E402


@functools.partial(jax.jit, static_argnames=("image_size",))
def _moment_sums(pix: jnp.ndarray, values: jnp.ndarray, image_size: int):
    """Per-pixel (count, sum, sum-of-squares) of an f64 value — the
    intensity mean and height-stddev moments.  Must be called under
    enable_x64 so `values` stays f64."""
    npx = image_size * image_size
    counts = jnp.zeros(npx, dtype=jnp.int32).at[pix].add(1)
    s1 = jnp.zeros(npx, dtype=values.dtype).at[pix].add(values)
    s2 = jnp.zeros(npx, dtype=values.dtype).at[pix].add(values * values)
    return counts, s1, s2


def xray_occupancy_device(keys: np.ndarray, image_size: int) -> np.ndarray:
    """Packed (pix * 2048 + z) keys -> per-pixel distinct-z-bucket counts
    (i32), bit-exact vs the host np.unique path."""
    if len(keys) == 0:
        return np.zeros(image_size * image_size, dtype=np.int32)
    out = _xray_occupancy(jnp.asarray(keys.astype(np.uint32)), image_size)
    return np.asarray(out)


def color_sums_device(pix: np.ndarray, color: np.ndarray, image_size: int):
    """-> (per-pixel u32 color sums (P, 3), counts (P,)), bit-exact."""
    npx = image_size * image_size
    if len(pix) == 0:
        return np.zeros((npx, 3), np.uint32), np.zeros(npx, np.int32)
    sums, counts = _color_sums(
        jnp.asarray(pix.astype(np.int32)), jnp.asarray(color), image_size
    )
    return np.asarray(sums), np.asarray(counts)


def moment_sums_device(pix: np.ndarray, values: np.ndarray, image_size: int):
    """-> (counts, sum, sum2) per pixel in f64 (bit-equal to the host's
    np.bincount sums — see the module exactness note)."""
    npx = image_size * image_size
    if len(pix) == 0:
        return (
            np.zeros(npx, np.int32), np.zeros(npx), np.zeros(npx),
        )
    with _enable_x64(True):
        counts, s1, s2 = _moment_sums(
            jnp.asarray(pix.astype(np.int32)),
            jnp.asarray(values.astype(np.float64)),
            image_size,
        )
        return (
            np.asarray(counts),
            np.asarray(s1, dtype=np.float64),
            np.asarray(s2, dtype=np.float64),
        )

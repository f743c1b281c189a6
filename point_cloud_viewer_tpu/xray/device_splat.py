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
  association may differ from numpy's sequential bincount; the sums are
  nevertheless EXACT (no rounding anywhere, hence order-independent and
  bit-equal to the host) PROVIDED each summand is itself exact in <= 53
  mantissa bits with bounded exponent span — true for f32-precision
  intensities and for heights quantized to a fixed step (e.g. 1/64 m:
  z and z*z are then small dyadic rationals).  For FULL-f64 heights the
  z*z products round, so device and host sums can differ in the last ulp
  and the u8 image by 1 LSB at colormap boundaries — the same
  nondeterminism class as the reference's own parallel point-arrival
  order (its rayon iterator feeds each tile's OnlineStats in
  nondeterministic order, generation.rs:365-405).  tools/fuzz_xray.py
  asserts bit-equality under the precondition and <= 1 LSB outside it.

Host discretization (generation.discretize, f64) is kept — quantization
must be bit-exact with the reference — the device runs the O(N) reduction,
which is where the time goes.

Binned (pixel, bin) keys are dynamic-width, so no dense output exists;
binned_run_reduce_device instead sorts (pixel, bin, values) on device and
scatter-adds each run's values keyed on the run index — per-run partial
sums, the same exactness class as the host's per-group bincount —
returning per-run sums/counts; the (tiny) mean-over-bins epilogue stays on
host in the host path's exact iteration order.
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
    # Packed keys are pix * 2048 + z; the u32 cast below silently wraps for
    # image_size > 1448 (2^32 / 2048 = 2,097,152 pixels), which would break
    # the documented bit-equality with the host int64 np.unique path.
    if image_size * image_size * _Z_KEYS > 2**32:
        raise ValueError(
            f"xray_occupancy_device: image_size {image_size} overflows the "
            f"packed u32 (pixel, z) keyspace (max 1448); use the host path"
        )
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


@jax.jit
def _binned_run_reduce(pix, bins, *val_cols):
    """Sort (pix, bin) pairs carrying C value columns; per-run counts and
    value sums via SCATTER-ADD keyed on the run index.  Each run
    accumulates only its own values, so partial sums are bounded by the
    run's magnitude — the same exactness class as the host's per-group
    np.bincount (a global cumsum-difference formulation was rejected: its
    partial sums span the WHOLE tile, a materially weaker condition that
    breaks bit-equality on wide-range f32 intensities).  Runs appear in
    lexicographic (pix, bin) order, matching np.unique(key, axis=0)."""
    n = pix.shape[0]
    sorted_ = jax.lax.sort((pix, bins) + val_cols, num_keys=2)
    pix_s, bins_s = sorted_[0], sorted_[1]
    vals_s = jnp.stack(sorted_[2:], axis=1)  # (N, C)
    starts = jnp.concatenate(
        [
            jnp.ones(1, bool),
            (pix_s[1:] != pix_s[:-1]) | (bins_s[1:] != bins_s[:-1]),
        ]
    )
    seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1  # run index, 0..K-1
    run_sums = jnp.zeros((n, vals_s.shape[1]), vals_s.dtype).at[seg_id].add(
        vals_s
    )
    run_counts = jnp.zeros(n, jnp.int64).at[seg_id].add(1)
    return pix_s, starts, run_counts, run_sums


def binned_run_reduce_device(pix: np.ndarray, bins: np.ndarray,
                             vals: np.ndarray):
    """Device reduction for the dynamic-width binned keyspace:
    -> (run pixels (K,), run counts (K,), run value sums (K, C)) grouped by
    (pixel, bin) in lexicographic order — exactly np.unique(key, axis=0)'s
    grouping, with sums bit-equal to the host's np.bincount sums whenever
    those per-group sums are exact (u8 colors always; f32-precision
    intensities under the module's per-group exponent-span condition)."""
    c = vals.shape[1]
    if len(pix) == 0:
        return (
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty((0, c), np.float64),
        )
    with _enable_x64(True):
        out = _binned_run_reduce(
            jnp.asarray(pix.astype(np.int64)),
            jnp.asarray(bins.astype(np.int64)),
            *(jnp.asarray(vals[:, i].astype(np.float64)) for i in range(c)),
        )
        pix_s, starts, counts, sums = (np.asarray(a) for a in out)
    m = starts.astype(bool)
    k = int(m.sum())
    # Runs occupy the [0, K) prefix of the scatter targets, in the same
    # lexicographic order as the start positions.
    return pix_s[m].astype(np.int64), counts[:k], sums[:k]


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

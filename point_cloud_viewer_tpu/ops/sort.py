"""Device-side spatial sort: the octree builder's heavy stage on TPU.

The host quantizes positions to u32 grid cells with full f64 precision
(cheap, bandwidth-bound); the device interleaves Morton bits and runs the
O(N log N) lexicographic sort over (hi, lo) u32 key pairs with
jax.lax.sort — XLA's native TPU sort — carrying the permutation index.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import morton


@jax.jit
def _encode_and_sort(cells: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    hi, lo = morton.morton_encode_device(cells)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (cells.shape[0], 1), 0).squeeze(-1)
    return jax.lax.sort((hi, lo, idx), num_keys=3, is_stable=False)


def morton_sort_device(cells: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, 3) u32 cells -> (codes_sorted u64, order int64), computed on the
    default JAX device. Bit-identical to the host numpy path."""
    hi, lo, idx = _encode_and_sort(jnp.asarray(cells))
    hi, lo, idx = np.asarray(hi), np.asarray(lo), np.asarray(idx)
    return morton.join_u64(hi, lo), idx.astype(np.int64)


def morton_sort_host(cells: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    codes = morton.morton_encode(cells)
    order = np.argsort(codes, kind="stable")
    return codes[order], order

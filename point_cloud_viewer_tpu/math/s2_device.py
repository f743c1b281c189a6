"""Device (TPU) S2 leaf-cell assignment + cell-union membership.

The point -> leaf-cell-id pipeline is trig-free: face selection is an
argmax, (u, v) are single IEEE divisions, the quadratic ST reprojection is
one sqrt, and the Hilbert traversal is integer table lookups — every step
is either exact integer math or a correctly-rounded IEEE f64 primitive
(div, sqrt), so the device ids are bit-equal to math/s2.py's host ids (no
libm transcendentals anywhere, unlike WebMercator's atan/exp — which is
why THAT filter stays host-only).  Union membership is then a pure integer
id-range compare (s2_cells/cell_union.py::contains_cell_ids), mirrored
here as the same searchsorted.

Reference semantics: CellUnion as PointCulling
(/root/reference/src/geometry/s2_cell_union.rs:27-31, point -> CellID via
/root/reference/src/math/mod.rs:115-124); SURVEY §7.5-7.6 asks for this
filter on device.

All kernels run under scoped x64 (the xray/device_splat.py pattern); u64
id math is emulated on TPU but exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import s2

# Host constants only at module level (jnp constants would commit to the
# import-time default device — see relay-fragility note in CLAUDE.md).
_LOOKUP_POS_HOST = s2._LOOKUP_POS.astype(np.int32)  # 1024 entries, 10 bits


@jax.jit
def _leaf_ids(p):
    """(N, 3) f64 ECEF/directions -> (N,) uint64 leaf (level-30) cell ids.

    Mirrors s2.leaf_cell_ids_from_points operation-for-operation:
    xyz_to_face_uv (argmax face pick, first-max tie-break like np.argmax),
    uv_to_st (quadratic, one sqrt), st_to_ij (scale + floor + clip), then
    the 4-bit Hilbert lookup loop of cell_id_from_face_ij."""
    ax = jnp.abs(p)
    axis = jnp.argmax(ax, axis=-1)  # first max on ties, same as np.argmax
    major = jnp.take_along_axis(p, axis[:, None], axis=1)[:, 0]
    face = jnp.where(major >= 0, axis, axis + 3).astype(jnp.int32)
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    # All six face projections computed unconditionally, then selected:
    # unselected lanes may hold inf/nan from zero divisors — never chosen
    # (matches the host's masked per-face assignment).  Table is
    # s2.xyz_to_face_uv's exactly.
    u_all = jnp.stack([y / x, -x / y, -x / z, z / x, z / y, -y / z], axis=0)
    v_all = jnp.stack([z / x, z / y, -y / z, y / x, -x / y, -x / z], axis=0)
    n = p.shape[0]
    rows = jnp.arange(n)
    u = u_all[face, rows]
    v = v_all[face, rows]

    def uv_to_st(w):
        pos = 0.5 * jnp.sqrt(jnp.maximum(1.0 + 3.0 * w, 0.0))
        neg = 1.0 - 0.5 * jnp.sqrt(jnp.maximum(1.0 - 3.0 * w, 0.0))
        return jnp.where(w >= 0.0, pos, neg)

    def st_to_ij(s):
        scaled = jnp.floor(s * (1 << s2.MAX_LEVEL))
        return jnp.clip(scaled, 0, (1 << s2.MAX_LEVEL) - 1).astype(jnp.int64)

    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))

    lookup_pos = jnp.asarray(_LOOKUP_POS_HOST)
    cid = face.astype(jnp.uint64) << jnp.uint64(s2.POS_BITS - 1)
    bits = (face & s2._SWAP).astype(jnp.int32)
    mask = (1 << s2._LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits = bits + (
            ((i >> (k * s2._LOOKUP_BITS)) & mask) << (s2._LOOKUP_BITS + 2)
        ).astype(jnp.int32)
        bits = bits + (((j >> (k * s2._LOOKUP_BITS)) & mask) << 2).astype(
            jnp.int32
        )
        bits = lookup_pos[bits]
        cid = cid | (
            (bits >> 2).astype(jnp.uint64)
            << jnp.uint64(k * 2 * s2._LOOKUP_BITS)
        )
        bits = bits & (s2._SWAP | s2._INVERT)
    return cid * jnp.uint64(2) + jnp.uint64(1)


@jax.jit
def _union_mask(p, range_min, range_max):
    """(N, 3) f64 points + sorted (K,) u64 cell ranges -> (N,) bool keep.
    The searchsorted mirrors CellUnion.contains_cell_ids exactly."""
    ids = _leaf_ids(p)
    pos = jnp.searchsorted(range_min, ids, side="right") - 1
    k = range_min.shape[0]
    pos_clamped = jnp.clip(pos, 0, max(k - 1, 0))
    return (pos >= 0) & (ids <= range_max[pos_clamped])

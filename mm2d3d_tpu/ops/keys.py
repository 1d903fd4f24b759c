"""Pair-key machinery for sparse voxel grids.

TPU/XLA-friendly replacement for SparseConvNet's coordinate hash maps
(reference: SparseConvNet InputLayer / rulebook build, used from
``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/3d_net/scn_unet.py:113``).

A voxel site is identified by (batch, x, y, z) with x, y, z < full_scale
(4096 in the reference config).  4096^3 * B does not fit an int32, and TPUs
have no fast int64, so we identify a site by a *pair* of int32 keys holding
(batch, morton(x, y, z)) — the 36-bit z-order/Morton interleave of the
coordinates, batch-major:

    hi = (batch << 6) | morton_bits[30:36]
    lo = morton_bits[0:30]

Pairs are ordered lexicographically ((hi, lo) tuples), which equals
(batch, morton) order.  Morton order is chosen over plain (b, x, y, z)
lexicographic order because right-shifting coordinates preserves it:
``morton(c >> 1) == morton(c) >> 3``, so every stride-2 coarsening of a
sorted voxel table is ALREADY SORTED — the U-Net grid hierarchy needs one
point sort at level 0 and zero sorts afterwards (sorts and scatters are the
expensive ops on TPU).  A parent's 8 children also occupy one contiguous
row range.  All grid machinery (dedup, neighbor lookup, parent/child maps)
reduces to sorted segment ops and vectorized binary search over the sorted
table — everything static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sentinel for invalid/padding entries; sorts after every real key.
INVALID = jnp.iinfo(jnp.int32).max


def _part1by2(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of uint32 `v` to bit positions 0,3,...,27."""
    v = v & jnp.uint32(0x3FF)
    v = (v ^ (v << 16)) & jnp.uint32(0xFF0000FF)
    v = (v ^ (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v ^ (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v ^ (v << 2)) & jnp.uint32(0x09249249)
    return v


def pack(coords: jax.Array, batch: jax.Array, full_scale: int = 0):
    """Pack integer voxel coords (..., 3) + batch index (...) into pair keys.

    Keys are (batch, morton(x, y, z)); see module docstring.  Coordinates
    must be in [0, 4096) (12 bits); `full_scale` is accepted for signature
    stability but unused.  Does not validate ranges; callers must mask
    out-of-range entries.
    """
    x = coords[..., 0].astype(jnp.uint32)
    y = coords[..., 1].astype(jnp.uint32)
    z = coords[..., 2].astype(jnp.uint32)
    lo = (
        _part1by2(z)
        | (_part1by2(y) << 1)
        | (_part1by2(x) << 2)
    )  # low 30 morton bits
    hi6 = (
        _part1by2(z >> 10)
        | (_part1by2(y >> 10) << 1)
        | (_part1by2(x >> 10) << 2)
    )  # morton bits 30..35
    hi = (batch.astype(jnp.uint32) << 6) | hi6
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def batch_of(hi: jax.Array) -> jax.Array:
    """Batch index from the hi key."""
    return hi >> 6


def _compact1by2(v: jax.Array) -> jax.Array:
    """Inverse of `_part1by2`: collect bits 0,3,...,27 into the low 10 bits."""
    v = v & jnp.uint32(0x09249249)
    v = (v ^ (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v ^ (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v ^ (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v ^ (v >> 16)) & jnp.uint32(0x3FF)
    return v


def unpack(hi: jax.Array, lo: jax.Array):
    """Inverse of `pack`: pair keys -> (coords (..., 3) int32, batch int32).

    Pure bit arithmetic (fuses into any consumer graph) — lets dedup avoid
    carrying coordinates through segment reductions: the key IS the
    coordinate.  Output is garbage on INVALID keys; callers mask.
    """
    lo_u = lo.astype(jnp.uint32)
    hi_u = hi.astype(jnp.uint32) & jnp.uint32(0x3F)  # morton bits 30..35
    x = _compact1by2(lo_u >> 2) | (_compact1by2(hi_u >> 2) << 10)
    y = _compact1by2(lo_u >> 1) | (_compact1by2(hi_u >> 1) << 10)
    z = _compact1by2(lo_u) | (_compact1by2(hi_u) << 10)
    coords = jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
    return coords, batch_of(hi)


def mask_invalid(hi: jax.Array, lo: jax.Array, valid: jax.Array):
    """Replace keys of invalid entries with the INVALID sentinel."""
    hi = jnp.where(valid, hi, INVALID)
    lo = jnp.where(valid, lo, INVALID)
    return hi, lo


def lexsort_pairs(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Permutation sorting pair keys lexicographically ((hi, lo) ascending).

    ONE `lax.sort` pass with num_keys=2 (the comparator reads both keys)
    instead of jnp.lexsort's two chained stable sorts — sorts are ~1.3 ms
    at the flagship point count, so the second pass is worth removing.
    """
    iota = jnp.arange(hi.shape[0], dtype=jnp.int32)
    _, _, perm = jax.lax.sort((hi, lo, iota), num_keys=2, is_stable=True)
    return perm


def pairs_less(hi_a, lo_a, hi_b, lo_b):
    return (hi_a < hi_b) | ((hi_a == hi_b) & (lo_a < lo_b))


def pairs_equal(hi_a, lo_a, hi_b, lo_b):
    return (hi_a == hi_b) & (lo_a == lo_b)


def searchsorted_pairs(
    hi_sorted: jax.Array,
    lo_sorted: jax.Array,
    hi_query: jax.Array,
    lo_query: jax.Array,
) -> jax.Array:
    """Leftmost insertion index of each query pair into a sorted pair table.

    Vectorized branchless binary search: log2(V)+1 rounds of two gathers.
    Equivalent of the hash-map probe in SparseConvNet's rulebook builder,
    recast as search over a sorted static table (cf. Minuet's sorted-key
    design, arXiv:2401.06145).
    """
    n = hi_sorted.shape[0]
    # static trip count: ceil(log2(n)) + 1
    steps = max(1, (n - 1).bit_length() + 1) if n > 0 else 1

    # TPU perf note: 1-D scalar gathers lower to a slow path; 2-D row
    # gathers are ~10x faster.  Probe both keys with one row gather.
    keys2 = jnp.stack([hi_sorted, lo_sorted], axis=1)  # (n, 2)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        kp = keys2[jnp.minimum(mid, n - 1)]  # (..., 2) row gather
        less = pairs_less(kp[..., 0], kp[..., 1], hi_query, lo_query)
        return jnp.where(less, mid + 1, lo_b), jnp.where(less, hi_b, mid)

    lo_b = jnp.zeros(hi_query.shape, jnp.int32)
    hi_b = jnp.full(hi_query.shape, n, jnp.int32)
    lo_b, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    return lo_b


def lookup_pairs(
    hi_sorted: jax.Array,
    lo_sorted: jax.Array,
    hi_query: jax.Array,
    lo_query: jax.Array,
    missing: int,
) -> jax.Array:
    """Exact-match lookup: index of each query in the sorted table or `missing`."""
    n = hi_sorted.shape[0]
    idx = searchsorted_pairs(hi_sorted, lo_sorted, hi_query, lo_query)
    idx_c = jnp.minimum(idx, n - 1)
    keys2 = jnp.stack([hi_sorted, lo_sorted], axis=1)
    kp = keys2[idx_c]
    found = pairs_equal(kp[..., 0], kp[..., 1], hi_query, lo_query)
    found &= hi_query != INVALID
    return jnp.where(found, idx_c, missing)

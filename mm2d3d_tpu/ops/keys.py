"""Pair-key machinery for sparse voxel grids.

TPU/XLA-friendly replacement for SparseConvNet's coordinate hash maps
(reference: SparseConvNet InputLayer / rulebook build, used from
``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/3d_net/scn_unet.py:113``).

A voxel site is identified by (batch, x, y, z) with x, y, z < full_scale
(4096 in the reference config).  4096^3 * B does not fit an int32, and TPUs
have no fast int64, so we identify a site by a *pair* of int32 keys:

    hi = batch * full_scale + x          (fits easily: B * 4096 + 4095)
    lo = y * full_scale + z              (< 2^24 for full_scale = 4096)

Pairs are ordered lexicographically ((hi, lo) tuples).  All grid machinery
(dedup, neighbor lookup, parent/child maps) reduces to sorting pair keys and
vectorized binary search over the sorted table — everything static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sentinel for invalid/padding entries; sorts after every real key.
INVALID = jnp.iinfo(jnp.int32).max


def pack(coords: jax.Array, batch: jax.Array, full_scale: int):
    """Pack integer voxel coords (..., 3) + batch index (...) into pair keys.

    Does not validate ranges; callers must mask out-of-range entries.
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    hi = batch * full_scale + x
    lo = y * full_scale + z
    return hi, lo


def mask_invalid(hi: jax.Array, lo: jax.Array, valid: jax.Array):
    """Replace keys of invalid entries with the INVALID sentinel."""
    hi = jnp.where(valid, hi, INVALID)
    lo = jnp.where(valid, lo, INVALID)
    return hi, lo


def lexsort_pairs(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Permutation sorting pair keys lexicographically ((hi, lo) ascending)."""
    return jnp.lexsort((lo, hi))


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

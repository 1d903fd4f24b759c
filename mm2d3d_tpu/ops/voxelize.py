"""Static-shape voxelization (SparseConvNet InputLayer/OutputLayer equivalent).

Reference semantics (`scn.InputLayer(3, full_scale, mode=4)` +
`scn.OutputLayer(3)`, used at
``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/3d_net/scn_unet.py:113,117``):

- InputLayer deduplicates integer point coordinates into unique voxel sites;
  mode=4 averages the features of all points falling into the same voxel and
  remembers the point->voxel map.
- OutputLayer maps voxel features back to the original points via that map.

TPU-native design: no hash maps.  We sort (batch, x, y, z) pair keys
(`ops.keys`), mark segment starts, and use sorted segment ops — everything
has static shapes.  Invalid/padding points are routed to a dump row.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from . import keys as K


@struct.dataclass
class VoxelGrid:
    """A deduplicated, sorted voxel table with the point->voxel map.

    Rows [0, num_voxels) are valid and sorted by pair key ascending; the
    remaining rows are padding (key == INVALID).  ``p2v`` maps each input
    point to its voxel row, or to ``capacity`` (the dump row) for invalid
    points.
    """

    key_hi: jax.Array  # (V,) int32, sorted, INVALID on padding rows
    key_lo: jax.Array  # (V,) int32
    coords: jax.Array  # (V, 3) int32 voxel coordinates (0 on padding rows)
    batch: jax.Array  # (V,) int32 batch index (-1 on padding rows)
    valid: jax.Array  # (V,) bool
    num_voxels: jax.Array  # () int32
    p2v: jax.Array  # (P,) int32 in [0, V]; V = dump row
    counts: jax.Array  # (V,) int32 points per voxel
    full_scale: int = struct.field(pytree_node=False)
    # The key-sort permutation and the voxel id per SORTED point (level-0
    # grids only).  Lets `pool_features` run as gather-by-perm + SORTED
    # segment sum instead of a point-order scatter-add — scatters are the
    # slowest descriptor-bound op on this chip (~4x a gather row).
    sort_perm: Optional[jax.Array] = None  # (P,) int32
    seg_sorted: Optional[jax.Array] = None  # (P,) int32 in [0, V], MONOTONE
    # Validity of each SORTED row.  seg_sorted ids are nondecreasing (the
    # indices_are_sorted contract) — invalid rows inherit the previous
    # segment id instead of jumping to the dump row — so pooling must mask
    # their VALUES with this instead of relying on the dump row.
    valid_sorted: Optional[jax.Array] = None  # (P,) bool

    @property
    def capacity(self) -> int:
        return self.key_hi.shape[0]


def voxelize(
    coords: jax.Array,
    batch: jax.Array,
    valid: jax.Array,
    full_scale: int,
    capacity: Optional[int] = None,
    presorted: bool = False,
) -> VoxelGrid:
    """Deduplicate integer coords into a sorted voxel table.

    Args:
      coords: (P, 3) int32 voxel coordinates, expected in [0, full_scale).
      batch: (P,) int32 batch index per point.
      valid: (P,) bool mask of real points.
      full_scale: spatial extent (power of two).
      capacity: number of voxel rows (default P).  Must be >= the true number
        of unique voxels; excess unique voxels beyond capacity are dropped
        (their points map to the dump row).
      presorted: points are ALREADY (batch, morton)-sorted with each
        sample's invalid/out-of-range points at its tail (the loaders'
        host-side `data.base.morton_sort_perm` layout).  Skips the device
        sort and the p2v inversion scatter (~2.5 ms/step at the flagship
        size); mode-4 pooling also drops its permutation gather.
        Per-sample invalid RUNS between samples are fine (keys never
        repeat across the run), but an invalid point BETWEEN two equal
        keys of one sample would split that voxel — the host layout rules
        this out.
    """
    p = coords.shape[0]

    in_range = (coords >= 0).all(-1) & (coords < full_scale).all(-1)
    valid = valid & in_range

    hi, lo = K.pack(coords, batch, full_scale)
    hi, lo = K.mask_invalid(hi, lo, valid)

    if presorted:
        return _dedup(
            hi, lo, coords, full_scale, capacity, perm=None, with_counts=True
        )
    perm = K.lexsort_pairs(hi, lo)
    return _dedup(
        hi[perm], lo[perm], coords[perm], full_scale, capacity, perm=perm
    )


def dedup_sorted(
    hi: jax.Array,
    lo: jax.Array,
    coords: jax.Array,
    full_scale: int,
    capacity: Optional[int] = None,
) -> VoxelGrid:
    """`voxelize` for inputs whose pair keys are ALREADY sorted ascending
    (INVALID-keyed rows last) — skips the sort and the p2v inversion scatter.

    Used for stride-2 coarsening: Morton keys of a sorted table's
    right-shifted coords are sorted by construction (see `ops.keys`).
    The returned grid's `counts` are zeros (unused above level 0).
    """
    return _dedup(
        hi, lo, coords, full_scale, capacity, perm=None, with_counts=False
    )


# Key-scatter dedup: build the voxel key table with ONE unique-indices value
# scatter of the packed (hi, lo) pairs at segment starts, and DECODE coords
# and batch from the key (`keys.unpack`) instead of carrying them through
# three scatter-min segment reductions.  The earlier "gather-at-segment-
# starts" variant (narrow index scatter + packed row gather) measured 27
# scans/s SLOWER in the fused forward; this form has no gather and the
# decode is pure fusable bit arithmetic.
_KEY_SCATTER_DEDUP = True


def _dedup(hs, ls, coords_s, full_scale, capacity, perm, with_counts=True):
    p = hs.shape[0]
    v_cap = capacity if capacity is not None else p
    valid_s = hs != K.INVALID

    # segment starts via slice-shift (a gather-by-index here costs ~1 ms of
    # descriptor-bound rows at the flagship size)
    prev_hi = jnp.concatenate([hs[:1] - 1, hs[:-1]])
    prev_lo = jnp.concatenate([ls[:1] - 1, ls[:-1]])
    is_new = ((hs != prev_hi) | (ls != prev_lo)) & valid_s

    seg_raw = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    num_voxels = jnp.sum(is_new.astype(jnp.int32))
    # invalid points and overflow voxels -> dump row v_cap (point->voxel map)
    seg = jnp.where(valid_s & (seg_raw < v_cap) & (seg_raw >= 0), seg_raw, v_cap)

    # Segment ids for the SORTED segment ops.  These must be nondecreasing
    # for indices_are_sorted=True to hold — and `seg` is NOT when invalid
    # runs sit mid-sequence (the presorted loaders' per-sample layout:
    # each sample's padding tail precedes the next sample's keys).  The
    # sorted-scatter hint is a real contract on TPU: violating it silently
    # corrupts the table (CPU happens to ignore it, which is why CPU tests
    # passed while the TPU build collapsed coarse levels ~10x).  So the
    # segment ops use monotone ids — invalid rows INHERIT the previous
    # segment id — and their VALUES are masked to the op identity instead
    # (keys are already INVALID=int32max, the min identity; coords masked
    # up; counts sum valid_s).
    seg_m = jnp.minimum(jnp.maximum(seg_raw, 0), v_cap)
    coords_m = jnp.where(valid_s[:, None], coords_s, jnp.iinfo(jnp.int32).max)

    nseg = v_cap + 1
    row_valid = jnp.arange(v_cap) < jnp.minimum(num_voxels, v_cap)
    if _KEY_SCATTER_DEDUP:
        # ONE unique-indices value scatter of the packed key pairs at
        # segment starts; coords/batch are then DECODED from the key.
        # Non-start rows each get a DISTINCT out-of-bounds dump index
        # (v_cap + row) so the index vector is unique by construction —
        # XLA documents scatter as undefined for duplicate indices under
        # unique_indices=True, even dropped ones — and the scatter still
        # lowers to plain stores, not read-modify-write minima.
        dst = jnp.where(
            is_new & (seg_raw < v_cap),
            seg_raw,
            v_cap + jnp.arange(p, dtype=jnp.int32),
        )
        packed = jnp.stack([hs, ls], axis=1)  # (P, 2)
        table = (
            jnp.full((v_cap, 2), K.INVALID, jnp.int32)
            .at[dst].set(packed, mode="drop", unique_indices=True)
        )
        key_hi, key_lo = table[:, 0], table[:, 1]
        vox_coords, vox_batch = K.unpack(key_hi, key_lo)
    else:
        # NB: a scatter-min("first row per segment") + packed-row-gather
        # formulation is ~27% faster when the topology is jitted ALONE, but
        # ~10 ms/step SLOWER inside the fused forward: XLA fuses these
        # segment ops with the surrounding graph, the scatter+gather pair it
        # cannot (same finding as the round-1 wide-row-scatter experiment;
        # in-graph timings are what count).
        key_hi = jax.ops.segment_min(
            hs, seg_m, num_segments=nseg, indices_are_sorted=True
        )[:v_cap]
        key_lo = jax.ops.segment_min(
            ls, seg_m, num_segments=nseg, indices_are_sorted=True
        )[:v_cap]
        vox_coords = jax.ops.segment_min(
            coords_m, seg_m, num_segments=nseg, indices_are_sorted=True
        )[:v_cap]
        vox_batch = K.batch_of(key_hi)

    vox_coords = jnp.where(row_valid[:, None], vox_coords, 0)
    vox_batch = jnp.where(row_valid, vox_batch, -1)

    if with_counts:
        counts = jax.ops.segment_sum(
            valid_s.astype(jnp.int32), seg_m, num_segments=nseg,
            indices_are_sorted=True,
        )[:v_cap]
    else:
        # Points-per-voxel is only consumed by mode-4 pooling at level 0;
        # grid-hierarchy levels skip it.
        counts = jnp.zeros((v_cap,), jnp.int32)

    if perm is None:
        p2v = seg  # rows were already in table order
    else:
        p2v = jnp.zeros((p, 1), jnp.int32).at[perm].set(seg[:, None])[:, 0]

    # Pin the table: its fields are read by many downstream consumers
    # (neighbor propagation, transitions, convs); without the barrier XLA's
    # fusion can re-run the cumsum/segment chain inside each of them.
    (key_hi, key_lo, vox_coords, vox_batch, row_valid, p2v, counts, seg_m,
     valid_s) = jax.lax.optimization_barrier(
        (key_hi, key_lo, vox_coords, vox_batch, row_valid, p2v, counts,
         seg_m, valid_s)
    )

    return VoxelGrid(
        key_hi=key_hi,
        key_lo=key_lo,
        coords=vox_coords,
        batch=vox_batch.astype(jnp.int32),
        valid=row_valid,
        num_voxels=jnp.minimum(num_voxels, v_cap),
        p2v=p2v,
        counts=counts,
        full_scale=full_scale,
        sort_perm=perm,
        # with_counts marks level-0 use: keep the sorted segment ids so
        # mode-4 pooling can run as a SORTED segment sum (presorted inputs
        # need no permutation gather at all)
        seg_sorted=seg_m if (perm is not None or with_counts) else None,
        valid_sorted=valid_s if (perm is not None or with_counts) else None,
    )


def pool_features(grid: VoxelGrid, feats: jax.Array, mode: str = "mean") -> jax.Array:
    """Pool per-point features into voxel rows (InputLayer mode=4 -> "mean")."""
    v = grid.capacity
    if grid.seg_sorted is not None:
        # SORTED segment sum — ~2x a point-order scatter-add (scatter rows
        # cost ~4x gather rows).  Presorted grids (sort_perm None) skip the
        # permutation gather too: points already sit in key order.
        fs = (
            feats
            if grid.sort_perm is None
            else jnp.take(feats, grid.sort_perm, axis=0)
        )
        # seg_sorted is monotone (invalid rows inherit the previous
        # segment); mask invalid rows' values instead of dump-routing them.
        if grid.valid_sorted is not None:
            fs = jnp.where(grid.valid_sorted[:, None], fs, 0)
        total = jax.ops.segment_sum(
            fs, grid.seg_sorted, num_segments=v + 1, indices_are_sorted=True
        )[:v]
    else:
        total = jax.ops.segment_sum(feats, grid.p2v, num_segments=v + 1)[:v]
    if mode == "sum":
        return total
    if mode == "mean":
        denom = jnp.maximum(grid.counts, 1).astype(feats.dtype)[:, None]
        return total / denom
    raise ValueError(f"unknown pooling mode {mode!r}")


def unpool_features(grid: VoxelGrid, voxel_feats: jax.Array) -> jax.Array:
    """Gather voxel features back to points (OutputLayer). Invalid -> zeros."""
    padded = jnp.concatenate(
        [voxel_feats, jnp.zeros((1, voxel_feats.shape[-1]), voxel_feats.dtype)], 0
    )
    return padded[grid.p2v]

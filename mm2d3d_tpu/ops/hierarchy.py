"""Sparse-grid hierarchy: per-level voxel tables + static rulebooks.

TPU-native replacement for SparseConvNet's per-layer hash-map/rulebook
machinery (`scn.SubmanifoldConvolution` / `scn.Convolution` /
`scn.Deconvolution`, cf.
``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/3d_net/scn_unet.py:26-87``).

Key design idea: all irregular index computation is hoisted into ONE
hierarchy build per step.  Each U-Net level gets

- a sorted voxel table (``GridLevel``),
- a 27-neighbor index table ``nbr`` (V, 27) shared by every submanifold
  conv at that level (SCN rebuilds its rulebook per layer; here it is
  computed once and reused), and
- parent/child maps between adjacent levels for the strided conv /
  deconv pair (``LevelTransition``).

The convolutions themselves (`ops.spconv`) are then pure dense
gather->matmul ops that XLA maps onto the MXU.
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import keys as K
from .voxelize import VoxelGrid, dedup_sorted, voxelize

# Fixed kernel-offset orderings (define the weight layouts of spconv ops).
OFFSETS_27 = np.array(
    list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.int32
)  # (27, 3), lexicographic; index 13 is the center (0,0,0)
OFFSETS_8 = np.array(
    list(itertools.product((0, 1), repeat=3)), dtype=np.int32
)  # (8, 3); off_id = 4*dx + 2*dy + dz


@struct.dataclass
class GridLevel:
    key_hi: jax.Array  # (V,) int32 sorted pair keys
    key_lo: jax.Array  # (V,) int32
    coords: jax.Array  # (V, 3) int32
    batch: jax.Array  # (V,) int32
    valid: jax.Array  # (V,) bool
    num_voxels: jax.Array  # () int32
    nbr: jax.Array  # (27, V) int32 in [0, V]; V = missing neighbor.
    # Tap-major (V minor) so per-tap rows are dense vector lanes — both the
    # conv gathers and the octree propagation read it this way.
    full_scale: int = struct.field(pytree_node=False)
    # Slot-compacted form of `nbr` (see `build_slots` / `build_slots_split`):
    # per voxel, the first `H` off-center hits as (source row, tap id).
    # Consumed by the slot-compacted submanifold conv (`ops.spconv` /
    # `ops.pallas.bandmm`); None = use the dense 27-tap path.
    slot_src: Optional[jax.Array] = None  # (H, V) int32 in [0, V]; V = empty
    slot_tap: Optional[jax.Array] = None  # (H, V) int32 in [0, 27); 27 = empty
    slot_overflow: Optional[jax.Array] = None  # () int32 dropped-hit count
    # Split-phase extension (`build_slots_split`): the few voxels with more
    # than H hits are compacted into `slot_idx` and get a second slot table
    # — the common case gathers only H rows/voxel while heavy voxels stay
    # exact (hits are only dropped past h_max / the slot_idx capacity, both
    # monitored via slot_overflow).
    slot_idx: Optional[jax.Array] = None  # (Vh,) int32 in [0, V]; V = pad
    slot_src2: Optional[jax.Array] = None  # (H2, Vh) int32 in [0, V]
    slot_tap2: Optional[jax.Array] = None  # (H2, Vh) int32
    # Optional MIDDLE tier (`build_slots_tiered`, 3-tier form): hit counts
    # are so skewed (mean ~2.4, p90 ~6, max ~18 at level 0) that two tiers
    # still waste gather rows — tier 1 sized near the MEAN, a mid tier for
    # the ~10-25% of voxels past it, and the hi tier for the far tail cuts
    # conv gather rows ~40% vs the 2-tier split.
    slot_idxm: Optional[jax.Array] = None  # (Vm,) int32 in [0, V]; V = pad
    slot_invm: Optional[jax.Array] = None  # (V,) int32 in [0, Vm]; Vm = no
    # mid row — the inverse of slot_idxm, so the conv can GATHER the mid
    # tier's output rows instead of scatter-adding them (scatter rows cost
    # ~4x gather rows; the mid tier holds up to ~44% of V)
    slot_srcm: Optional[jax.Array] = None  # (Hm, Vm) int32 in [0, V]
    slot_tapm: Optional[jax.Array] = None  # (Hm, Vm) int32

    @property
    def capacity(self) -> int:
        return self.key_hi.shape[0]


@struct.dataclass
class LevelTransition:
    """Maps between a fine level (f) and the next coarser level (c)."""

    parent: jax.Array  # (Vf,) int32 in [0, Vc]; Vc = dump for invalid rows
    off_id: jax.Array  # (Vf,) int32 in [0, 8); child offset within parent
    child: jax.Array  # (Vc, 8) int32 in [0, Vf]; Vf = missing child
    # Split-phase slot compaction of `child` (`build_child_slots`): mean
    # child counts are ~1.5-2.2 of 8, so the strided down conv (and the
    # deconv adjoint) gather h_lo rows per parent instead of 8, with the
    # few heavier parents compacted into a second exact table (h_max = 8
    # structurally cannot drop; only the slot_idx capacity is monitored).
    cslot_src: Optional[jax.Array] = None  # (h_lo, Vc) int32; Vf = empty
    cslot_tap: Optional[jax.Array] = None  # (h_lo, Vc) int32 in [0, 8); 8 = empty
    cslot_idx: Optional[jax.Array] = None  # (Vh,) int32; Vc = pad
    cslot_src2: Optional[jax.Array] = None  # (8 - h_lo, Vh)
    cslot_tap2: Optional[jax.Array] = None
    cslot_overflow: Optional[jax.Array] = None  # () int32


@struct.dataclass
class Hierarchy:
    levels: Tuple[GridLevel, ...]
    transitions: Tuple[LevelTransition, ...]  # len = len(levels) - 1


def _offset_index(dx: int, dy: int, dz: int) -> int:
    return (dx + 1) * 9 + (dy + 1) * 3 + (dz + 1)


# Dense-map lookup is used when the full occupancy table fits comfortably
# in VMEM (fs^3 * batches entries of int32): gathers from a VMEM-resident
# table run ~10x faster than the 12-round binary search.
_DENSE_NBR_MAX_ENTRIES = 1 << 22  # 4M entries = 16 MB int32


def build_nbr(grid: VoxelGrid, num_batches: Optional[int] = None) -> jax.Array:
    """27-neighbor index table for submanifold 3x3x3 convolution.

    Generic sorted-table version: 26 exact-match lookups plus the trivial
    center column.  In the hierarchy build this runs ONLY at the coarsest
    (tiny) level — all finer levels get their tables by octree propagation
    (`propagate_nbr`), which is far cheaper than searching.  Also serves
    as the reference implementation for tests.

    Lookup strategy: if `num_batches` is given and the level's dense
    occupancy map (fs^3 * num_batches int32) fits in VMEM, ONE scatter of
    the active rows builds the map and the 26 probes become direct
    gathers; otherwise a batched binary search over the sorted Morton
    table (log2(V)+1 rounds of row gathers).
    """
    v = grid.capacity
    fs = grid.full_scale
    rows = jnp.arange(v, dtype=jnp.int32)

    offs = np.delete(OFFSETS_27, _offset_index(0, 0, 0), axis=0)  # (26, 3)
    qc = grid.coords[None, :, :] + jnp.asarray(offs)[:, None, :]  # (26, V, 3)
    ok = (
        grid.valid[None, :]
        & (qc >= 0).all(-1)
        & (qc < fs).all(-1)
    )

    if (
        num_batches is not None
        and fs <= 1024  # morton fits the lo key alone
        and fs ** 3 * num_batches <= _DENSE_NBR_MAX_ENTRIES
    ):
        cell_count = fs ** 3 * num_batches
        _, own_lo = K.pack(grid.coords, grid.batch, fs)
        own_flat = jnp.where(
            grid.valid, grid.batch * (fs ** 3) + own_lo, cell_count
        )
        # 2-D (N, 1) layout: row scatters/gathers, not the slow 1-D
        # scalar-gather path (cf. ops.keys.searchsorted_pairs note).
        # NB: no indices_are_sorted hint — grids from voxelize/dedup_sorted
        # are (batch, morton)-sorted, but build_nbr is also the generic
        # reference implementation and must stay correct on any grid; the
        # scatter is tiny at the levels where the dense map is used.
        dense = jnp.zeros((cell_count + 1, 1), jnp.int32).at[own_flat].set(
            (rows + 1)[:, None], unique_indices=False
        )
        _, q_lo = K.pack(qc, jnp.broadcast_to(grid.batch, (26, v)), fs)
        q_flat = jnp.where(
            ok, jnp.broadcast_to(grid.batch, (26, v)) * (fs ** 3) + q_lo,
            cell_count,
        )
        hit = jnp.take(dense, q_flat, axis=0)[..., 0] - 1  # -1 = missing
        # `ok` must mask the RESULT too: masked scatters and masked queries
        # share the dump cell, which holds a stale row index, not 0
        hit = jnp.where(ok & (hit >= 0), hit, v)
    else:
        q_hi, q_lo = K.pack(qc, jnp.broadcast_to(grid.batch, (26, v)), fs)
        q_hi, q_lo = K.mask_invalid(q_hi, q_lo, ok)
        hit = K.lookup_pairs(grid.key_hi, grid.key_lo, q_hi, q_lo, missing=v)

    cols = [None] * 27
    cols[_offset_index(0, 0, 0)] = jnp.where(grid.valid, rows, v)
    for j, (dx, dy, dz) in enumerate(offs.tolist()):
        cols[_offset_index(dx, dy, dz)] = hit[j]
    return jnp.stack(cols, axis=0)  # (27, V)


def build_slots(nbr: jax.Array, num_slots: int):
    """Compact the dense 27-neighbor table into per-voxel hit slots.

    LiDAR occupancy means only ~2-7 of the 26 off-center taps hit per voxel
    (measured; see PERFORMANCE.md), so the dense table wastes most of the
    conv's descriptor-bound gather rows on the zero pad row.  This packs
    each column's off-center hits into its first `num_slots` slots:

        slot_src[h, v] = nbr[k_h, v]   (the h-th hit's source row; V = empty)
        slot_tap[h, v] = k_h           (its tap id; 27 = empty)

    The center tap (k=13) is excluded — it is gather-free for the conv.
    Hits beyond `num_slots` are DROPPED (their count is returned for
    monitoring; size `num_slots` so this stays 0 — like the voxel-capacity
    schedule, it is a static-shape capacity knob, not an approximation
    that is expected to bind).

    Returns: (slot_src (H, V) int32, slot_tap (H, V) int32, dropped () int32).
    """
    v = nbr.shape[1]
    center = _offset_index(0, 0, 0)
    k_ids = [k for k in range(27) if k != center]
    off = jnp.asarray(np.delete(np.arange(27), center), jnp.int32)
    src, tap, cnt = _rank_slots(
        jnp.take(nbr, off, axis=0), v, num_slots, 0, k_ids=k_ids
    )
    dropped = jnp.sum(jnp.maximum(cnt - num_slots, 0))
    return src, tap, dropped



def _compact_indices(mask: jax.Array, cap: int, fill: int):
    """First `cap` indices where `mask`, in order; `fill` pads the tail.

    cumsum + one narrow scatter — jnp.nonzero(size=...) lowers to a full
    sort, which costs more than every other op in the slot builders.

    Returns (idx (cap,), inv (n,)): `inv[i]` is row i's position in the
    compacted table, or `cap` (the dump row) when i is not compacted —
    the inverse map, free to produce here, lets consumers GATHER compacted
    outputs back instead of scatter-adding them.
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    inv = jnp.where(mask & (pos < cap), pos, cap)
    idx = (
        jnp.full((cap + 1, 1), fill, jnp.int32)
        .at[inv].set(jnp.arange(n, dtype=jnp.int32)[:, None], mode="drop")
        [:cap, 0]
    )
    return idx, inv


def _rank_slots(nbr_k: jax.Array, miss: int, num_slots: int, rank0: int,
                k_ids: Optional[Sequence[int]] = None):
    """Pack each column's hits into its first `num_slots` slots, vectorized.

    `nbr_k`: (K, V) candidate table, `miss` marks an absent hit.  Instead of
    the K x H chain of data-dependent 1-D selects (hundreds of tiny
    sequential vector ops — measured ~4 ms per level at V=65k), compute
    each hit's slot index directly as its exclusive prefix count along k
    (`rank`, ONE 2-D cumsum), then extract slot h with a masked weighted
    reduction over the k axis — a handful of wide (K, V) ops with no
    dependency chain.

    Returns (src (H, V), tap (H, V), cnt (V,)): slot h of column v holds the
    (rank0 + h)-th hit in ascending-k order; `cnt` counts ALL hits (before
    slot truncation).  Empty slots: src = miss, tap = K (or the true k id's
    MISS value when `k_ids` maps rows to tap ids).
    """
    kk, v = nbr_k.shape
    hit = nbr_k != miss
    cnt = jnp.sum(hit.astype(jnp.int32), axis=0)
    # exclusive prefix count of hits along k
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=0) - hit.astype(jnp.int32)
    ids = jnp.asarray(
        list(range(kk)) if k_ids is None else list(k_ids), jnp.int32
    )[:, None]
    miss_tap = kk if k_ids is None else int(max(k_ids)) + 1
    src, tap = [], []
    for h in range(num_slots):
        m = (hit & (rank == rank0 + h)).astype(jnp.int32)  # (K, V)
        found = jnp.sum(m, axis=0)  # 0 or 1
        src.append(jnp.sum(nbr_k * m, axis=0) + (1 - found) * miss)
        tap.append(jnp.sum(ids * m, axis=0) + (1 - found) * miss_tap)
    return jnp.stack(src), jnp.stack(tap), cnt


def build_slots_split(nbr: jax.Array, h_lo: int, h_max: int, vh_cap: int):
    """Split-phase slot compaction: a dense `h_lo`-slot table for ALL voxels
    plus a compacted overflow table for the few voxels with more hits.

    LiDAR hit counts are heavily skewed (level 0: mean ~2.4, p99 ~7, tail to
    ~16+), so a single slot cap either wastes gather rows on the common case
    or drops tail hits (which invalidates gradients, cf. `train.batch
    .default_slot_caps`).  The split form gathers `h_lo` rows/voxel in phase
    one and routes voxels with more hits through a `vh_cap`-row compacted
    phase-two table, so the common case is cheap AND the tail stays exact up
    to `h_max` total hits per voxel.  Slot extraction uses the vectorized
    rank formulation (`_rank_slots`).

    Returns: (src1 (h_lo, V), tap1 (h_lo, V),
              idx_hi (vh_cap,) int32 — heavy-voxel rows, V = pad,
              src2 (h_max - h_lo, vh_cap), tap2 (same),
              dropped () int32 — hits beyond h_max or beyond vh_cap).
    """
    v = nbr.shape[1]
    center = _offset_index(0, 0, 0)
    k_ids = [k for k in range(27) if k != center]
    off = jnp.asarray(np.delete(np.arange(27), center), jnp.int32)
    nbr_off = jnp.take(nbr, off, axis=0)  # (26, V), center row removed

    # phase 1: the first h_lo hits of every column
    src1, tap1, cnt = _rank_slots(nbr_off, v, h_lo, 0, k_ids=k_ids)

    # phase 2: compact the heavy columns FIRST (one row gather of nbr^T),
    # then extract slots h_lo..h_max-1 on the small (Vh,)-wide table — the
    # deep extraction over all V columns would cost ~10x phase 1 for <2%
    # of voxels.
    heavy = cnt > h_lo
    idx_hi, _ = _compact_indices(heavy, vh_cap, v)
    nbr_rows = jnp.concatenate(
        [nbr_off.T, jnp.full((1, 26), v, jnp.int32)], 0
    )  # (V + 1, 26)
    nbr_hi = jnp.take(nbr_rows, idx_hi, axis=0).T  # (26, Vh)

    src2, tap2, _ = _rank_slots(nbr_hi, v, h_max - h_lo, h_lo, k_ids=k_ids)

    over_tail = jnp.sum(jnp.maximum(cnt - h_max, 0))
    # heavy voxels beyond the compaction capacity lose their phase-2 hits
    uncompacted = jnp.where(
        heavy & (jnp.cumsum(heavy.astype(jnp.int32)) > vh_cap),
        jnp.minimum(cnt, h_max) - h_lo,
        0,
    )
    dropped = over_tail + jnp.sum(uncompacted)
    return src1, tap1, idx_hi, src2, tap2, dropped


def _rank_slots_compacted(nbr_off, cnt, v, h_from, h_to, cap):
    """Slots [h_from, h_to) for the voxels with more than h_from hits,
    compacted to `cap` rows.  Returns (idx, inv, src, tap, n_uncompacted)."""
    heavy = cnt > h_from
    idx, inv = _compact_indices(heavy, cap, v)
    nbr_rows = jnp.concatenate(
        [nbr_off.T, jnp.full((1, nbr_off.shape[0]), v, jnp.int32)], 0
    )  # (V + 1, K)
    nbr_hi = jnp.take(nbr_rows, idx, axis=0).T  # (K, cap)
    src, tap, _ = _rank_slots(
        nbr_hi, v, h_to - h_from, h_from,
        k_ids=[k for k in range(27) if k != _offset_index(0, 0, 0)],
    )
    uncompacted = jnp.where(
        heavy & (jnp.cumsum(heavy.astype(jnp.int32)) > cap),
        jnp.minimum(cnt, h_to) - h_from,
        0,
    )
    return idx, inv, src, tap, jnp.sum(uncompacted)


def build_slots_tiered(
    nbr: jax.Array, h1: int, h2: int, h_max: int, vm_cap: int, vh_cap: int
):
    """3-tier slot compaction: `h1` slots for ALL voxels (sized near the
    MEAN hit count), slots [h1, h2) for the compacted mid tier (cnt > h1),
    and slots [h2, h_max) for the compacted far tail (cnt > h2).

    Same exactness contract as `build_slots_split` (its 2-tier special
    case): hits drop only past h_max or past a tier's compaction capacity,
    both monitored via the returned overflow counter.

    Returns: (src1 (h1, V), tap1,
              idxm (vm_cap,), invm (V,), srcm (h2 - h1, vm_cap), tapm,
              idxh (vh_cap,), srch (h_max - h2, vh_cap), taph,
              dropped () int32).

    `invm` (voxel -> its mid-tier row, vm_cap = none) lets the conv add the
    mid tier's output by GATHER instead of scatter; the heavy tier stays
    scatter-added (vh_cap rows are few enough that the scatter is cheaper
    than a V-row gather).
    """
    v = nbr.shape[1]
    center = _offset_index(0, 0, 0)
    k_ids = [k for k in range(27) if k != center]
    off = jnp.asarray(np.delete(np.arange(27), center), jnp.int32)
    nbr_off = jnp.take(nbr, off, axis=0)  # (26, V)

    src1, tap1, cnt = _rank_slots(nbr_off, v, h1, 0, k_ids=k_ids)
    idxm, invm, srcm, tapm, un_m = _rank_slots_compacted(
        nbr_off, cnt, v, h1, h2, vm_cap
    )
    idxh, _, srch, taph, un_h = _rank_slots_compacted(
        nbr_off, cnt, v, h2, h_max, vh_cap
    )
    over_tail = jnp.sum(jnp.maximum(cnt - h_max, 0))
    dropped = over_tail + un_m + un_h
    return src1, tap1, idxm, invm, srcm, tapm, idxh, srch, taph, dropped


def finish_slots_tiered(
    nbr: jax.Array, cnt: jax.Array, h1: int, h2: int, h_max: int,
    vm_cap: int, vh_cap: int,
):
    """The overflow tiers of `build_slots_tiered`, given a precomputed
    dense table and hit count (from the fused propagation kernel, which
    already emitted tier 1).  Returns
    (idxm, invm, srcm, tapm, idxh, srch, taph, dropped)."""
    v = nbr.shape[1]
    center = _offset_index(0, 0, 0)
    off = jnp.asarray(np.delete(np.arange(27), center), jnp.int32)
    nbr_off = jnp.take(nbr, off, axis=0)  # (26, V)
    idxm, invm, srcm, tapm, un_m = _rank_slots_compacted(
        nbr_off, cnt, v, h1, h2, vm_cap
    )
    idxh, _, srch, taph, un_h = _rank_slots_compacted(
        nbr_off, cnt, v, h2, h_max, vh_cap
    )
    over_tail = jnp.sum(jnp.maximum(cnt - h_max, 0))
    dropped = over_tail + un_m + un_h
    return idxm, invm, srcm, tapm, idxh, srch, taph, dropped


def finish_slots_split(
    nbr: jax.Array, cnt: jax.Array, h_lo: int, h_max: int, vh_cap: int
):
    """The overflow tier of `build_slots_split`, given a precomputed dense
    table and hit count.  Returns (idx_hi, src2, tap2, dropped)."""
    v = nbr.shape[1]
    center = _offset_index(0, 0, 0)
    off = jnp.asarray(np.delete(np.arange(27), center), jnp.int32)
    nbr_off = jnp.take(nbr, off, axis=0)
    idx_hi, _, src2, tap2, un = _rank_slots_compacted(
        nbr_off, cnt, v, h_lo, h_max, vh_cap
    )
    over_tail = jnp.sum(jnp.maximum(cnt - h_max, 0))
    return idx_hi, src2, tap2, over_tail + un


def build_child_slots(child: jax.Array, vf: int, h_lo: int, vh_cap: int):
    """Split-phase compaction of a (Vc, 8) child table (cf.
    `build_slots_split`, specialized to the strided conv's 8 taps).

    The tap id IS the child octant (the column index of `child`), so the
    chain just packs present children left.  h_max is fixed at 8 — a parent
    has at most 8 children — so nothing can be dropped except by the
    `vh_cap` compaction capacity (monitored).

    Returns: (src1 (h_lo, Vc), tap1, idx_hi (vh_cap,), src2 (8 - h_lo, Vh),
              tap2, dropped () int32).
    """
    vc = child.shape[0]
    src1, tap1, cnt = _rank_slots(child.T, vf, h_lo, 0)

    heavy = cnt > h_lo
    idx_hi, _ = _compact_indices(heavy, vh_cap, vc)
    child_pad = jnp.concatenate([child, jnp.full((1, 8), vf, jnp.int32)], 0)
    child_hi = jnp.take(child_pad, idx_hi, axis=0)  # (Vh, 8)

    src2, tap2, _ = _rank_slots(child_hi.T, vf, 8 - h_lo, h_lo)

    uncompacted = jnp.where(
        heavy & (jnp.cumsum(heavy.astype(jnp.int32)) > vh_cap), cnt - h_lo, 0
    )
    dropped = jnp.sum(uncompacted)
    return src1, tap1, idx_hi, src2, tap2, dropped


def _propagate_candidates(
    fine: VoxelGrid, trans: LevelTransition, nbr_c: jax.Array
) -> jax.Array:
    """The gather stage of octree propagation: per fine voxel, the child
    tables of its 2x2x2 parent-block corners, V-minor -> (8, 8, Vf).

    ONE (Vf, 27) row gather of the parent's coarse neighbors (dumped
    parents hit the sentinel row), 8x7 parity selects picking the block
    corners, then ONE (8, Vf, 8) row gather of child tables.  These
    descriptor-bound gathers are the hardware floor of propagation; the
    select/slot stage after them runs either as XLA selects
    (`propagate_nbr`) or fused in the Pallas kernel
    (`propagate_nbr_slots`).

    Layout note: gathers produce row-major (rows, 27)/(rows, 8) blocks,
    which are immediately transposed back to V-minor — the parity selects
    then read dense (Vf,) vector rows instead of lane-padded narrow
    columns (~3x faster end to end).
    """
    vf = fine.capacity
    vc = nbr_c.shape[1]
    par = fine.coords & 1
    parx = par[:, 0] == 1
    pary = par[:, 1] == 1
    parz = par[:, 2] == 1

    def tree(c):
        def m(b, c0, c1):
            return jnp.where(b, c1, c0)

        return m(
            parx,
            m(pary, m(parz, c[0, 0, 0], c[0, 0, 1]),
              m(parz, c[0, 1, 0], c[0, 1, 1])),
            m(pary, m(parz, c[1, 0, 0], c[1, 0, 1]),
              m(parz, c[1, 1, 0], c[1, 1, 1])),
        )

    # parent's 27 coarse neighbors; dumped parents hit the sentinel row
    nbr_c_rows = jnp.concatenate(
        [nbr_c.T, jnp.full((1, 27), vc, jnp.int32)], 0
    )  # (Vc + 1, 27)
    prow_t = nbr_c_rows[trans.parent].T  # (27, Vf)

    # the 8 parent-block rows: per axis, coarse offset = par - 1 + a
    pns = []
    for ax, ay, az in itertools.product((0, 1), repeat=3):
        cand = {
            (px, py, pz): prow_t[(px + ax) * 9 + (py + ay) * 3 + (pz + az)]
            for px, py, pz in itertools.product((0, 1), repeat=3)
        }
        pns.append(tree(cand))
    child_pad = jnp.concatenate([trans.child, jnp.full((1, 8), vf, jnp.int32)], 0)
    return child_pad[jnp.stack(pns)].transpose(0, 2, 1)  # (8, 8, Vf)


def _axis_sel(d: int, p: int):
    """Per-axis (parent-block index a, child slot s) for tap offset d."""
    a = 0 if d == -1 else (1 if d == 1 else 1 - p)
    s = p if d == 0 else 1 - p
    return a, s


def propagate_nbr(
    fine: VoxelGrid, trans: LevelTransition, nbr_c: jax.Array
) -> jax.Array:
    """Fine-level 27-neighbor table derived from the coarse level's table.

    Octree propagation: a fine voxel's neighbor t = c + d has parent
    (c + d) >> 1, which per axis is (c >> 1) + par - 1 + a with
    par = c & 1 and a in {0, 1} — i.e. every candidate lies in a 2x2x2
    block of the parent's coarse neighborhood.  So the whole table needs
    only the two gathers of `_propagate_candidates` plus parity-driven
    vector selects — no binary searches.  On-chip this is ~5x cheaper
    than searching the sorted table at every level (searches and scatters
    are the expensive ops on TPU; selects are nearly free).

    Caveat: if the coarse level overflowed its capacity and a fine row's
    parent was dropped, that row loses its off-center neighbors (its
    down-conv contribution is dropped by the same event, so the regimes
    coincide; size capacities to avoid overflow).

    This is the XLA select-tree form (CPU / reference path; the TPU
    hierarchy build uses the fused Pallas kernel via
    `propagate_nbr_slots`, which also emits the tier-1 slot tables).

    Args:
      fine: the fine-level voxel grid.
      trans: fine->coarse transition (`parent`, `child`).
      nbr_c: (27, Vc) neighbor table of the coarse level.
    Returns: (27, Vf) neighbor table; Vf = missing.
    """
    vf = fine.capacity
    rows = jnp.arange(vf, dtype=jnp.int32)
    par = fine.coords & 1
    parx = par[:, 0] == 1
    pary = par[:, 1] == 1
    parz = par[:, 2] == 1

    def tree(c):
        """3-level parity select over a {(px, py, pz): (Vf,)} candidate dict."""
        def m(b, c0, c1):
            return jnp.where(b, c1, c0)

        return m(
            parx,
            m(pary, m(parz, c[0, 0, 0], c[0, 0, 1]),
              m(parz, c[0, 1, 0], c[0, 1, 1])),
            m(pary, m(parz, c[1, 0, 0], c[1, 0, 1]),
              m(parz, c[1, 1, 0], c[1, 1, 1])),
        )

    crows_t = _propagate_candidates(fine, trans, nbr_c)  # (8, 8, Vf)

    cols = []
    for dx, dy, dz in OFFSETS_27.tolist():
        if (dx, dy, dz) == (0, 0, 0):
            cols.append(jnp.where(fine.valid, rows, vf))
            continue
        cand = {}
        for px, py, pz in itertools.product((0, 1), repeat=3):
            axx, sx = _axis_sel(dx, px)
            ayy, sy = _axis_sel(dy, py)
            azz, sz = _axis_sel(dz, pz)
            i = axx * 4 + ayy * 2 + azz
            cand[(px, py, pz)] = crows_t[i, sx * 4 + sy * 2 + sz]
        cols.append(tree(cand))
    return jnp.stack(cols, axis=0)  # (27, Vf)


def propagate_nbr_slots(
    fine: VoxelGrid,
    trans: LevelTransition,
    nbr_c: jax.Array,
    h1: int,
    interpret: bool = False,
):
    """Fused propagation: neighbor table + tier-1 slots + hit counts.

    Same gathers as `propagate_nbr` (`_propagate_candidates`), then ONE
    Pallas pass (`ops.pallas.propagate`) replaces the ~350 dependent XLA
    select/compare ops of the select trees and `_rank_slots` tier-1
    extraction — the VPU work XLA runs ~10x off roofline as discrete HLOs.

    Returns (nbr (27, Vf), src1 (h1, Vf), tap1 (h1, Vf), cnt (Vf,)),
    bit-identical to `propagate_nbr` + `_rank_slots` (tested).
    """
    from .pallas.propagate import _TILE, propagate_slots_kernel

    vf = fine.capacity
    crows_t = _propagate_candidates(fine, trans, nbr_c)  # (8, 8, Vf)
    par = (fine.coords & 1).T.astype(jnp.int32)  # (3, Vf)
    valid = fine.valid.astype(jnp.int32)[None, :]  # (1, Vf)

    vp = -(-vf // _TILE) * _TILE
    if vp != vf:
        pad = vp - vf
        crows_t = jnp.pad(crows_t, ((0, 0), (0, 0), (0, pad)),
                          constant_values=vf)
        par = jnp.pad(par, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))

    nbr, src1, tap1, cnt = propagate_slots_kernel(
        crows_t, par, valid, h1=h1, vf=vf, interpret=interpret
    )
    return nbr[:, :vf], src1[:, :vf], tap1[:, :vf], cnt[0, :vf]


def _level_from_grid(grid: VoxelGrid, nbr: Optional[jax.Array] = None) -> GridLevel:
    return GridLevel(
        key_hi=grid.key_hi,
        key_lo=grid.key_lo,
        coords=grid.coords,
        batch=grid.batch,
        valid=grid.valid,
        num_voxels=grid.num_voxels,
        nbr=build_nbr(grid) if nbr is None else nbr,
        full_scale=grid.full_scale,
    )


def _coarsen_grid(grid: VoxelGrid, capacity: Optional[int] = None):
    """Next-coarser voxel grid (stride-2, filter-2 downsample sites).

    A coarse site exists iff it has >= 1 active fine child — exactly the
    active-site rule of ``scn.Convolution(3, a, b, 2, 2, False)``.
    """
    vf = grid.capacity
    coarse_coords = grid.coords >> 1
    # Morton keys of right-shifted coords of a sorted table are already
    # sorted (morton(c >> 1) == morton(c) >> 3) — dedup without sorting.
    hi, lo = K.pack(coarse_coords, grid.batch, grid.full_scale // 2)
    hi, lo = K.mask_invalid(hi, lo, grid.valid)
    grid_c = dedup_sorted(
        hi,
        lo,
        coarse_coords,
        grid.full_scale // 2,
        capacity=capacity,
    )
    vc = grid_c.capacity
    parent = grid_c.p2v  # (Vf,) in [0, Vc]
    rel = grid.coords & 1
    off_id = rel[:, 0] * 4 + rel[:, 1] * 2 + rel[:, 2]

    # NB: a "scatter-free" segment formulation of this table (child[c, o]
    # = start[c] + prefix of octant occupancy, exploiting Morton
    # contiguity) measured SLOWER in-graph: segment_sum/segment_min lower
    # to scatters too, and it needs two of them plus a (Vc, 8) cumsum vs
    # this single narrow scatter.
    child = jnp.full((vc + 1, 8), vf, jnp.int32)
    child = child.at[parent, off_id].set(jnp.arange(vf, dtype=jnp.int32))[:vc]

    trans = LevelTransition(parent=parent, off_id=off_id, child=child)
    return grid_c, trans


def coarsen(level: GridLevel, capacity: Optional[int] = None):
    """`_coarsen_grid` + a search-built neighbor table (standalone use)."""
    grid_c, trans = _coarsen_grid(level, capacity=capacity)
    return _level_from_grid(grid_c), trans


def build_hierarchy(
    grid: VoxelGrid,
    num_levels: int,
    capacities: Optional[Sequence[int]] = None,
    slot_caps: Optional[Sequence[Optional[int]]] = None,
    num_batches: Optional[int] = None,
    child_slot_caps=None,
    fused_propagate: Optional[bool] = None,
) -> Hierarchy:
    """Build all U-Net levels from the level-0 voxel grid.

    The voxel tables and transitions are built bottom-up (repeated stride-2
    coarsening); neighbor tables are then built by binary search ONLY at the
    coarsest (tiny) level and octree-propagated back down (`propagate_nbr`).

    Args:
      grid: output of `ops.voxelize.voxelize` at full resolution.
      num_levels: number of U-Net levels (reference: num_planes = 7).
      capacities: per-level row capacities (len num_levels); defaults to the
        level-0 capacity everywhere (safe but not the cheapest).
      slot_caps: per-level slot-table capacities for the slot-compacted
        submanifold conv (`build_slots`); None/0 entries keep the dense path
        at that level.  None disables slot tables everywhere.
      num_batches: static batch count; enables the dense-map neighbor
        lookup at the coarsest level (see `build_nbr`).
      child_slot_caps: per-transition (h_lo, vh_cap) specs for the strided
        conv's child-table compaction (`build_child_slots`); "default" uses
        (3, Vc/4) everywhere (child counts: mean ~1.5-2.2, p90 3-4).
        Default None — MEASURED NEGATIVE at the flagship size: the ~1 ms of
        gather rows saved is outweighed by table construction plus the
        extra kernel launches (fused fwd 127.5 -> 123.1 scans/s, train step
        315 -> 323 ms).  Kept opt-in for shapes where the trade flips.
      fused_propagate: run the propagation select trees + tier-1 slot
        extraction in the fused Pallas kernel (`propagate_nbr_slots`).
        None = auto: on for TPU backends when the level has a slot spec,
        off elsewhere (the XLA select-tree path is the CPU reference).
    """
    grids = [grid]
    transitions = []
    for l in range(1, num_levels):
        cap = capacities[l] if capacities is not None else None
        grid_c, trans = _coarsen_grid(grids[-1], capacity=cap)
        if child_slot_caps is not None:
            spec = (
                (3, max(256, grid_c.capacity // 4))
                if child_slot_caps == "default"
                else child_slot_caps[l - 1]
            )
            if spec is not None:
                h_lo, vh_cap = spec
                s1, t1, idx, s2, t2, dropped = build_child_slots(
                    trans.child, grids[-1].capacity, h_lo,
                    min(vh_cap, grid_c.capacity),
                )
                trans = trans.replace(
                    cslot_src=s1, cslot_tap=t1, cslot_idx=idx,
                    cslot_src2=s2, cslot_tap2=t2, cslot_overflow=dropped,
                )
        grids.append(grid_c)
        transitions.append(trans)

    def spec_at(l):
        if slot_caps is not None and l < len(slot_caps):
            return slot_caps[l]
        return None

    if fused_propagate is None:
        from .pallas.bandmm import _on_tpu

        fused_propagate = _on_tpu()

    nbrs = [None] * num_levels
    tier1 = [None] * num_levels  # (src1, tap1, cnt) from the fused kernel
    nbrs[-1] = build_nbr(grids[-1], num_batches=num_batches)
    for l in range(num_levels - 2, -1, -1):
        h = spec_at(l)
        h1 = h[0] if isinstance(h, tuple) else h
        if fused_propagate and h1:
            nbrs[l], s1, t1, cnt = propagate_nbr_slots(
                grids[l], transitions[l], nbrs[l + 1], h1
            )
            tier1[l] = (s1, t1, cnt)
        else:
            nbrs[l] = propagate_nbr(grids[l], transitions[l], nbrs[l + 1])

    levels = []
    for l, (g, n) in enumerate(zip(grids, nbrs)):
        lev = _level_from_grid(g, nbr=n)
        h = spec_at(l)
        if isinstance(h, tuple) and len(h) == 5:
            # 3-tier spec (h1, h2, h_max, vm_cap, vh_cap)
            h1, h2, h_max, vm_cap, vh_cap = h
            vm_cap, vh_cap = min(vm_cap, g.capacity), min(vh_cap, g.capacity)
            if tier1[l] is not None:
                s1, t1, cnt = tier1[l]
                im, invm, sm, tm, ih, sh, th, dropped = finish_slots_tiered(
                    n, cnt, h1, h2, h_max, vm_cap, vh_cap
                )
            else:
                s1, t1, im, invm, sm, tm, ih, sh, th, dropped = (
                    build_slots_tiered(n, h1, h2, h_max, vm_cap, vh_cap)
                )
            lev = lev.replace(
                slot_src=s1, slot_tap=t1, slot_overflow=dropped,
                slot_idxm=im, slot_invm=invm, slot_srcm=sm, slot_tapm=tm,
                slot_idx=ih, slot_src2=sh, slot_tap2=th,
            )
        elif isinstance(h, tuple):  # split-phase spec (h_lo, h_max, vh_cap)
            h_lo, h_max, vh_cap = h
            vh_cap = min(vh_cap, g.capacity)
            if tier1[l] is not None:
                s1, t1, cnt = tier1[l]
                idx, s2, t2, dropped = finish_slots_split(
                    n, cnt, h_lo, h_max, vh_cap
                )
            else:
                s1, t1, idx, s2, t2, dropped = build_slots_split(
                    n, h_lo, h_max, vh_cap
                )
            lev = lev.replace(
                slot_src=s1, slot_tap=t1, slot_overflow=dropped,
                slot_idx=idx, slot_src2=s2, slot_tap2=t2,
            )
        elif h:
            if tier1[l] is not None:
                s1, t1, cnt = tier1[l]
                dropped = jnp.sum(jnp.maximum(cnt - h, 0))
            else:
                s1, t1, dropped = build_slots(n, h)
            lev = lev.replace(slot_src=s1, slot_tap=t1, slot_overflow=dropped)
        levels.append(lev)
    return Hierarchy(levels=tuple(levels), transitions=tuple(transitions))

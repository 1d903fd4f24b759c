"""Static-shape batch structures + per-step topology construction.

Replaces the reference's ragged SCN collate
(``lib/dataset/__init__.py:27-130``: concatenated variable-length point
clouds + Python lists of per-sample index arrays) with fixed-capacity padded
arrays — the TPU-native layout.  Every sample is padded to ``n_points``
points; ``point_mask`` marks real entries; labels on padding are -100 so
losses/metrics ignore them automatically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.hierarchy import Hierarchy, build_hierarchy
from ..ops.voxelize import VoxelGrid, voxelize


@struct.dataclass
class PointBatch:
    """One (mini)batch of RGB+LiDAR pairs with static shapes.

    Wire format: ``img`` may arrive as uint8 (the raw decoded pixels — 4x
    less host->device traffic than float32) together with per-sample
    ``jitter_params``; `prepare_device_batch` then runs /255, color jitter,
    and the RGB-feats gather ON DEVICE (XLA fuses them into the stem
    convs).  ``feats`` may be None in that case (``feats_from_img``) — the
    per-point RGB features are gathered from the prepared image instead of
    being shipped.
    """

    img: jax.Array  # (B, H, W, 3) float32 in [0,1] — or uint8 wire format
    depth: jax.Array  # (B, H, W, 1) float32 sparse depth map
    img_indices: jax.Array  # (B, N, 2) int32 (row, col)
    coords: jax.Array  # (B, N, 3) int32 voxel coords
    feats: Optional[jax.Array]  # (B, N, C) float32 per-point features
    # (RGB or ones); None when feats_from_img (gathered on device)
    seg_label: jax.Array  # (B, N) int32, -100 = ignore/padding
    point_mask: jax.Array  # (B, N) bool
    seg_labels_2d: Optional[jax.Array] = None  # (B, H, W) int32
    n_dropped: Optional[jax.Array] = None  # (B,) int32 points truncated by
    # the n_points budget (surface it: dropped points are silently missing
    # from training AND evaluation otherwise)
    pseudo_label_2d: Optional[jax.Array] = None  # (B, N) int32
    pseudo_label_3d: Optional[jax.Array] = None  # (B, N) int32
    pseudo_label_ensemble: Optional[jax.Array] = None  # (B, N) int32
    point_perm: Optional[jax.Array] = None  # (B, N) int32 original index of
    # each (host-)Morton-sorted row; only consumers restoring scan order use it
    jitter_params: Optional[jax.Array] = None  # (B, 4) float32: brightness/
    # contrast/saturation factors + op-order index (data.augment
    # draw_jitter_params); applied on device by prepare_device_batch
    coords_sorted: bool = struct.field(pytree_node=False, default=False)
    # True when the loader pre-sorted each sample's points by Morton key
    # (data.base.morton_sort_perm) — lets voxelize skip its device sort
    feats_from_img: bool = struct.field(pytree_node=False, default=False)
    # True when per-point RGB feats are gathered from the prepared image on
    # device (use_rgb datasets in wire format) instead of shipped

    @property
    def batch_size(self) -> int:
        return self.img.shape[0]

    @property
    def n_points(self) -> int:
        return self.coords.shape[1]


def flatten_points(batch: PointBatch):
    """(B, N, ...) -> (B*N, ...) plus per-point batch indices."""
    b, n = batch.coords.shape[:2]
    coords = batch.coords.reshape(b * n, 3)
    # feats is None until prepare_device_batch materializes it (wire format)
    feats = None if batch.feats is None else batch.feats.reshape(b * n, -1)
    labels = batch.seg_label.reshape(b * n)
    mask = batch.point_mask.reshape(b * n)
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    return coords, feats, labels, mask, bidx


def prepare_device_batch(batch: PointBatch) -> PointBatch:
    """Materialize the wire format ON DEVICE: uint8 img -> float32 [0,1],
    per-sample color jitter (`ops.image.apply_color_jitter`), and the
    per-point RGB feats gather (``feats_from_img``).

    Idempotent: float batches with feats already present pass through
    unchanged, so every step function can call it unconditionally.  The
    whole thing is a handful of elementwise ops + one row gather that XLA
    fuses into the stem — the win is shipping 4x fewer image bytes and no
    feats array over the host->device link (the dominant transfer,
    reference collate ``lib/dataset/__init__.py:27-130`` ships float).
    """
    img = batch.img
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        if batch.jitter_params is not None:
            from ..ops.image import apply_color_jitter

            img = apply_color_jitter(img, batch.jitter_params)
        batch = batch.replace(img=img, jitter_params=None)
    if batch.feats_from_img:
        bidx = jnp.arange(img.shape[0])[:, None]
        feats = img[bidx, batch.img_indices[..., 0], batch.img_indices[..., 1]]
        batch = batch.replace(feats=feats, feats_from_img=False)
    return batch


def default_capacities(
    num_points: int,
    num_levels: int,
    batch_size: Optional[int] = None,
    profile: str = "default",
) -> Tuple[int, ...]:
    """Per-level voxel-row capacities.

    Real LiDAR occupancy roughly halves per level below level 1 (measured on
    beam-structured scans: [48k, 32k, 19k, 10k, 5k, 2.3k, 1.1k] for 65k
    points = 8 scans), so full-capacity tables at every level waste ~4x
    gather work.  Schedule: [P, 5P/8, 3P/8, P/4, ...] — ~1.3x headroom over
    measured occupancy at L1/L2 (every gather/select/BN there scales with
    capacity; `train/voxel_overflow_levels` monitors the margin) and
    ~1.5-2x below.

    Coarse-level occupancy scales with SCENE EXTENT per scan, not with
    point count (per scan: ~1.3k/625/290/138 rows at levels 3-6 almost
    independently of density), so when `batch_size` is known each level
    also gets a per-scan floor — without it, low point budgets silently
    overflow the deep tables.  Overflowing voxels are dropped to the dump
    row (monitored as `train/voxel_overflow_levels`).
    """
    # 64-beam scans (profile="dense", cf. default_slot_caps) keep more
    # unique voxels per point at the tightly-capped L1/L2 (measured worst
    # 0.54P / 0.30P vs the flagship 0.49P / 0.29P): widen those two levels
    # to preserve >=1.28x headroom there.
    l1_num, l2_num = (11, 7) if profile == "dense" else (10, 6)
    caps = []
    for l in range(num_levels):
        if l == 1:
            # measured occupancy ~P/2 (e.g. 32k of 65k points); 1.28x headroom
            cap = (num_points * l1_num) >> 4
        elif l == 2:
            # measured ~0.29P (19k of 65k); 1.31x headroom
            cap = (num_points * l2_num) >> 4
        else:
            cap = num_points >> max(0, l - 1)
        if batch_size is not None and l >= 3:
            per_scan_floor = 2048 >> min(l - 3, 3)  # 2048/1024/512/256...
            cap = max(cap, batch_size * per_scan_floor)
        caps.append(max(256, min(cap, num_points)))
    return tuple(caps)


def default_slot_caps(
    num_levels: int,
    capacities: Optional[Tuple[int, ...]] = None,
    profile: str = "default",
) -> Tuple[Optional[Tuple[int, int, int]], ...]:
    """Per-level slot specs for the compacted submanifold conv.

    Off-center hit counts on LiDAR scans are small and heavily skewed
    (measured on flagship-size scans: mean 2.4/2.8/3.2/3.9 at levels 0-3,
    p90 5-8, tails to ~18; see PERFORMANCE.md), so the big levels get a
    SPLIT-PHASE spec ``(h_lo, h_max, vh_cap)`` (`ops.hierarchy
    .build_slots_split`): ``h_lo`` slots cover all voxels (sized near p90),
    and the few voxels with more hits go through a ``vh_cap``-row compacted
    table that keeps them exact up to ``h_max`` total hits — cheap common
    case AND exact tail, instead of the old single-cap trade-off between
    wasted gather rows and dropped hits.  ``h_max`` carries ~2x headroom
    over the observed per-level maxima; ``vh_cap`` 4-8x over the observed
    heavy-voxel counts.

    Levels 0-4 use a 3-TIER spec ``(h1, h2, h_max, vm_cap, vh_cap)``
    (`ops.hierarchy.build_slots_tiered`): tier 1 near the mean for all
    voxels, a compacted mid tier for cnt > h1, and a compacted far tail
    for cnt > h2 — the skew is strong enough that the extra tier cuts
    gather rows another ~25-40% over the 2-tier split.  h_max = 26 at
    every level: 26 off-center taps is the structural maximum, so NOTHING
    can ever be tail-dropped; only a tier's compaction cap can bind, and
    that is monitored.

    `GridLevel.slot_overflow` (logged as train/nbr_slot_overflow and in
    eval logs) monitors that h_max/vh_cap never bind.  IMPORTANT: a
    non-zero overflow invalidates GRADIENTS, not just forward exactness —
    the forward drops hits per the destination voxel's table while the
    symmetry-based adjoint (`ops.spconv._subm_slots2_bwd`) drops per the
    source voxel's, so the computed gradient no longer matches the computed
    forward.  Treat sustained overflow as a config error and raise the
    caps.
    """
    # 3-tier plan (h1, h2, h_max, vm_cap/V in 64ths, vh_cap/V in 64ths),
    # calibrated on the TRUE topology (seeds 0-3, flagship size; the round-2
    # pre-sort regression had collapsed deep levels ~10x — see
    # ops/voxelize._dedup on the indices_are_sorted contract):
    #   L0 mean 2.4 max 11, >3 <=14.2k, >6 <=0.95k
    #   L1 mean 2.9 max 17, >4 <=5.6k,  >8 <=1.3k
    #   L2 mean 3.1 max 17, >4 <=4.0k,  >8 <=0.9k
    #   L3 mean 3.7 max 18, >4 <=3.2k,  >8 <=0.7k
    #   L4 mean 4.0 max 20, >4 <=1.7k,  >8 <=0.4k
    # Tier caps carry ~2x headroom over those maxima; h_max = 26 is the
    # structural maximum, so the TAIL can never drop — only a tier's
    # compaction cap can, and that is monitored.  L5+ keeps the 2-tier
    # form (3-tuples): V is tiny there and the extra tier's launches cost
    # more than the rows saved.
    plan3 = {
        0: (3, 6, 26, 28, 2),
        1: (4, 8, 26, 20, 4),
        2: (4, 8, 26, 22, 6),
        3: (4, 8, 26, 24, 6),
        4: (4, 8, 26, 24, 8),
    }
    if profile == "dense":
        # 64-beam HDL-64E-style scans (SemanticKITTI / A2D2 / vKITTI at
        # n_points ~10240) pack voxel neighborhoods much tighter than the
        # 32-beam flagship pattern — measured on data.synthetic
        # variant="kitti" (batch 8, seeds 0-3): L0 >3 <=20.8k, >8 <=2.9k;
        # L1 >4 <=15.4k, >8 <=6.1k; L2 >4 <=9.7k; L4 >4 <=3.5k.  The
        # flagship fractions DROP tens of thousands of hits there (the
        # tier caps bind), which silently corrupts gradients, so the
        # KITTI-family configs select this >=1.5x-headroom plan via
        # `train.slot_profile: dense`.
        plan3 = {
            0: (3, 8, 26, 30, 6),
            1: (4, 8, 26, 30, 12),
            2: (4, 8, 26, 32, 8),
            3: (4, 8, 26, 30, 8),
            4: (4, 8, 26, 34, 10),
        }
    elif profile != "default":
        raise ValueError(f"unknown slot profile {profile!r}")
    specs = []
    for l in range(num_levels):
        v = capacities[l] if capacities is not None else 1 << 16
        if l in plan3:
            h1, h2, h_max, nm, nh = plan3[l]
            specs.append((
                h1, h2, h_max,
                max(256, v * nm // 64), max(256, v * nh // 64),
            ))
        else:
            # deep levels: mean ~5.1-5.5, cnt>8 <= ~350 at the flagship size
            specs.append((8, 26, max(256, v * 16 // 64)))
    return tuple(specs)


def build_topology(
    batch: PointBatch,
    full_scale: int,
    num_levels: int,
    capacities: Optional[Tuple[int, ...]] = None,
    slot_caps: Optional[Tuple[Optional[int], ...]] = "default",
    slot_profile: str = "default",
) -> Tuple[VoxelGrid, Hierarchy]:
    """Voxelize the batch and build the sparse U-Net hierarchy.

    Pure function of integer data — built once per step, shared by forward
    and backward and by every conv layer (the reference's SCN rebuilds
    rulebooks per layer per call).
    """
    coords, _, _, mask, bidx = flatten_points(batch)
    if capacities is None:
        capacities = default_capacities(
            coords.shape[0], num_levels, batch_size=batch.batch_size,
            profile=slot_profile,
        )
    if slot_caps == "default":
        slot_caps = default_slot_caps(num_levels, capacities, profile=slot_profile)
    grid = voxelize(
        coords, bidx, mask, full_scale, capacity=capacities[0],
        presorted=batch.coords_sorted,
    )
    hier = build_hierarchy(
        grid, num_levels, capacities=capacities, slot_caps=slot_caps,
        num_batches=batch.batch_size,
    )
    # Pin the finished topology: when the nets consume it inside one big
    # jitted graph, XLA otherwise interleaves table construction with conv
    # fusions, re-materializing parts of it (measured ~2.5 ms/step at the
    # flagship size).
    return jax.lax.optimization_barrier((grid, hier))

"""Host-side (C++) sparse-topology construction.

Builds the exact (VoxelGrid, Hierarchy) pytrees of `train.batch
.build_topology`, but on the CPU with hash maps (`mm2d3d_tpu.native`) inside
the data loader — pipelined with device compute instead of spending device
time on sort/binary-search kernels.  The arrays ship to the device with the
batch; numerically identical to the device path (tests/test_native.py,
tests/test_host_topology.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from .. import native
from ..ops.hierarchy import GridLevel, Hierarchy, LevelTransition
from ..ops.voxelize import VoxelGrid
from ..train.batch import PointBatch, default_capacities
from ..ops import keys as K


def _part1by2(v):
    v = v.astype(np.uint32) & np.uint32(0x3FF)
    v = (v ^ (v << 16)) & np.uint32(0xFF0000FF)
    v = (v ^ (v << 8)) & np.uint32(0x0300F00F)
    v = (v ^ (v << 4)) & np.uint32(0x030C30C3)
    v = (v ^ (v << 2)) & np.uint32(0x09249249)
    return v


def _keys_for(coords, batch, valid, full_scale):
    """(batch, morton) pair keys — numpy mirror of `ops.keys.pack`."""
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    lo = _part1by2(z) | (_part1by2(y) << 1) | (_part1by2(x) << 2)
    hi6 = (
        _part1by2(z >> 10) | (_part1by2(y >> 10) << 1) | (_part1by2(x >> 10) << 2)
    )
    hi = (batch.astype(np.uint32) << 6) | hi6
    inv = np.iinfo(np.int32).max
    hi = np.where(valid, hi.astype(np.int32), inv).astype(np.int32)
    lo = np.where(valid, lo.astype(np.int32), inv).astype(np.int32)
    return hi, lo


def _build_slots_np(nbr: np.ndarray, num_slots: int):
    """Numpy mirror of `ops.hierarchy.build_slots` (same slot order)."""
    from ..ops.pallas.bandmm import MISS_TAP

    k, v = nbr.shape
    hit = nbr < v
    hit[13] = False  # center tap excluded (gather-free in the conv)
    # stable sort moves hit taps first, preserving tap order per column
    order = np.argsort(~hit, axis=0, kind="stable")[:num_slots]  # (H, V)
    cols = np.arange(v)[None, :]
    taken = hit[order, cols]
    src = np.where(taken, nbr[order, cols], v).astype(np.int32)
    tap = np.where(taken, order, MISS_TAP).astype(np.int32)
    dropped = np.int32(np.maximum(hit.sum(0) - num_slots, 0).sum())
    return src, tap, dropped


def _build_slots_split_np(nbr: np.ndarray, h_lo: int, h_max: int, vh_cap: int):
    """Numpy mirror of `ops.hierarchy.build_slots_split`."""
    k, v = nbr.shape
    src, tap, _ = _build_slots_np(nbr, h_max)  # (h_max, V); exact cnt below
    hit = nbr < v
    hit[13] = False
    cnt = hit.sum(0)

    src1, tap1 = src[:h_lo], tap[:h_lo]
    heavy = cnt > h_lo
    heavy_rows = np.nonzero(heavy)[0]
    idx_hi = np.full(vh_cap, v, np.int32)
    take = heavy_rows[:vh_cap]
    idx_hi[: len(take)] = take
    src2 = np.full((h_max - h_lo, vh_cap), v, np.int32)
    tap2 = np.full((h_max - h_lo, vh_cap), 27, np.int32)
    src2[:, : len(take)] = src[h_lo:, take]
    tap2[:, : len(take)] = tap[h_lo:, take]
    dropped = np.maximum(cnt - h_max, 0).sum()
    if len(heavy_rows) > vh_cap:
        extra = heavy_rows[vh_cap:]
        dropped += (np.minimum(cnt[extra], h_max) - h_lo).sum()
    return src1, tap1, idx_hi, src2, tap2, np.int32(dropped)


def _tier_np(src, tap, cnt, v, h_from, h_to, cap):
    """One compacted tier (voxels with cnt > h_from, slots [h_from, h_to))."""
    heavy_rows = np.nonzero(cnt > h_from)[0]
    idx = np.full(cap, v, np.int32)
    take = heavy_rows[:cap]
    idx[: len(take)] = take
    inv = np.full(len(cnt), cap, np.int32)  # voxel -> its tier row (cap=none)
    inv[take] = np.arange(len(take), dtype=np.int32)
    s = np.full((h_to - h_from, cap), v, np.int32)
    t = np.full((h_to - h_from, cap), 27, np.int32)
    s[:, : len(take)] = src[h_from:h_to, take]
    t[:, : len(take)] = tap[h_from:h_to, take]
    un = 0
    if len(heavy_rows) > cap:
        extra = heavy_rows[cap:]
        un = (np.minimum(cnt[extra], h_to) - h_from).sum()
    return idx, inv, s, t, int(un)


def _build_slots_tiered_np(
    nbr: np.ndarray, h1: int, h2: int, h_max: int, vm_cap: int, vh_cap: int
):
    """Numpy mirror of `ops.hierarchy.build_slots_tiered` (3-tier)."""
    k, v = nbr.shape
    src, tap, _ = _build_slots_np(nbr, h_max)
    hit = nbr < v
    hit[13] = False
    cnt = hit.sum(0)

    idxm, invm, srcm, tapm, un_m = _tier_np(src, tap, cnt, v, h1, h2, vm_cap)
    idxh, _, srch, taph, un_h = _tier_np(src, tap, cnt, v, h2, h_max, vh_cap)
    dropped = np.maximum(cnt - h_max, 0).sum() + un_m + un_h
    return (src[:h1], tap[:h1], idxm, invm, srcm, tapm, idxh, srch, taph,
            np.int32(dropped))


def _build_child_slots_np(child: np.ndarray, vf: int, h_lo: int, vh_cap: int):
    """Numpy mirror of `ops.hierarchy.build_child_slots`."""
    vc = child.shape[0]
    hit = child < vf  # (Vc, 8)
    cnt = hit.sum(1)
    order = np.argsort(~hit, axis=1, kind="stable")  # (Vc, 8) taps, hits first
    rows = np.arange(vc)[:, None]
    taken = hit[rows, order]
    src_full = np.where(taken, child[rows, order], vf).astype(np.int32).T
    tap_full = np.where(taken, order, 8).astype(np.int32).T  # (8, Vc)

    src1, tap1 = src_full[:h_lo], tap_full[:h_lo]
    heavy = cnt > h_lo
    heavy_rows = np.nonzero(heavy)[0]
    idx_hi = np.full(vh_cap, vc, np.int32)
    take = heavy_rows[:vh_cap]
    idx_hi[: len(take)] = take
    h2 = 8 - h_lo
    src2 = np.full((h2, vh_cap), vf, np.int32)
    tap2 = np.full((h2, vh_cap), 8, np.int32)
    src2[:, : len(take)] = src_full[h_lo:, take]
    tap2[:, : len(take)] = tap_full[h_lo:, take]
    dropped = np.int32(
        (cnt[heavy_rows[vh_cap:]] - h_lo).sum() if len(heavy_rows) > vh_cap else 0
    )
    return src1, tap1, idx_hi, src2, tap2, dropped


def build_topology_host(
    coords: np.ndarray,  # (P, 3) int
    bidx: np.ndarray,  # (P,) int
    valid: np.ndarray,  # (P,) bool
    full_scale: int,
    num_levels: int,
    capacities: Optional[Sequence[int]] = None,
    batch_size: Optional[int] = None,
    slot_caps: Optional[Sequence[Optional[int]]] = "default",
    slot_profile: str = "default",
    child_slot_caps=None,
) -> Tuple[VoxelGrid, Hierarchy]:
    assert native.available(), "native host ops unavailable"
    p = len(coords)
    if capacities is None:
        capacities = default_capacities(p, num_levels, batch_size=batch_size)
    if slot_caps == "default":
        from ..train.batch import default_slot_caps

        slot_caps = default_slot_caps(
            num_levels, tuple(capacities), profile=slot_profile
        )

    def _slots_for(level_idx, nbr, level_cap):
        h = (slot_caps[level_idx]
             if slot_caps is not None and level_idx < len(slot_caps) else None)
        if not h:
            return {}
        # `nbr` is tap-major (27, V); the C++ builder wants voxel rows
        nbr_rows = np.ascontiguousarray(nbr.T, np.int32)
        if isinstance(h, tuple) and len(h) == 5:
            h1, h2, h_max, vm_cap, vh_cap = h
            (s1, t1, im, invm, sm, tm, ih, sh, th,
             dropped) = native.build_slots_tiered(
                nbr_rows, h1, h2, h_max, min(vm_cap, level_cap),
                min(vh_cap, level_cap),
            )
            return dict(slot_src=s1, slot_tap=t1, slot_overflow=dropped,
                        slot_idxm=im, slot_invm=invm, slot_srcm=sm,
                        slot_tapm=tm,
                        slot_idx=ih, slot_src2=sh, slot_tap2=th)
        if isinstance(h, tuple):
            h_lo, h_max, vh_cap = h
            # 2-tier split = the tiered builder with h2 == h_max, no far tier
            (s1, t1, idx, _invm, s2, t2, _ih, _sh, _th,
             dropped) = native.build_slots_tiered(
                nbr_rows, h_lo, h_max, h_max, min(vh_cap, level_cap), 0
            )
            return dict(slot_src=s1, slot_tap=t1, slot_overflow=dropped,
                        slot_idx=idx, slot_src2=s2, slot_tap2=t2)
        src, tap, dropped = _build_slots_np(nbr, h)
        return dict(slot_src=src, slot_tap=tap, slot_overflow=dropped)

    coords = np.ascontiguousarray(coords, np.int32)
    bidx = np.ascontiguousarray(bidx, np.int32)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)

    cap0 = capacities[0]
    vc, vb, p2v, counts, nvox = native.voxelize_dedup(
        coords, bidx, valid_u8, full_scale, cap0
    )
    row_valid = np.arange(cap0) < nvox
    hi, lo = _keys_for(vc, vb, row_valid, full_scale)
    grid = VoxelGrid(
        key_hi=hi, key_lo=lo, coords=vc, batch=vb, valid=row_valid,
        num_voxels=np.int32(nvox), p2v=p2v, counts=counts,
        full_scale=full_scale,
    )

    levels = []
    transitions = []
    prev = dict(coords=vc, batch=vb, nvox=nvox, cap=cap0, fs=full_scale)
    nbr = np.ascontiguousarray(
        native.build_nbr27(vc, vb, nvox, cap0, full_scale).T
    )  # (27, cap) tap-major, matching ops.hierarchy.GridLevel.nbr
    levels.append(
        GridLevel(
            key_hi=hi, key_lo=lo, coords=vc, batch=vb, valid=row_valid,
            num_voxels=np.int32(nvox), nbr=nbr, full_scale=full_scale,
            **_slots_for(0, nbr, cap0),
        )
    )

    for l in range(1, num_levels):
        cap = capacities[l]
        fs = prev["fs"] // 2
        fine_valid = (np.arange(prev["cap"]) < prev["nvox"]).astype(np.uint8)
        cc, cb, _, _, nv = native.voxelize_dedup(
            (prev["coords"] >> 1).astype(np.int32), prev["batch"], fine_valid,
            fs, cap,
        )
        parent, off_id, child = native.build_transition(
            prev["coords"], prev["batch"], prev["nvox"], prev["cap"],
            cc, cb, nv, cap, fs,
        )
        nbr = np.ascontiguousarray(native.build_nbr27(cc, cb, nv, cap, fs).T)
        rv = np.arange(cap) < nv
        hi, lo = _keys_for(cc, cb, rv, fs)
        levels.append(
            GridLevel(
                key_hi=hi, key_lo=lo, coords=cc, batch=cb, valid=rv,
                num_voxels=np.int32(nv), nbr=nbr, full_scale=fs,
                **_slots_for(l, nbr, cap),
            )
        )
        if child_slot_caps is not None:
            h_lo, vh = (
                (3, max(256, cap // 4))
                if child_slot_caps == "default"
                else child_slot_caps[l - 1]
            )
            s1, t1, cidx, s2, t2, cdrop = _build_child_slots_np(
                child, prev["cap"], h_lo, min(vh, cap)
            )
            transitions.append(
                LevelTransition(
                    parent=parent, off_id=off_id, child=child,
                    cslot_src=s1, cslot_tap=t1, cslot_idx=cidx,
                    cslot_src2=s2, cslot_tap2=t2, cslot_overflow=cdrop,
                )
            )
        else:
            transitions.append(
                LevelTransition(parent=parent, off_id=off_id, child=child)
            )
        prev = dict(coords=cc, batch=cb, nvox=nv, cap=cap, fs=fs)

    return grid, Hierarchy(levels=tuple(levels), transitions=tuple(transitions))


def topology_for_batch(
    batch: PointBatch, full_scale: int, num_levels: int,
    capacities: Optional[Sequence[int]] = None,
):
    b, n = batch.coords.shape[:2]
    coords = np.asarray(batch.coords).reshape(b * n, 3)
    bidx = np.repeat(np.arange(b, dtype=np.int32), n)
    valid = np.asarray(batch.point_mask).reshape(b * n)
    return build_topology_host(coords, bidx, valid, full_scale, num_levels,
                               capacities=capacities, batch_size=b)

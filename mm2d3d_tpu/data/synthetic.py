"""Synthetic RGB+LiDAR batches with realistic statistics.

Used by tests, `__graft_entry__.py`, and `bench.py` — the real datasets
(nuScenes / SemanticKITTI / ...) need tens of GB of preprocessed scans that
are not present in this environment.  Shapes and value ranges mirror the
reference's nuScenes USA->Singapore configuration
(``/root/reference/datasets/nuscenes_usa_singapore.yaml``: 400x225 images,
scale 20 -> 5 cm voxels, full_scale 4096, 6 classes, RGB point features).
"""

from __future__ import annotations

import numpy as np

from ..train.batch import PointBatch


def make_batch(
    rng: np.random.RandomState,
    batch_size: int = 2,
    height: int = 225,
    width: int = 400,
    n_points: int = 4096,
    num_classes: int = 6,
    full_scale: int = 4096,
    valid_fraction: float = 0.95,
    dtype=np.float32,
    variant: str = "nuscenes",
    separable: bool = False,
    wire: bool = False,
) -> PointBatch:
    """LiDAR-like scene: ground plane + vertical structures, projected to a
    virtual front camera.

    `variant` selects the beam pattern: "nuscenes" (32 rings, the flagship
    benchmark geometry) or "kitti" (64 rings over a narrower elevation
    span, the HDL-64E-style pattern of the SemanticKITTI/A2D2/vKITTI
    scenarios at n_points ~10240) — denser rings pack voxel neighborhoods
    tighter, which is what the capacity/slot-cap schedules must cover
    (`train.batch.default_capacities` / `default_slot_caps`).

    `separable=True` makes the task LEARNABLE instead of random-labeled:
    labels follow the scene geometry (ground vs walls binned by depth) and
    the image is painted with a per-class color at each projected point, so
    both branches (2D from pixels, 3D from RGB point feats + geometry) can
    reach ~1.0 mIoU.  Used by the end-to-end learning test
    (tests/test_learning.py) — wrong-but-finite gradients anywhere in the
    stack show up as a busted mIoU there.
    """
    b, n = batch_size, n_points

    img = rng.rand(b, height, width, 3).astype(dtype)

    # Spinning-lidar beam structure (rings x azimuth): real scans are dense
    # along scan lines, so voxel neighborhoods are well-populated — uniform
    # random points would give a misleading ~96% empty-neighbor rate.
    if variant == "kitti":
        n_rings = 64
        elev = np.linspace(-0.43, 0.035, n_rings)  # HDL-64E-like span
    elif variant == "nuscenes":
        n_rings = 32
        elev = np.linspace(-0.42, 0.08, n_rings)  # elevation angles (rad)
    else:
        raise ValueError(f"unknown variant {variant!r}")
    per_ring = n // n_rings
    az = np.linspace(-0.45, 0.45, per_ring)  # front-camera FoV azimuths
    elev_g, az_g = np.meshgrid(elev, az, indexing="ij")
    elev_f = np.broadcast_to(elev_g.reshape(1, -1), (b, n_rings * per_ring))
    az_f = np.broadcast_to(az_g.reshape(1, -1), (b, n_rings * per_ring))

    # scene: ground plane at y=1.6 plus a few box obstacles per sample
    sensor_h = 1.6
    with np.errstate(divide="ignore"):
        ground_r = np.where(elev_f < -1e-3, sensor_h / np.tan(-elev_f), 120.0)
    rng_range = np.clip(ground_r, 2.0, 120.0)
    for w in range(6):  # random walls at fixed depths/azimuth bands
        if separable:
            # stratified depths/azimuths: every depth bin (= class, see
            # below) is populated in every sample, and the non-overlapping
            # azimuth bands keep nearer walls from occluding farther ones —
            # otherwise rare/absent classes cap the reachable mIoU
            # (absent_score = 0) and the learning test cannot discriminate.
            # Depths stay within ~23 m so the scene fits small test
            # full_scales (coords = 20 x meters): beyond full_scale/20 the
            # clip collapses walls into boundary voxels and mode-4 pooling
            # mixes their classes, capping the reachable 3D mIoU.
            wall_z = 5.0 + w * 3.6 + rng.rand(b, 1) * 1.2
            az0 = -0.36 + w * 0.144 + (rng.rand(b, 1) - 0.5) * 0.02
            wid = rng.rand(b, 1) * 0.03 + 0.05
        else:
            wall_z = rng.rand(b, 1) * 50 + 5
            az0 = (rng.rand(b, 1) - 0.5) * 0.8
            wid = rng.rand(b, 1) * 0.1 + 0.02
        hit = np.abs(az_f - az0) < wid
        rng_range = np.where(hit, np.minimum(rng_range, wall_z), rng_range)
    wall_mask = (rng_range < np.clip(ground_r, 2.0, 120.0) - 1e-3)[:, :n]
    if separable:
        # cap the WHOLE scene so it fits a small test full_scale: distant
        # ground would otherwise shift the positive-octant origin and push
        # the walls past the coordinate clip (collapsing their voxels)
        rng_range = np.minimum(rng_range, 23.5)
    rng_range = rng_range + rng.randn(b, n_rings * per_ring) * 0.02  # sensor noise

    zc = (rng_range * np.cos(elev_f) * np.cos(az_f))[:, :n]
    xc = (rng_range * np.cos(elev_f) * np.sin(az_f))[:, :n]
    yc = (sensor_h + rng_range * np.sin(elev_f) * -1.0)[:, :n]
    if zc.shape[1] < n:  # pad remainder with repeats
        extra = n - zc.shape[1]
        zc = np.concatenate([zc, zc[:, :extra]], 1)
        xc = np.concatenate([xc, xc[:, :extra]], 1)
        yc = np.concatenate([yc, yc[:, :extra]], 1)
        wall_mask = np.concatenate([wall_mask, wall_mask[:, :extra]], 1)
    zc = np.clip(zc, 2.0, 120.0)
    pts = np.stack([xc, yc, zc], -1).astype(np.float32)

    # voxelize at scale 20 (5cm), shift to positive octant per sample
    coords = pts * 20.0
    coords = coords - coords.min(axis=1, keepdims=True)
    coords = np.floor(coords).astype(np.int32)
    coords = np.clip(coords, 0, full_scale - 1)

    # pinhole projection to image indices
    f = 0.9 * width
    u = np.clip((xc / zc) * f + width / 2, 0, width - 1)
    v = np.clip(((yc - 1.0) / zc) * f + height / 2, 0, height - 1)
    img_indices = np.stack([v, u], -1).astype(np.int32)

    depth = np.zeros((b, height, width, 1), dtype)
    for i in range(b):
        depth[i, img_indices[i, :, 0], img_indices[i, :, 1], 0] = zc[i]

    n_valid = max(1, int(n * valid_fraction))
    point_mask = np.zeros((b, n), bool)
    point_mask[:, :n_valid] = True

    if separable:
        # geometry-correlated labels: ground = class 0, walls binned by
        # depth into classes 1..num_classes-1 (bins match the stratified
        # wall depths above); image painted with the class color at each
        # projected point so the 2D branch is separable too
        wall_cls = 1 + np.clip(
            ((zc - 3.2) / 3.6).astype(np.int32), 0, num_classes - 2
        )
        seg_label = np.where(wall_mask, wall_cls, 0).astype(np.int32)
        seg_label[~point_mask] = -100
        palette = (
            np.stack(
                [np.linspace(0.9, 0.1, num_classes),
                 np.linspace(0.1, 0.9, num_classes),
                 (np.arange(num_classes) % 2).astype(np.float64)], 1
            )
        ).astype(dtype)
        img *= 0.1  # dim background noise
        for i in range(b):
            ok = seg_label[i] >= 0
            img[i, img_indices[i, ok, 0], img_indices[i, ok, 1]] = (
                palette[seg_label[i, ok]]
            )
    else:
        seg_label = rng.randint(0, num_classes, (b, n)).astype(np.int32)
        seg_label[rng.rand(b, n) < 0.05] = -100  # ignore sprinkles
        seg_label[~point_mask] = -100

    if wire:
        # uint8 wire format (`train.batch.prepare_device_batch`): quantize
        # the image to the uint8 grid FIRST so the float twin of this batch
        # (same rng, wire=False after this quantization) is bit-identical
        # to what the device reconstructs — lets tests assert exact parity
        img_u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        img = img_u8.astype(np.float32) / 255.0

    feats = np.take_along_axis(
        img.reshape(b, -1, 3),
        (img_indices[..., 0] * width + img_indices[..., 1])[..., None],
        axis=1,
    ).astype(dtype)

    seg_labels_2d = np.full((b, height, width), -100, np.int32)
    for i in range(b):
        seg_labels_2d[i, img_indices[i, :, 0], img_indices[i, :, 1]] = seg_label[i]

    # host-side Morton sort per sample (the loaders' collate layout) so the
    # device voxelizer takes its sort-free path
    from .base import morton_sort_perm

    point_perm = np.zeros((b, n), np.int32)
    for i in range(b):
        perm = morton_sort_perm(coords[i], point_mask[i], full_scale)
        point_perm[i] = perm
        for arr in (coords, img_indices, feats, seg_label, point_mask):
            arr[i] = arr[i][perm]

    return PointBatch(
        img=img_u8 if wire else img,
        depth=depth,
        img_indices=img_indices,
        coords=coords,
        feats=None if wire else feats,
        seg_label=seg_label,
        point_mask=point_mask,
        seg_labels_2d=seg_labels_2d,
        point_perm=point_perm,
        coords_sorted=True,
        feats_from_img=wire,
    )

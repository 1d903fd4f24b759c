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
) -> PointBatch:
    """LiDAR-like scene: ground plane + vertical structures, projected to a
    virtual front camera."""
    b, n = batch_size, n_points

    img = rng.rand(b, height, width, 3).astype(dtype)

    # points in "meters": forward depth z in [2, 60], lateral spread
    zc = rng.rand(b, n) * 58 + 2
    xc = (rng.rand(b, n) - 0.5) * zc * 0.9
    yc = np.where(
        rng.rand(b, n) < 0.6,
        1.6 + rng.randn(b, n) * 0.05,  # ground
        1.6 - rng.rand(b, n) * 4.0,  # structures above ground
    )
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

    seg_label = rng.randint(0, num_classes, (b, n)).astype(np.int32)
    seg_label[rng.rand(b, n) < 0.05] = -100  # ignore sprinkles
    seg_label[~point_mask] = -100

    feats = np.take_along_axis(
        img.reshape(b, -1, 3),
        (img_indices[..., 0] * width + img_indices[..., 1])[..., None],
        axis=1,
    ).astype(dtype)

    seg_labels_2d = np.full((b, height, width), -100, np.int32)
    for i in range(b):
        seg_labels_2d[i, img_indices[i, :, 0], img_indices[i, :, 1]] = seg_label[i]

    return PointBatch(
        img=img,
        depth=depth,
        img_indices=img_indices,
        coords=coords,
        feats=feats,
        seg_label=seg_label,
        point_mask=point_mask,
        seg_labels_2d=seg_labels_2d,
    )

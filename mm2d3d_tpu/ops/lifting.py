"""2D -> 3D feature lifting: gather dense per-pixel features at the
projected image coordinates of each LiDAR point.

Replaces the reference's per-sample Python loop
(``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/2d_net/model.py:132-137``)
with one batched gather over statically padded index arrays (vmap of a 2D
take) — no per-sample ragged lists, fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lift_image_features(
    feature_map: jax.Array,  # (B, H, W, C)
    img_indices: jax.Array,  # (B, N, 2) int32 (row, col), padded arbitrarily
    mask: jax.Array,  # (B, N) bool validity of each point
) -> jax.Array:
    """Gather feature_map[b, row, col] for every point. Invalid -> 0.

    Returns (B, N, C).
    """
    h, w = feature_map.shape[1], feature_map.shape[2]
    rows = jnp.clip(img_indices[..., 0], 0, h - 1)
    cols = jnp.clip(img_indices[..., 1], 0, w - 1)

    def one(fm, r, c):
        return fm[r, c]

    out = jax.vmap(one)(feature_map, rows, cols)  # (B, N, C)
    return jnp.where(mask[..., None], out, 0)

"""Sparse-depth occlusion filter (reference lib/utils/depth.py:5-36).

`filter_depth` removes occluded LiDAR returns from a sparse depth map: a
min-pool over a local window finds the nearest surface; points whose depth
exceeds it by a relative threshold are occluded background leaking through
foreground and get zeroed.  (Unused by the shipped reference configs but part
of the capability surface — kept as a pure jax function.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def filter_depth(
    depth: jax.Array,  # (H, W) or (B, H, W, 1) sparse depth, 0 = no return
    kernel_size: int = 5,
    threshold: float = 0.1,
) -> jax.Array:
    squeeze = depth.ndim == 2
    if squeeze:
        depth = depth[None, ..., None]

    big = jnp.where(depth > 0, depth, jnp.inf)
    pad = kernel_size // 2
    nearest = -jax.lax.reduce_window(
        -big,
        -jnp.inf,
        jax.lax.max,
        (1, kernel_size, kernel_size, 1),
        (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    occluded = (depth > 0) & ((depth - nearest) / jnp.maximum(nearest, 1e-6) > threshold)
    out = jnp.where(occluded, 0.0, depth)
    return out[0, ..., 0] if squeeze else out

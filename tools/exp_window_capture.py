"""Measure Morton-window locality of the slot-conv gather indices.

A windowed slot conv would DMA ONE contiguous block of source rows per
512-voxel output tile (amortizing the descriptor cost that bounds XLA
gathers at ~0.35 G rows/s) and select rows in-VMEM via one-hot matmul.
That only works if nearly all of a tile's slot sources fall inside a
bounded window around the tile: submanifold neighbors are spatial
+/-1 offsets, and the voxels are Morton-sorted, so *most* neighbors are
nearby in rank — but z-order discontinuities at octant boundaries throw
a tail of neighbors arbitrarily far.

This probe builds the REAL topology (synthetic nuScenes-shaped batch,
the bench configuration) and reports, per level and per slot tier, the
fraction of non-empty slot sources captured by a centered window of
W rows around each 512-voxel output tile.  The uncaptured remainder
would need a fallback XLA gather; its share bounds the possible win.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

TILE = 512
WINDOWS = (1024, 2048, 4096, 8192)


def capture(src: np.ndarray, v_pad: int, n_valid: int) -> dict:
    """src: (H, V) int32 slot sources (v_pad = empty)."""
    h, v = src.shape
    tile_of = np.arange(v) // TILE
    centers = tile_of * TILE + TILE // 2
    valid = (src < v_pad) & (np.arange(v)[None, :] < n_valid)
    total = int(valid.sum())
    out = {"rows": total}
    if total == 0:
        return out
    dist = np.abs(src - centers[None, :])
    for w in WINDOWS:
        cap = int(((dist <= w // 2) & valid).sum())
        out[f"w{w}"] = cap / total
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.train.batch import build_topology

    task = _flagship_task()
    batch = make_batch(
        np.random.RandomState(0), batch_size=8, height=225, width=400,
        n_points=8192, num_classes=6, full_scale=4096,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    topo_fn = jax.jit(
        lambda b: build_topology(b, task.full_scale, task.num_planes))
    grid, hier = jax.tree_util.tree_map(np.asarray, topo_fn(batch))

    for li, lev in enumerate(hier.levels):
        n_valid = int(np.asarray(lev.num_voxels))
        for name, src in (("tier1", lev.slot_src), ("mid", lev.slot_srcm),
                          ("heavy", lev.slot_src2)):
            if src is None:
                continue
            s = np.asarray(src)
            if name in ("mid", "heavy"):
                # compacted tables: output row r maps to voxel idx[r];
                # window is around the VOXEL, so re-center by the map.
                # V-pad sentinel for invalid entries is the tier-1 table's
                # V dimension (slot_src.shape[1]) at every tier.
                idx = np.asarray(lev.slot_idxm if name == "mid"
                                 else lev.slot_idx)
                tile_of = idx // TILE
                centers = tile_of * TILE + TILE // 2
                valid = (s < np.asarray(lev.slot_src).shape[1]) & (
                    idx[None, :] < np.asarray(lev.slot_src).shape[1])
                total = int(valid.sum())
                res = {"rows": total}
                if total:
                    dist = np.abs(s - centers[None, :])
                    for w in WINDOWS:
                        res[f"w{w}"] = float(
                            ((dist <= w // 2) & valid).sum()) / total
            else:
                res = capture(s, s.shape[1], n_valid)
            caps = "  ".join(
                f"w{w}={res.get(f'w{w}', 0):.3f}" for w in WINDOWS
                if f"w{w}" in res)
            print(f"L{li} {name:5s} rows={res['rows']:8d}  {caps}",
                  flush=True)


if __name__ == "__main__":
    main()

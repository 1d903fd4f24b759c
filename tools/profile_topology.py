"""Phase breakdown of the in-graph topology build (voxelize / coarsen /
neighbor / slots).  python tools/profile_topology.py"""

from __future__ import annotations

import sys
import time

import numpy as np

ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.ops import hierarchy as H
    from mm2d3d_tpu.ops.voxelize import voxelize
    from mm2d3d_tpu.train.batch import (
        default_capacities, default_slot_caps, flatten_points,
    )

    rng = np.random.RandomState(0)
    b = make_batch(rng, batch_size=8, height=225, width=400,
                   n_points=8192, num_classes=6, full_scale=4096)
    db = jax.tree_util.tree_map(jnp.asarray, b)
    num_levels, full_scale = 7, 4096
    coords, _, _, mask, bidx = flatten_points(db)
    caps = default_capacities(coords.shape[0], num_levels, batch_size=8)
    slot_caps = default_slot_caps(num_levels, caps)

    def drain(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        return float(np.asarray(jnp.ravel(leaf)[0]))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        for _ in range(3):
            drain(f(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = f(*args)
        drain(out)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return dt

    def vox(c, bi, m):
        g = voxelize(c, bi, m, full_scale, capacity=caps[0],
                     presorted=db.coords_sorted)
        return jax.lax.optimization_barrier(g)

    def grids_only(c, bi, m):
        g = voxelize(c, bi, m, full_scale, capacity=caps[0],
                     presorted=db.coords_sorted)
        grids = [g]
        transitions = []
        for l in range(1, num_levels):
            gc, tr = H._coarsen_grid(grids[-1], capacity=caps[l])
            grids.append(gc)
            transitions.append(tr)
        return jax.lax.optimization_barrier((grids, transitions))

    def with_nbr(c, bi, m):
        g = voxelize(c, bi, m, full_scale, capacity=caps[0],
                     presorted=db.coords_sorted)
        grids = [g]
        transitions = []
        for l in range(1, num_levels):
            gc, tr = H._coarsen_grid(grids[-1], capacity=caps[l])
            grids.append(gc)
            transitions.append(tr)
        nbrs = [None] * num_levels
        nbrs[-1] = H.build_nbr(grids[-1], num_batches=8)
        for l in range(num_levels - 2, -1, -1):
            nbrs[l] = H.propagate_nbr(grids[l], transitions[l], nbrs[l + 1])
        return jax.lax.optimization_barrier((grids, transitions, nbrs))

    def full(c, bi, m):
        g = voxelize(c, bi, m, full_scale, capacity=caps[0],
                     presorted=db.coords_sorted)
        hier = H.build_hierarchy(g, num_levels, capacities=caps,
                                 slot_caps=slot_caps, num_batches=8)
        return jax.lax.optimization_barrier((g, hier))

    t_v = timeit("voxelize only", vox, coords, bidx, mask)
    t_g = timeit("+ coarsen chain (6 levels)", grids_only, coords, bidx, mask)
    t_n = timeit("+ nbr (dense coarsest + propagate)", with_nbr,
                 coords, bidx, mask)
    t_f = timeit("full (+ slot tables)", full, coords, bidx, mask)
    print(f"coarsen: {t_g - t_v:.2f}  nbr: {t_n - t_g:.2f}  "
          f"slots: {t_f - t_n:.2f}")


if __name__ == "__main__":
    main()

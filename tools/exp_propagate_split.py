"""Component split of propagate_nbr at the L1->L0 transition (the costliest).

Measures, interleaved: full propagate, parent-row gather only, child gather
only, child gather + transpose, select trees on fixed inputs.
"""

from __future__ import annotations

import itertools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.ops import hierarchy as H
    from mm2d3d_tpu.ops.voxelize import voxelize
    from mm2d3d_tpu.train.batch import default_capacities, flatten_points

    b = make_batch(np.random.RandomState(0), batch_size=8, height=225,
                   width=400, n_points=8192, num_classes=6, full_scale=4096)
    b = jax.tree_util.tree_map(jnp.asarray, b)
    coords, _, _, mask, bidx = flatten_points(b)
    caps = default_capacities(coords.shape[0], 7, batch_size=8)
    grid = voxelize(coords, bidx, mask, 4096, capacity=caps[0])
    grid_c, trans = H._coarsen_grid(grid, capacity=caps[1])
    nbr_c = H.build_nbr(grid_c)

    vf = grid.capacity
    vc = nbr_c.shape[1]

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]).sum())

    def timeit(name, f, *a, iters=30):
        jf = jax.jit(f)
        for _ in range(3):
            drain(jf(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = jf(*a)
        drain(o)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:44s} {dt:7.3f} ms")

    # full
    def full(g, t, n):
        return H.propagate_nbr(g, t, n)[0]

    # parent-row gather + transpose only
    def prow_only(t, n):
        nbr_c_rows = jnp.concatenate(
            [n.T, jnp.full((1, 27), vc, jnp.int32)], 0
        )
        return nbr_c_rows[t.parent].T.sum(0)

    # child gather only (fixed pns = parent broadcast, representative indices)
    def child_gather(t):
        child_pad = jnp.concatenate(
            [t.child, jnp.full((1, 8), vf, jnp.int32)], 0
        )
        pns = jnp.stack([jnp.minimum(t.parent + i, vc) for i in range(8)])
        return child_pad[pns].sum((0, 2))

    def child_gather_t(t):
        child_pad = jnp.concatenate(
            [t.child, jnp.full((1, 8), vf, jnp.int32)], 0
        )
        pns = jnp.stack([jnp.minimum(t.parent + i, vc) for i in range(8)])
        return child_pad[pns].transpose(0, 2, 1).sum((0, 1))

    # select trees on FIXED (precomputed) crows_t / prow_t
    nbr_c_rows = jnp.concatenate([nbr_c.T, jnp.full((1, 27), vc, jnp.int32)], 0)
    prow_t_fix = jnp.asarray(np.asarray(nbr_c_rows[trans.parent].T))
    child_pad = jnp.concatenate([trans.child, jnp.full((1, 8), vf, jnp.int32)], 0)
    pns_fix = jnp.stack([jnp.minimum(trans.parent + i, vc) for i in range(8)])
    crows_t_fix = jnp.asarray(np.asarray(child_pad[pns_fix].transpose(0, 2, 1)))

    def selects_only(g, prow_t, crows_t):
        rows = jnp.arange(vf, dtype=jnp.int32)
        par = g.coords & 1
        parx, pary, parz = (par[:, i] == 1 for i in range(3))

        def tree(c):
            def m(bb, c0, c1):
                return jnp.where(bb, c1, c0)
            return m(parx,
                     m(pary, m(parz, c[0, 0, 0], c[0, 0, 1]),
                       m(parz, c[0, 1, 0], c[0, 1, 1])),
                     m(pary, m(parz, c[1, 0, 0], c[1, 0, 1]),
                       m(parz, c[1, 1, 0], c[1, 1, 1])))

        def axis_sel(d, p):
            a = 0 if d == -1 else (1 if d == 1 else 1 - p)
            s = p if d == 0 else 1 - p
            return a, s

        cols = []
        for dx, dy, dz in H.OFFSETS_27.tolist():
            if (dx, dy, dz) == (0, 0, 0):
                cols.append(jnp.where(g.valid, rows, vf))
                continue
            cand = {}
            for px, py, pz in itertools.product((0, 1), repeat=3):
                axx, sx = axis_sel(dx, px)
                ayy, sy = axis_sel(dy, py)
                azz, sz = axis_sel(dz, pz)
                i = axx * 4 + ayy * 2 + azz
                cand[(px, py, pz)] = crows_t[i, sx * 4 + sy * 2 + sz]
            cols.append(tree(cand))
        return jnp.stack(cols, axis=0)[0]

    for _ in range(2):
        timeit("full propagate", full, grid, trans, nbr_c)
        timeit("prow gather + T", prow_only, trans, nbr_c)
        timeit("child gather (no transpose)", child_gather, trans)
        timeit("child gather + transpose", child_gather_t, trans)
        timeit("select trees (fixed inputs)", selects_only, grid,
               prow_t_fix, crows_t_fix)


if __name__ == "__main__":
    main()

"""Experiment: gather layouts in propagate_nbr.

The current form gathers (rows, 27)/(rows, 8) blocks (narrow minor dim ->
lane-padded HBM layout) and transposes back to V-minor.  Variant B asks the
gather itself to emit the slice dimension LEADING (lax.gather
offset_dims=(0,)), so the output is V-minor from the start — no transpose,
no narrow-minor materialization.

A/B is interleaved in one run to defeat chip drift.
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
    from jax import lax

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

    # build one transition + coarse nbr
    grid_c, trans = H._coarsen_grid(grid, capacity=caps[1])
    # cheat: search-built coarse nbr (we only care about propagate cost)
    nbr_c = H.build_nbr(grid_c)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    # --- variant A: current propagate_nbr
    fA = jax.jit(lambda g, t, n: H.propagate_nbr(g, t, n))

    # --- variant B: leading-slice-dim gathers
    def propagate_b(fine, trans_, nbr_c_):
        vf = fine.capacity
        vc = nbr_c_.shape[1]
        rows = jnp.arange(vf, dtype=jnp.int32)
        par = fine.coords & 1
        parx = par[:, 0] == 1
        pary = par[:, 1] == 1
        parz = par[:, 2] == 1

        def tree(c):
            def m(bb, c0, c1):
                return jnp.where(bb, c1, c0)
            return m(
                parx,
                m(pary, m(parz, c[0, 0, 0], c[0, 0, 1]),
                  m(parz, c[0, 1, 0], c[0, 1, 1])),
                m(pary, m(parz, c[1, 0, 0], c[1, 0, 1]),
                  m(parz, c[1, 1, 0], c[1, 1, 1])),
            )

        def gather_rows_t(tbl, idx):
            """tbl (N, W), idx (...,) -> (W, ...) with the slice dim LEADING."""
            dn = lax.GatherDimensionNumbers(
                offset_dims=(0,),
                collapsed_slice_dims=(0,),
                start_index_map=(0,),
            )
            out = lax.gather(
                tbl, idx[..., None].reshape(-1, 1),
                dimension_numbers=dn,
                slice_sizes=(1, tbl.shape[1]),
                mode=lax.GatherScatterMode.CLIP,
            )  # (1*W?, flatidx) -- offset dims: (1, W) both leading? check
            return out.reshape(tbl.shape[1], *idx.shape)

        nbr_c_rows = jnp.concatenate(
            [nbr_c_.T, jnp.full((1, 27), vc, jnp.int32)], 0
        )
        prow_t = gather_rows_t(nbr_c_rows, trans_.parent)  # (27, Vf)

        pns = []
        for ax, ay, az in itertools.product((0, 1), repeat=3):
            cand = {
                (px, py, pz): prow_t[(px + ax) * 9 + (py + ay) * 3 + (pz + az)]
                for px, py, pz in itertools.product((0, 1), repeat=3)
            }
            pns.append(tree(cand))
        child_pad = jnp.concatenate(
            [trans_.child, jnp.full((1, 8), vf, jnp.int32)], 0
        )
        crows_t = gather_rows_t(child_pad, jnp.stack(pns))  # (8, 8, Vf)

        def axis_sel(d, p):
            a = 0 if d == -1 else (1 if d == 1 else 1 - p)
            s = p if d == 0 else 1 - p
            return a, s

        cols = []
        for dx, dy, dz in H.OFFSETS_27.tolist():
            if (dx, dy, dz) == (0, 0, 0):
                cols.append(jnp.where(fine.valid, rows, vf))
                continue
            cand = {}
            for px, py, pz in itertools.product((0, 1), repeat=3):
                axx, sx = axis_sel(dx, px)
                ayy, sy = axis_sel(dy, py)
                azz, sz = axis_sel(dz, pz)
                i = axx * 4 + ayy * 2 + azz
                cand[(px, py, pz)] = crows_t[sx * 4 + sy * 2 + sz, i]
            cols.append(tree(cand))
        return jnp.stack(cols, axis=0)

    fB = jax.jit(lambda g, t, n: propagate_b(g, t, n))

    # correctness
    a = np.asarray(fA(grid, trans, nbr_c))
    bb = np.asarray(fB(grid, trans, nbr_c))
    print("match:", np.array_equal(a, bb))

    def timeit(name, f, iters=30):
        for _ in range(3):
            drain(f(grid, trans, nbr_c))
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = f(grid, trans, nbr_c)
        drain(o)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:32s} {dt:7.3f} ms")

    for _ in range(2):  # interleave to defeat drift
        timeit("A current (take + transpose)", fA)
        timeit("B leading-slice gathers", fB)


if __name__ == "__main__":
    main()

"""Marginal-cost microprofile of the 3D branch's building blocks.

Times op chains inside single jitted graphs (the tunneled backend's
dispatch latency + early block_until_ready make standalone op timings
meaningless; see PERFORMANCE.md).  For each component, builds a graph
that applies the op N times in sequence and one that applies it once;
marginal cost = (t_N - t_1) / (N - 1).

Usage: python tools/profile_3d.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

BATCH = 8
N_POINTS = 8192
REPS = 8
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.ops import spconv
    from mm2d3d_tpu.ops.hierarchy import build_hierarchy, build_slots_split, propagate_nbr
    from mm2d3d_tpu.ops.voxelize import voxelize
    from mm2d3d_tpu.train.batch import (
        build_topology, default_capacities, default_slot_caps, flatten_points,
    )

    rng = np.random.RandomState(0)
    batch = jax.tree_util.tree_map(
        jnp.asarray,
        make_batch(rng, batch_size=BATCH, height=225, width=400,
                   n_points=N_POINTS, num_classes=6, full_scale=4096),
    )

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def timed(f, *args):
        jf = jax.jit(f)
        for _ in range(2):
            drain(jf(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = jf(*args)
        drain(out)
        return (time.perf_counter() - t0) / ITERS * 1000

    # --- build the topology once (device-resident)
    grid, hier = jax.jit(
        lambda b: build_topology(b, 4096, 7)
    )(batch)
    planes = [16, 32, 48, 64, 80, 96, 112]

    key = jax.random.PRNGKey(0)
    print("== submanifold conv marginal cost per level ==")
    for l, lev in enumerate(hier.levels):
        ci = planes[l]
        v = lev.capacity
        x0 = jax.random.normal(key, (v, ci), jnp.bfloat16)
        w = jax.random.normal(key, (27, ci, ci), jnp.float32) * 0.1

        def chain(x, w, lev=lev, n=REPS):
            for _ in range(n):
                x = spconv.subm_conv3(x, lev, w).astype(jnp.bfloat16)
            return x

        t_n = timed(chain, x0, w)
        t_1 = timed(lambda x, w, lev=lev: chain(x, w, lev, 1), x0, w)
        marg = (t_n - t_1) / (REPS - 1)
        mode = "slots2" if lev.slot_src2 is not None else (
            "slots" if lev.slot_src is not None else "dense")
        print(f"L{l} V={v:6d} C={ci:3d} [{mode:6s}]  {marg:7.3f} ms/conv")

    print("== down/up conv marginal cost per transition ==")
    for l, tr in enumerate(hier.transitions):
        ci, co = planes[l], planes[l + 1]
        vf = hier.levels[l].capacity
        vc = hier.levels[l + 1].capacity
        xf = jax.random.normal(key, (vf, ci), jnp.bfloat16)
        wd = jax.random.normal(key, (8, ci, co), jnp.float32) * 0.1
        wu = jax.random.normal(key, (8, co, ci), jnp.float32) * 0.1

        def updown(x, wd, wu, tr=tr, n=REPS):
            for _ in range(n):
                y = spconv.down_conv2(x, tr, wd).astype(jnp.bfloat16)
                x = spconv.up_conv2(y, tr, wu).astype(jnp.bfloat16)
            return x

        t_n = timed(updown, xf, wd, wu)
        t_1 = timed(lambda x, a, b, tr=tr: updown(x, a, b, tr, 1), xf, wd, wu)
        marg = (t_n - t_1) / (REPS - 1)
        print(f"T{l} Vf={vf:6d} Vc={vc:6d}  {marg:7.3f} ms/(down+up)")

    print("== topology sub-stages (absolute, incl ~1.4ms dispatch) ==")
    coords, _, _, mask, bidx = flatten_points(batch)
    caps = default_capacities(coords.shape[0], 7, batch_size=BATCH)
    slot_caps = default_slot_caps(7, caps)

    t = timed(lambda c, bi, m: voxelize(c, bi, m, 4096, capacity=caps[0]).key_hi,
              coords, bidx, mask)
    print(f"voxelize only                 {t:7.2f} ms")

    def hier_nbr_only(c, bi, m):
        g = voxelize(c, bi, m, 4096, capacity=caps[0])
        h = build_hierarchy(g, 7, capacities=caps, slot_caps=None,
                            num_batches=BATCH)
        return sum(jnp.sum(l.nbr[0, :64]) for l in h.levels)

    t_nbr = timed(hier_nbr_only, coords, bidx, mask)
    print(f"voxelize+hier+nbr (no slots)  {t_nbr:7.2f} ms")

    def hier_full(c, bi, m):
        g = voxelize(c, bi, m, 4096, capacity=caps[0])
        h = build_hierarchy(g, 7, capacities=caps, slot_caps=slot_caps,
                            num_batches=BATCH)
        acc = sum(jnp.sum(l.nbr[0, :64]) for l in h.levels)
        return acc + sum(
            jnp.sum(l.slot_src[0, :64]) for l in h.levels
            if l.slot_src is not None
        )

    t_full = timed(hier_full, coords, bidx, mask)
    print(f"voxelize+hier+nbr+slots       {t_full:7.2f} ms")
    print(f"  -> slots marginal           {t_full - t_nbr:7.2f} ms")

    # slot build marginal per level
    for l in (0, 1, 2):
        lev = hier.levels[l]
        spec = slot_caps[l]

        def slots_chain(nbr, n=REPS, spec=spec):
            acc = jnp.zeros((), jnp.int32)
            s = nbr
            for i in range(n):
                s1, t1, idx, s2, t2, d = build_slots_split(
                    s, spec[0], spec[1], spec[2])
                acc = acc + jnp.sum(t1[0, :64]) + d
                s = s + (acc % 2).astype(s.dtype)  # serialize
            return acc

        t_n = timed(slots_chain, lev.nbr)
        t_1 = timed(lambda nbr, spec=spec: slots_chain(nbr, 1, spec), lev.nbr)
        print(f"build_slots_split L{l}          {(t_n - t_1) / (REPS - 1):7.3f} ms")

    # propagate_nbr marginal at L0
    def prop_chain(nbr_c, n=REPS):
        acc = jnp.zeros((), jnp.int32)
        s = nbr_c
        for i in range(n):
            out = propagate_nbr(hier.levels[0], hier.transitions[0], s)
            acc = acc + jnp.sum(out[0, :64])
            s = s + (acc % 2).astype(s.dtype)
        return acc

    t_n = timed(prop_chain, hier.levels[1].nbr)
    t_1 = timed(lambda x: prop_chain(x, 1), hier.levels[1].nbr)
    print(f"propagate_nbr L1->L0           {(t_n - t_1) / (REPS - 1):7.3f} ms")


if __name__ == "__main__":
    main()

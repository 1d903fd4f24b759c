"""Minimal two-point probe of the L3 submanifold-conv cost anomaly.

A fused-graph stage profile attributed ~0.85 ms/conv to L3 vs ~0.08 at L4
(same tiered-slot path, only 2x the rows).  This times just the two convs
at their real model channel widths (L3 Ci=Co=64, L4 Ci=Co=80) by chained
marginal cost, to decide whether the cliff is real or a profiling artifact.

Usage: python tools/exp_l3_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

BATCH = 8
N_POINTS = 8192
REPS = 6
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.ops import spconv
    from mm2d3d_tpu.train.batch import build_topology

    rng = np.random.RandomState(0)
    batch = make_batch(rng, batch_size=BATCH, height=225, width=400,
                       n_points=N_POINTS, num_classes=6, full_scale=4096)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

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

    grid, hier = jax.jit(lambda b: build_topology(b, 4096, 7))(batch)
    key = jax.random.PRNGKey(0)

    def marg(lev, ci):
        v = lev.capacity
        x0 = jax.random.normal(key, (v, ci), jnp.bfloat16)
        w = jax.random.normal(key, (27, ci, ci), jnp.float32) * 0.1

        def chain(x, w, n=REPS):
            for _ in range(n):
                x = spconv.subm_conv3(x, lev, w).astype(jnp.bfloat16)
            return x

        t_n = timed(chain, x0, w)
        t_1 = timed(lambda x, w: chain(x, w, 1), x0, w)
        return (t_n - t_1) / (REPS - 1)

    for l, ci in ((3, 64), (4, 80)):
        lev = hier.levels[l]
        print(f"L{l} V={lev.capacity:6d} C={ci:3d}  "
              f"{marg(lev, ci):7.3f} ms/conv", flush=True)


if __name__ == "__main__":
    main()

"""Experiment: Pallas strip-mined 3x3 s2 max pool vs XLA reduce_window,
standalone and inside the full 2D forward.  Interleaved A/B (chip drift).

python tools/exp_maxpool.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.ops.pallas import maxpool as MP

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

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
        print(f"{name:44s} {dt:8.3f} ms", flush=True)
        return dt

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 240, 400, 64).astype(np.float32)).astype(
        jnp.bfloat16
    )

    # standalone: chain 4 pools on shifted inputs to amortize dispatch
    def chain(pool):
        def f(x):
            acc = 0.0
            for i in range(4):
                acc += pool(x + i * 0.001).astype(jnp.float32).sum()
            return acc
        return f

    # numerical check on-device first
    a = MP._ref_pool(x)
    b = MP._pool_pallas(x)
    print("on-device max |diff|:",
          float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))

    timeit("reduce_window x4 standalone", chain(MP._ref_pool), x)
    timeit("pallas pool   x4 standalone", chain(MP._pool_pallas), x)
    timeit("reduce_window x4 standalone (re)", chain(MP._ref_pool), x)
    timeit("pallas pool   x4 standalone (re)", chain(MP._pool_pallas), x)

    # full 2D forward A/B via the resnet2d pool dispatch
    task = _flagship_task()
    db = jax.tree_util.tree_map(
        jnp.asarray,
        make_batch(rng, batch_size=8, height=225, width=400,
                   n_points=8192, num_classes=6, full_scale=4096),
    )
    state = task.init_state(jax.random.PRNGKey(0), db)

    def fwd2d(p2, s2):
        pr, _, _, _ = task._fwd2d(p2, s2, db, False)
        return pr["seg_logit"]

    import mm2d3d_tpu.models.resnet2d as R

    for tag, use in [("reduce_window", False), ("pallas pool", True),
                     ("reduce_window (re)", False), ("pallas pool (re)", True)]:
        R._STEM_POOL_PALLAS = use
        timeit(f"full 2D fwd [{tag}]", fwd2d, state.params2d, state.stats2d)


if __name__ == "__main__":
    main()

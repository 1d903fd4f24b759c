"""Time ONLY the jitted 2D branch (20 iters). python tools/profile_fwd2d.py"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from mm2d3d_tpu.data.synthetic import make_batch
    from __graft_entry__ import _flagship_task

    rng = np.random.RandomState(0)
    b = make_batch(rng, batch_size=8, height=225, width=400,
                   n_points=8192, num_classes=6, full_scale=4096)
    db = jax.tree_util.tree_map(jnp.asarray, b)
    task = _flagship_task()
    state = task.init_state(jax.random.PRNGKey(0), db)

    def fwd2d(p2, s2):
        pr = task._fwd2d(p2, s2, db, False)[0]
        return pr["seg_logit"]

    f = jax.jit(fwd2d)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    for _ in range(3):
        drain(f(state.params2d, state.stats2d))
    for rep in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(20):
            out = f(state.params2d, state.stats2d)
        drain(out)
        dt = (time.perf_counter() - t0) / 20 * 1000
        print(f"fwd2d: {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""In-graph ablation of the full 2D branch: measure each stage's true
in-graph cost by substituting cheap stand-ins.

python tools/profile_2d_ablate.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.models import resnet2d
    from __graft_entry__ import _flagship_task

    rng = np.random.RandomState(0)
    b = make_batch(rng, batch_size=8, height=225, width=400,
                   n_points=8192, num_classes=6, full_scale=4096)
    db = jax.tree_util.tree_map(jnp.asarray, b)

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
        print(f"{name:48s} {dt:8.2f} ms", flush=True)
        return dt

    task = _flagship_task()
    state = task.init_state(jax.random.PRNGKey(0), db)

    def fwd2d(p2, s2):
        pr, _, aux = task._fwd2d(p2, s2, db, False)[:3]
        return pr["seg_logit"]

    # --- maxpool variants (patched into resnet2d) ---
    orig_pool = nn.max_pool

    def pool_slice(x, *a, **k):  # WRONG semantics; cost floor
        return x[:, ::2, ::2, :]

    def pool_fold(x, *a, **k):
        # exact 3x3 s2 maxpool via shift-max + reshape-fold subsample
        bsz, h, w, c = x.shape
        neg = jnp.finfo(x.dtype).min
        # rows: max over dy in {-1,0,1}, then keep even rows (major axis)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), constant_values=neg)
        rm = jnp.maximum(jnp.maximum(xp[:, :-2], xp[:, 1:-1]), xp[:, 2:])
        rm = rm.reshape(bsz, h // 2, 2, w, c)[:, :, 0]  # (B, h/2, w, c)
        # cols: max over dx, then fold W-pairs into channels and lane-slice
        cp = jnp.pad(rm, ((0, 0), (0, 0), (1, 1), (0, 0)), constant_values=neg)
        cm = jnp.maximum(jnp.maximum(cp[:, :, :-2], cp[:, :, 1:-1]), cp[:, :, 2:])
        return cm.reshape(bsz, h // 2, w // 2, 2 * c)[..., :c]

    # sanity: equality on the real shape
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 240, 400, 64), jnp.bfloat16)
    ref = np.asarray(jax.jit(lambda t: orig_pool(
        t, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))))(x), np.float32)
    alt = np.asarray(jax.jit(pool_fold)(x), np.float32)
    print("pool_fold exact:", np.array_equal(ref, alt), flush=True)

    t_base = timeit("full 2D (baseline reduce_window pool)", fwd2d,
                    state.params2d, state.stats2d)

    resnet2d.nn.max_pool = pool_slice
    timeit("full 2D (pool -> stride-slice floor)", fwd2d,
           state.params2d, state.stats2d)
    resnet2d.nn.max_pool = pool_fold
    timeit("full 2D (pool -> shiftmax+fold, exact)", fwd2d,
           state.params2d, state.stats2d)
    resnet2d.nn.max_pool = orig_pool

    # --- lifting cost: return the dense map instead of lifted points ---
    def fwd2d_nolift(p2, s2):
        pr, _, aux = task._fwd2d(p2, s2, db, False)[:3]
        return pr["seg_logit_2d"]

    # (lifting still traced if it feeds preds; compare by replacing indices
    # with zeros to collapse the gather? keep simple: measure head output)
    timeit("full 2D (dense-map output only)", fwd2d_nolift,
           state.params2d, state.stats2d)


if __name__ == "__main__":
    main()

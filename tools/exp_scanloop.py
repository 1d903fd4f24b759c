"""Experiment: amortize per-call dispatch by folding bench iterations into
one jitted lax.fori_loop over stacked batches, and try the latency-hiding
scheduler.  Compares against the per-call loop of bench.py.

Usage: python tools/exp_scanloop.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

BATCH = 8
N_POINTS = 8192
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.train.batch import build_topology

    task = _flagship_task()

    def mk(seed):
        return make_batch(
            np.random.RandomState(seed), batch_size=BATCH, height=225,
            width=400, n_points=N_POINTS, num_classes=6, full_scale=4096,
        )

    batches = [jax.tree_util.tree_map(jnp.asarray, mk(s)) for s in range(4)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *batches
    )
    state = task.init_state(jax.random.PRNGKey(0), batches[0])
    p = (state.params2d, state.params3d, state.stats2d, state.stats3d)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def forward(p2, p3, s2, s3, b):
        topo = build_topology(b, task.full_scale, task.num_planes)
        p2d, _, _, _ = task._fwd2d(p2, s2, b, False)
        p3d, _, _, _ = task._fwd3d(p3, s3, b, *topo, False)
        sm2 = jax.nn.softmax(p2d["seg_logit"].reshape(-1, task.num_classes), -1)
        sm3 = jax.nn.softmax(p3d["seg_logit"], -1)
        return (sm2 + sm3) / 2

    # --- baseline: per-call loop
    fwd = jax.jit(forward)
    for _ in range(3):
        drain(fwd(*p, batches[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(ITERS):
        out = fwd(*p, batches[i % 4])
    drain(out)
    dt = time.perf_counter() - t0
    print(f"per-call loop: {dt / ITERS * 1000:8.2f} ms/iter "
          f"({BATCH * ITERS / dt:.1f} scans/s)")

    # --- one jit, fori_loop over iterations (dynamic-slice the batch stack)
    @jax.jit
    def fwd_scan(p2, p3, s2, s3, stk):
        def body(i, acc):
            b = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i % 4, axis=0, keepdims=False
                ),
                stk,
            )
            out = forward(p2, p3, s2, s3, b)
            return acc + out[0, 0]

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    for _ in range(2):
        drain(fwd_scan(*p, stacked))
    t0 = time.perf_counter()
    drain(fwd_scan(*p, stacked))
    dt = time.perf_counter() - t0
    print(f"fori-loop x{ITERS}: {dt / ITERS * 1000:8.2f} ms/iter "
          f"({BATCH * ITERS / dt:.1f} scans/s)")


if __name__ == "__main__":
    main()

"""Per-stage timing of the fused forward on the real chip.

Methodology (PERFORMANCE.md): whole-graph timings with host-readback
fences; per-stage cost by graph ablation (the tunneled backend's ~1.4 ms
dispatch latency and early-returning block_until_ready make single-op
microbenchmarks meaningless).

Usage: python tools/profile_stages.py [--train]
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
    state = task.init_state(jax.random.PRNGKey(0), batches[0])
    p = (state.params2d, state.params3d, state.stats2d, state.stats3d)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        for _ in range(3):
            drain(f(*args))
        t0 = time.perf_counter()
        out = None
        for i in range(ITERS):
            out = f(*args)
        drain(out)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:36s} {dt:8.2f} ms")
        return dt

    def topo_only(b):
        g, h = build_topology(b, task.full_scale, task.num_planes)
        acc = g.num_voxels.astype(jnp.float32)
        for lev in h.levels:
            acc = acc + lev.num_voxels
            acc = acc + jnp.sum(lev.nbr[0, :128])
            if lev.slot_src is not None:
                acc = acc + jnp.sum(lev.slot_src[0, :128])
        for tr in h.transitions:
            acc = acc + jnp.sum(tr.parent[:128])
        return acc

    def fwd3d(p2, p3, s2, s3, b):
        topo = build_topology(b, task.full_scale, task.num_planes)
        pr, _, _, _ = task._fwd3d(p3, s3, b, *topo, False)
        return pr["seg_logit"]

    def fwd2d(p2, p3, s2, s3, b):
        pr, _, _, _ = task._fwd2d(p2, s2, b, False)
        return pr["seg_logit"]

    def full(p2, p3, s2, s3, b):
        topo = build_topology(b, task.full_scale, task.num_planes)
        p2d, _, _, _ = task._fwd2d(p2, s2, b, False)
        p3d, _, _, _ = task._fwd3d(p3, s3, b, *topo, False)
        sm2 = jax.nn.softmax(p2d["seg_logit"].reshape(-1, task.num_classes), -1)
        sm3 = jax.nn.softmax(p3d["seg_logit"], -1)
        return (sm2 + sm3) / 2

    t_topo = timeit("topology only", topo_only, batches[0])
    t_3d = timeit("topo + 3D fwd", fwd3d, *p, batches[0])
    t_2d = timeit("2D fwd", fwd2d, *p, batches[0])
    t_full = timeit("full fused fwd", full, *p, batches[0])
    print(f"{'3D marginal (topo+3D - topo)':36s} {t_3d - t_topo:8.2f} ms")
    print(f"{'overlap (2D + topo3D - full)':36s} {t_3d + t_2d - t_full:8.2f} ms")
    print(f"scans/s: {BATCH * 1000 / t_full:.1f}")

    if "--train" in sys.argv:
        state = task.init_state(jax.random.PRNGKey(0), batches[0])
        step = jax.jit(task.train_step)
        rng = jax.random.PRNGKey(1)

        def train_once(state, src, trg):
            new_state, logs = step(state, src, trg, rng)
            # consume EVERY leaf of the updated state: anything not feeding
            # the returned scalar gets DCE'd by the outer jit, which
            # silently drops most of the backward + optimizer from the
            # timing (observed: 208 -> 85 ms with only the loss returned)
            acc = logs["train/loss_total"]
            for leaf in jax.tree_util.tree_leaves(new_state):
                if hasattr(leaf, "reshape") and leaf.size:
                    acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
            return acc

        def fwd_both(p2, p3, s2, s3, src, trg):
            return full(p2, p3, s2, s3, src) + full(p2, p3, s2, s3, trg)

        t_step = timeit("full train step (src+trg)", train_once, state,
                        batches[0], batches[1])
        t_f2 = timeit("both domains fwd only", fwd_both, *p,
                      batches[0], batches[1])
        print(f"{'bwd + optimizers (step - fwds)':36s} {t_step - t_f2:8.2f} ms")
        print(f"train scans/s (16/step): {16 * 1000 / t_step:.1f}")


if __name__ == "__main__":
    main()

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

        # ---- finer split of the backward+optimizer block (round-4 verdict
        # item: the ~129 ms beyond the forwards was unitemized).  Each
        # ablation consumes every live output so the outer jit cannot DCE
        # the work being measured (see train_once above).
        def consume(acc, tree):
            for leaf in jax.tree_util.tree_leaves(tree):
                if hasattr(leaf, "reshape") and getattr(leaf, "size", 0):
                    acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
            return acc

        def _loss_fn(params2d, params3d, state, src, trg, rng):
            """Inline replica of train_step's loss (both domains)."""
            from mm2d3d_tpu.train.batch import (
                build_topology as bt,
                flatten_points,
                prepare_device_batch,
            )

            src = prepare_device_batch(src)
            trg = prepare_device_batch(trg)
            ts = bt(src, task.full_scale, task.num_planes)
            tt = bt(trg, task.full_scale, task.num_planes)
            r1, r2 = jax.random.split(rng)
            _, _, labels_src, mask_src, _ = flatten_points(src)
            _, _, _, mask_trg, _ = flatten_points(trg)
            from mm2d3d_tpu.train.losses import kl_consistency

            stats2d, stats3d = state.stats2d, state.stats3d
            p2s, _, a2s, stats2d = task._fwd2d(params2d, stats2d, src, True, r1)
            p3s, _, a3s, stats3d = task._fwd3d(params3d, stats3d, src, *ts, True)
            flat2s = p2s["seg_logit"].reshape(-1, task.num_classes)
            loss = task._seg_loss(flat2s, labels_src, mask_src)
            loss += task._seg_loss(p3s["seg_logit"], labels_src, mask_src)
            loss += kl_consistency(
                a2s["seg_logit_avg"].reshape(-1, task.num_classes),
                p3s["seg_logit"], mask_src)
            loss += kl_consistency(a3s["seg_logit_point"], flat2s, mask_src)
            p2t, _, a2t, stats2d = task._fwd2d(params2d, stats2d, trg, True, r2)
            p3t, _, a3t, stats3d = task._fwd3d(params3d, stats3d, trg, *tt, True)
            flat2t = p2t["seg_logit"].reshape(-1, task.num_classes)
            loss += 0.1 * kl_consistency(
                a2t["seg_logit_avg"].reshape(-1, task.num_classes),
                p3t["seg_logit"], mask_trg)
            loss += 0.1 * kl_consistency(a3t["seg_logit_point"], flat2t, mask_trg)
            return loss, (stats2d, stats3d)

        rng2 = jax.random.PRNGKey(1)

        def grad_both(state, src, trg):
            g, (s2, s3) = jax.grad(
                lambda a, b: _loss_fn(a, b, state, src, trg, rng2),
                argnums=(0, 1), has_aux=True,
            )(state.params2d, state.params3d)
            return consume(consume(jnp.float32(0), g), (s2, s3))

        def grad_2d(state, src, trg):
            g, aux = jax.grad(
                lambda a: _loss_fn(a, state.params3d, state, src, trg, rng2),
                has_aux=True,
            )(state.params2d)
            return consume(consume(jnp.float32(0), g), aux)

        def grad_3d(state, src, trg):
            g, aux = jax.grad(
                lambda b: _loss_fn(state.params2d, b, state, src, trg, rng2),
                has_aux=True,
            )(state.params3d)
            return consume(consume(jnp.float32(0), g), aux)

        def step_no_opt(state, src, trg):
            g, aux = jax.grad(
                lambda a, b: _loss_fn(a, b, state, src, trg, rng2),
                argnums=(0, 1), has_aux=True,
            )(state.params2d, state.params3d)
            return consume(consume(jnp.float32(0), g), aux)

        def opt_only(state, g2, g3):
            up2, o2 = task.tx2d.update(g2, state.opt2d, state.params2d)
            up3, o3 = task.tx3d.update(g3, state.opt3d, state.params3d)
            import optax as _ox

            new = (_ox.apply_updates(state.params2d, up2),
                   _ox.apply_updates(state.params3d, up3), o2, o3)
            return consume(jnp.float32(0), new)

        t_gboth = timeit("fwd+bwd both branches", grad_both, state,
                         batches[0], batches[1])
        t_g2d = timeit("fwd+bwd 2D only", grad_2d, state,
                       batches[0], batches[1])
        t_g3d = timeit("fwd+bwd 3D only", grad_3d, state,
                       batches[0], batches[1])
        zeros2 = jax.tree_util.tree_map(jnp.zeros_like, state.params2d)
        zeros3 = jax.tree_util.tree_map(jnp.zeros_like, state.params3d)
        t_opt = timeit("optimizers only (2x AdamW+OneCycle)", opt_only,
                       state, zeros2, zeros3)
        print(f"{'bwd total (grad - fwds)':36s} {t_gboth - t_f2:8.2f} ms")
        print(f"{'bwd 2D marginal':36s} {t_g2d - t_f2:8.2f} ms")
        print(f"{'bwd 3D marginal':36s} {t_g3d - t_f2:8.2f} ms")
        print(f"{'step overhead (step-grad-opt)':36s} "
              f"{t_step - t_gboth - t_opt:8.2f} ms")


if __name__ == "__main__":
    main()

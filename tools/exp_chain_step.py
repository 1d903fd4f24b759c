"""Is the REAL (state-dependent) train-step chain slower than the
independent-repeat measurement?

bench.py measures `_, logs = step(state, ...)` — every iteration consumes
the SAME state (no dependency chain, no donation).  The production loop is
`state, logs = jit_step(state, ...)` with donated state.  This probes the
four combinations on the real chip, readback-fenced, interleaved A/B.

Usage: python tools/exp_chain_step.py [--iters 10]
"""

from __future__ import annotations

import argparse
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

    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu.data.synthetic import make_batch

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    task = _flagship_task()
    mk = lambda s: jax.tree_util.tree_map(  # noqa: E731
        jnp.asarray,
        make_batch(np.random.RandomState(s), batch_size=8, height=225,
                   width=400, n_points=8192, num_classes=6, full_scale=4096),
    )
    src, trg = mk(0), mk(1)
    state0 = task.init_state(jax.random.PRNGKey(0), src)
    rng = jax.random.PRNGKey(1)

    step_plain = jax.jit(task.train_step)
    step_donate = jax.jit(task.train_step, donate_argnums=(0,))

    def drain(x):
        return float(np.asarray(x.reshape(-1)[0]))

    def fresh_state():
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), state0
        )

    def run_independent(step):
        s = fresh_state()
        _, logs = step(s, src, trg, rng)
        drain(logs["train/loss_total"].reshape(1))
        t0 = time.perf_counter()
        logs = None
        for _ in range(args.iters):
            _, logs = step(s, src, trg, rng)
        drain(logs["train/loss_total"].reshape(1))
        return (time.perf_counter() - t0) / args.iters * 1000

    def run_chain(step, donate):
        s = fresh_state()
        s, logs = step(s, src, trg, rng)
        drain(logs["train/loss_total"].reshape(1))
        if donate:
            s = fresh_state()  # previous s donated? no — rebound output; ok
        t0 = time.perf_counter()
        logs = None
        for _ in range(args.iters):
            s, logs = step(s, src, trg, rng)
        drain(logs["train/loss_total"].reshape(1))
        return (time.perf_counter() - t0) / args.iters * 1000

    def run_trainer_loop(prefetch=2):
        """The REAL Trainer.fit hot path over preloaded device batches."""
        from mm2d3d_tpu.train.trainer import Trainer

        class ListLoader:
            def __init__(self, items):
                self.items = items

            def set_epoch(self, e):
                pass

            def __len__(self):
                return args.iters

            def __iter__(self):
                for i in range(args.iters):
                    yield self.items[i % len(self.items)]

        tr = Trainer(
            task, source_loader=ListLoader([src, trg]),
            target_loader=ListLoader([trg, src]),
            ckpt_dir="/tmp/exp_chain_ck", max_epochs=1,
            check_val_every_n_epoch=1000, limit_train_batches=args.iters,
            prefetch_batches=prefetch,
        )
        tr.validate = lambda epoch: {}
        tr._to_device = lambda b: b
        tr.state = fresh_state()
        tr.fit()  # warm
        # FENCE: fit returns after async dispatch; without this the timed
        # window absorbs the warm steps' still-executing device work
        # (exactly the 2x artifact the first version of this probe showed)
        drain(jax.tree_util.tree_leaves(tr.state.opt2d)[0])
        tr.start_epoch, tr.max_epochs = 1, 2
        t0 = time.perf_counter()
        tr.fit()
        drain(jax.tree_util.tree_leaves(tr.state.opt2d)[0])
        return (time.perf_counter() - t0) / args.iters * 1000

    results = {}
    for trial in range(3):
        for name, fn in (
            ("independent/no-donate", lambda: run_independent(step_plain)),
            ("chain/no-donate", lambda: run_chain(step_plain, False)),
            ("chain/donate", lambda: run_chain(step_donate, True)),
            ("trainer-loop/prefetch2", lambda: run_trainer_loop(2)),
            ("trainer-loop/prefetch0", lambda: run_trainer_loop(0)),
        ):
            ms = fn()
            results.setdefault(name, []).append(ms)
            print(f"trial {trial} {name:24s} {ms:8.1f} ms/step", flush=True)
    for name, vals in results.items():
        print(f"{name:24s} best {min(vals):.1f}  median "
              f"{sorted(vals)[len(vals)//2]:.1f}")


if __name__ == "__main__":
    main()

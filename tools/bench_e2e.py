"""Sustained END-TO-END training throughput: loader -> transfer -> device.

The device step rate (bench.py) and the loader rate (tools/bench_loader.py)
are each measured standalone; this composes them through the REAL
`Trainer.fit` hot path — fork-pool loader workers, uint8 wire-format
batches, the prefetched double-buffered `_to_device`, and the jitted train
step on the TPU — and reports one sustained scans/s number plus the
unpipelined stage split (loader wait / host->device transfer / device
step) that explains it.  Reference anchor: the DataLoader-fed Lightning fit
loop (`/root/reference/lib/dataset/__init__.py:299-389` + `run.py:291-298`),
whose epoch wall time is the reference's de-facto system metric.

Usage:
    python tools/bench_e2e.py [--scans 64] [--steps 30] [--workers 0 2 4]
                              [--no-cache] [--wire/--no-wire]

Writes one JSON line at the end (keys: e2e_train_scans_per_sec, stage
split, per-config loader rates, batch wire bytes).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

BATCH = 8  # per domain, per step (matches bench.py / PERFORMANCE.md)
N_POINTS = 8192


def tree_bytes(batch) -> int:
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(batch)
        if hasattr(x, "dtype")
    )


def make_loaders(root, cache_dir, workers, wire, seed=0):
    from mm2d3d_tpu.data.loader import Loader
    from mm2d3d_tpu.data.nuscenes import NuScenesLidarSeg

    def ds(s):
        return NuScenesLidarSeg(
            split=("train_usa",), preprocess_dir=root, nuscenes_dir=root,
            image_cache_dir=cache_dir, device_image_ops=wire,
            noisy_rot=0.1, flip_x=0.5, rot=6.2831, transl=True,
            fliplr=0.5, color_jitter=(0.4, 0.4, 0.4),
        )

    mk = lambda s: Loader(  # noqa: E731
        ds(s), batch_size=BATCH, n_points=N_POINTS, shuffle=True,
        drop_last=True, seed=seed + s, num_workers=workers, full_scale=4096,
    )
    return mk(0), mk(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--workers", type=int, nargs="*", default=[0])
    ap.add_argument("--points", type=int, default=12000)
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--no-wire", action="store_true")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    wire = not args.no_wire

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from __graft_entry__ import _flagship_task
    from bench_loader import make_on_disk_dataset
    from mm2d3d_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="mm2d3d_e2e_")
    print(f"dataset: {args.scans} scans x {args.points} pts -> {tmp}",
          flush=True)
    records = make_on_disk_dataset(tmp, args.scans, args.points)
    cache_dir = None
    if not args.no_cache:
        from mm2d3d_tpu.data.image_cache import build_image_cache

        cache_dir = osp.join(tmp, "img_cache")
        t0 = time.perf_counter()
        build_image_cache([r["camera_path"] for r in records], tmp,
                          cache_dir, (400, 225))
        print(f"cache build: {time.perf_counter() - t0:.1f}s one-time",
              flush=True)

    task = _flagship_task()
    result = {"wire_format": wire, "cache": cache_dir is not None}

    # ---- stage split (unpipelined, workers=0) ------------------------------
    src_loader, trg_loader = make_loaders(tmp, cache_dir, 0, wire)
    batches = []
    it = iter(src_loader)
    next(it)  # warm imports/native lib
    t0 = time.perf_counter()
    for _ in range(4):
        batches.append(next(it))
    t_load = (time.perf_counter() - t0) / 4
    result["stage_loader_ms_per_batch"] = round(1000 * t_load, 1)
    result["batch_wire_bytes"] = tree_bytes(batches[0])

    # transfer: device_put + fence (the tunnel/PCIe cost the step hides
    # behind double buffering)
    put = jax.tree_util.tree_map(
        lambda x: None if x is None else jax.device_put(x), batches[0]
    )
    jax.block_until_ready(put)
    t0 = time.perf_counter()
    for b in batches:
        put = jax.tree_util.tree_map(
            lambda x: None if x is None else jax.device_put(x), b
        )
        jax.block_until_ready(put)
    t_put = (time.perf_counter() - t0) / len(batches)
    result["stage_transfer_ms_per_batch"] = round(1000 * t_put, 1)

    # device step (readback-fenced, state reused)
    state = task.init_state(jax.random.PRNGKey(0), put)
    step = jax.jit(task.train_step)
    rng = jax.random.PRNGKey(1)

    def drain(x):
        return float(np.asarray(x.reshape(-1)[0]))

    for _ in range(2):
        _, logs = step(state, put, put, rng)
        drain(logs["train/loss_total"].reshape(1))
    t0 = time.perf_counter()
    for _ in range(6):
        _, logs = step(state, put, put, rng)
    drain(logs["train/loss_total"].reshape(1))
    t_step = (time.perf_counter() - t0) / 6
    result["stage_device_step_ms"] = round(1000 * t_step, 1)
    src_loader.close()

    # ---- loader scaling (pure host rate per worker count) ------------------
    rates = {}
    for w in args.workers:
        lo, _ = make_loaders(tmp, cache_dir, w, wire, seed=10)
        next(iter(lo))  # warm the pool
        t0 = time.perf_counter()
        n = 0
        for ep in range(2):
            lo.set_epoch(ep)
            for b in lo:
                n += b.batch_size
        rates[str(w)] = round(n / (time.perf_counter() - t0), 1)
        lo.close()
    result["loader_scans_per_sec_by_workers"] = rates

    # ---- the real Trainer.fit ---------------------------------------------
    best_workers = max(rates, key=lambda k: rates[k])
    src_loader, trg_loader = make_loaders(tmp, cache_dir, int(best_workers),
                                          wire, seed=20)
    trainer = Trainer(
        task, source_loader=src_loader, target_loader=trg_loader,
        ckpt_dir=osp.join(tmp, "ckpts"), max_epochs=1,
        check_val_every_n_epoch=1000, limit_train_batches=args.steps,
    )
    trainer.validate = lambda epoch: {}  # no eval/ckpt inside the timing
    # warm epoch: compile + file caches (limit_train_batches bounds it)
    trainer.fit()
    # FENCE before timing: fit returns after async dispatch; without a
    # readback here the measured epoch would absorb the warm epoch's
    # still-executing device work (measured exactly 2x step time)
    float(np.asarray(
        jax.tree_util.tree_leaves(trainer.state.opt2d)[0]
    ).reshape(-1)[0])
    # measured epoch through the same fit path
    trainer.start_epoch, trainer.max_epochs = 1, 2
    g0 = trainer.global_step
    t0 = time.perf_counter()
    trainer.fit()
    # fence: a readback so queued device work is counted in the wall clock
    float(np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params2d)[0]
    ).reshape(-1)[0])
    dt = time.perf_counter() - t0
    steps = trainer.global_step - g0  # actual steps this epoch
    result["e2e_steps_measured"] = steps
    result["e2e_train_scans_per_sec"] = round(2 * BATCH * steps / dt, 2)
    result["e2e_ms_per_step"] = round(1000 * dt / steps, 1)

    # ---- controls: attribute the e2e-vs-device gap ------------------------
    # (a) precollated host batches (no loader work in the loop)
    class ListLoader:
        def __init__(self, items):
            self.items = items

        def set_epoch(self, e):
            pass

        def __len__(self):
            return args.steps

        def __iter__(self):
            for i in range(args.steps):
                yield self.items[i % len(self.items)]

    host_batches = []
    it = iter(src_loader)
    for _ in range(4):
        host_batches.append(next(it))

    def timed_fit(tr):
        tr.validate = lambda epoch: {}
        # fresh copy: jit_train_step donates its input state, so sharing
        # one state object across trainers aliases deleted buffers
        tr.state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), trainer.state
        )
        tr.max_epochs = 1
        tr.fit()  # warm
        float(np.asarray(  # fence (see above)
            jax.tree_util.tree_leaves(tr.state.opt2d)[0]
        ).reshape(-1)[0])
        tr.start_epoch, tr.max_epochs = 1, 2
        t0 = time.perf_counter()
        tr.fit()
        float(np.asarray(
            jax.tree_util.tree_leaves(tr.state.params2d)[0]
        ).reshape(-1)[0])
        return (time.perf_counter() - t0) / args.steps * 1000

    tr_a = Trainer(task, source_loader=ListLoader(host_batches),
                   target_loader=ListLoader(host_batches),
                   ckpt_dir=osp.join(tmp, "ck2"), max_epochs=1,
                   check_val_every_n_epoch=1000,
                   limit_train_batches=args.steps)
    result["ctrl_host_batches_ms_per_step"] = round(timed_fit(tr_a), 1)

    # (b) preloaded DEVICE batches (no loader, no transfer)
    dev_batches = [jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.asarray(x), b
    ) for b in host_batches]
    jax.block_until_ready(jax.tree_util.tree_leaves(dev_batches[0]))
    tr_b = Trainer(task, source_loader=ListLoader(dev_batches),
                   target_loader=ListLoader(dev_batches),
                   ckpt_dir=osp.join(tmp, "ck3"), max_epochs=1,
                   check_val_every_n_epoch=1000,
                   limit_train_batches=args.steps)
    tr_b._to_device = lambda b: b
    result["ctrl_device_batches_ms_per_step"] = round(timed_fit(tr_b), 1)
    src_loader.close()
    trg_loader.close()

    print(json.dumps(result), flush=True)
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

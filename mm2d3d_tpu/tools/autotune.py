"""Production-host self-validation: re-measure the backend-sensitive
defaults on THE CURRENT host/backend and print the recommended config.

Four of the framework's performance defaults were calibrated on an
anomalous backend (a single-core host reaching its TPU through a ~150 MB/s
tunnel with ~1.4 ms dispatch): buffer donation OFF, host-side C++ topology
OFF, prefetch_batches=2, loader workers 0.  On a production PCIe/pod host
any of them could flip sign.  This command re-runs the deciding A/B probes
(distilled from tools/exp_chain_step.py, bench.py and tools/bench_e2e.py)
at the flagship problem size and prints what THIS host actually wants:

1. donation      — state-chained train step, donate vs no-donate;
2. host topology — fused on-device topology build vs host (C++) build
                   pipelined in a thread pool;
3. prefetch      — the real Trainer.fit hot path at depths 0/2/4;
4. workers       — fork-pool loader scaling on the real per-sample
                   augment+pad pipeline.

Usage:
    python -m mm2d3d_tpu.tools.autotune [--iters 8] [--skip workers ...]

(also reachable as `python -m mm2d3d_tpu.tools.doctor --perf`)

Run it once on any new host; apply the printed recommendation via
MM2D3D_DONATE / train.host_topology / train.prefetch_batches /
train.num_workers.  PERFORMANCE.md "First run on a new host" documents
the expected output on this calibration host.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BATCH = 8
N_POINTS = 8192


def _flagship_task():
    # the ONE flagship definition (also behind bench.py and
    # __graft_entry__), so the probed graphs are byte-identical to the
    # production graph the other tools measure
    from ..flagship import flagship_task

    return flagship_task()


def _mk_batch(seed):
    import jax
    import jax.numpy as jnp

    from ..data.synthetic import make_batch

    return jax.tree_util.tree_map(
        jnp.asarray,
        make_batch(np.random.RandomState(seed), batch_size=BATCH, height=225,
                   width=400, n_points=N_POINTS, num_classes=6,
                   full_scale=4096),
    )


def _drain(x):
    return float(np.asarray(x).reshape(-1)[0])


def probe_donation(task, src, trg, state0, iters):
    """State-chained train step: donate vs no-donate (interleaved x2)."""
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(1)
    steps = {
        "no-donate": jax.jit(task.train_step),
        "donate": jax.jit(task.train_step, donate_argnums=(0,)),
    }

    def fresh():
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), state0
        )

    out = {k: [] for k in steps}
    for _ in range(2):  # interleaved trials
        for name, step in steps.items():
            s = fresh()
            s, logs = step(s, src, trg, rng)  # warm (compile cached)
            _drain(logs["train/loss_total"])
            t0 = time.perf_counter()
            for _ in range(iters):
                s, logs = step(s, src, trg, rng)
            _drain(logs["train/loss_total"])
            out[name].append((time.perf_counter() - t0) / iters * 1000)
    ms = {k: min(v) for k, v in out.items()}
    rec = "0" if ms["no-donate"] <= ms["donate"] * 1.05 else "1"
    return ms, {"MM2D3D_DONATE": rec}


def probe_host_topology(task, host_batches, dev_batches, state, iters):
    """Fused on-device topology vs host C++ topology pipelined ahead."""
    import jax

    from .. import native

    if not native.available():
        return {"host-topo": None, "device-topo": None}, {
            "host_topology": False, "note": "native lib unavailable"}

    from concurrent.futures import ThreadPoolExecutor

    from ..data.host_topology import topology_for_batch
    from ..train.batch import build_topology

    def fwd(params2d, params3d, stats2d, stats3d, batch, topo):
        p2, _, _, _ = task._fwd2d(params2d, stats2d, batch, False)
        p3, _, _, _ = task._fwd3d(params3d, stats3d, batch, *topo, False)
        return p2["seg_logit"], p3["seg_logit"]

    params = (state.params2d, state.params3d, state.stats2d, state.stats3d)
    fwd_pre = jax.jit(fwd)
    fwd_full = jax.jit(
        lambda p2, p3, s2, s3, b: fwd(
            p2, p3, s2, s3, b,
            build_topology(b, task.full_scale, task.num_planes),
        )
    )

    def build(i):
        t = topology_for_batch(host_batches[i % len(host_batches)],
                               task.full_scale, task.num_planes)
        return jax.tree_util.tree_map(jax.numpy.asarray, t)

    ms = {}
    # device build
    _drain(fwd_full(*params, dev_batches[0])[0])
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fwd_full(*params, dev_batches[i % len(dev_batches)])
    _drain(out[0])
    ms["device-topo"] = (time.perf_counter() - t0) / iters * 1000
    # host build, pipelined 3 deep
    pool = ThreadPoolExecutor(max_workers=3)
    _drain(fwd_pre(*params, dev_batches[0], build(0))[0])
    t0 = time.perf_counter()
    futs = [pool.submit(build, i) for i in range(iters)]
    for i, fut in enumerate(futs):
        out = fwd_pre(*params, dev_batches[i % len(dev_batches)], fut.result())
    _drain(out[0])
    ms["host-topo"] = (time.perf_counter() - t0) / iters * 1000
    pool.shutdown()
    return ms, {"host_topology": ms["host-topo"] < ms["device-topo"] * 0.95}


def probe_prefetch(task, host_batches, state0, iters, depths=(0, 2, 4)):
    """The real Trainer.fit hot path (host batches -> _to_device -> step)."""
    import jax
    import jax.numpy as jnp

    from ..train.trainer import Trainer

    class ListLoader:
        def __init__(self, items, n):
            self.items, self.n = items, n

        def set_epoch(self, e):
            pass

        def __len__(self):
            return self.n

        def __iter__(self):
            for i in range(self.n):
                yield self.items[i % len(self.items)]

    ms = {}
    for depth in depths:
        tr = Trainer(
            task, source_loader=ListLoader(host_batches, iters),
            target_loader=ListLoader(host_batches[::-1], iters),
            ckpt_dir="/tmp/mm2d3d_autotune_ck", max_epochs=1,
            check_val_every_n_epoch=1000, limit_train_batches=iters,
            prefetch_batches=depth,
        )
        tr.validate = lambda epoch: {}
        tr.state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), state0
        )
        tr.fit()  # warm epoch
        _drain(jax.tree_util.tree_leaves(tr.state.opt2d)[0])  # fence
        tr.start_epoch, tr.max_epochs = 1, 2
        t0 = time.perf_counter()
        tr.fit()
        _drain(jax.tree_util.tree_leaves(tr.state.opt2d)[0])
        ms[str(depth)] = (time.perf_counter() - t0) / iters * 1000
    best = min(ms, key=lambda k: ms[k])
    # prefer the smaller depth within 3% (less memory pinned)
    for d in sorted(ms, key=int):
        if ms[d] <= ms[best] * 1.03:
            best = d
            break
    return ms, {"prefetch_batches": int(best)}


class SynthDataset:
    """Representative host cost: the real 3D augment + in-bounds filter
    (collate then pads/Morton-sorts, as for any dataset).  Module-level so
    the worker pool (forkserver context) can pickle it."""

    def __len__(self):
        return 64

    def __getitem__(self, index, rng=None):
        from ..data.augment import augment_and_scale_3d

        rng = rng or np.random.RandomState(index)
        n = 24000
        pts = rng.randn(n, 3).astype(np.float32) * 20
        coords, _, _, _ = augment_and_scale_3d(
            pts, 20.0, 4096, rng, noisy_rot=0.1, flip_x=0.5,
            rot_z=6.2831, transl=True,
        )
        coords = coords.astype(np.int64)
        keep = ((coords >= 0) & (coords < 4096)).all(1)
        coords = coords[keep]
        m = len(coords)
        h, w = 225, 400
        return {
            "img": (rng.rand(h, w, 3) * 255).astype(np.uint8),
            "depth": np.zeros((h, w, 1), np.float32),
            "img_indices": np.stack(
                [rng.randint(0, h, m), rng.randint(0, w, m)], 1
            ).astype(np.int64),
            "coords": coords,
            "feats": rng.rand(m, 3).astype(np.float32),
            "seg_label": rng.randint(0, 6, m).astype(np.int64),
        }


def probe_workers(iters, worker_counts=(0, 2, 4)):
    """Worker-pool scaling of the real per-sample augment+pad host pipeline.

    Times one FULL epoch after a full warm epoch: the pooled loader
    pre-submits a ~2-batch readahead window, so timing from mid-epoch
    (after a warm batch) hands the pool up to 2 batches of free head
    start and overstates its rate vs num_workers=0.  A complete epoch has
    no freebies — the window refills inside the first timed next() and
    drains to empty by the last — and the warm epoch absorbs the one-time
    pool/imports startup for both paths."""
    del iters  # epoch length (len(SynthDataset()) / BATCH) fixes the work
    from ..data.loader import Loader

    rates = {}
    for w in worker_counts:
        lo = Loader(SynthDataset(), batch_size=BATCH, n_points=N_POINTS,
                    shuffle=True, seed=0, num_workers=w, full_scale=4096)
        try:
            n_warm = sum(b.batch_size for b in lo)  # warm full epoch
            t0 = time.perf_counter()
            n = sum(b.batch_size for b in lo)
            rates[str(w)] = n / (time.perf_counter() - t0)
            assert n == n_warm
        finally:
            lo.close()
    best = max(rates, key=lambda k: rates[k])
    for w in sorted(rates, key=int):  # smallest within 5%
        if rates[w] >= rates[best] * 0.95:
            best = w
            break
    return {k: round(v, 1) for k, v in rates.items()}, {"num_workers": int(best)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["donation", "host_topology", "prefetch",
                             "workers"])
    args = ap.parse_args(argv)

    import faulthandler
    import signal

    # kill -USR1 <pid> dumps all Python stacks — first-line diagnosis when
    # a probe appears stuck on an unfamiliar backend
    faulthandler.register(signal.SIGUSR1)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    measured, recommended = {}, {}

    # The workers probe MUST run before anything initializes the device
    # backend: its fork pools inherit the parent's address space, and
    # forking a process that holds live TPU-client/gRPC threads leaves
    # their locks permanently held in the children (observed: the pooled
    # loader deadlocks when the probe runs after jax.devices()).  Real
    # runs are safe — run.py builds its loader pools before first device
    # use — but this tool also probes the device paths, so order matters.
    if "workers" not in args.skip:
        ms, rec = probe_workers(args.iters)
        measured["loader_scans_per_sec_by_workers"] = ms
        recommended.update(rec)
        print(f"workers: {ms} -> {rec}", flush=True)

    print(f"autotune: backend={jax.devices()[0].platform} "
          f"devices={len(jax.devices())} iters={args.iters}", flush=True)

    if {"donation", "host_topology", "prefetch"} <= set(args.skip):
        print(json.dumps({"measured": measured, "recommended": recommended}))
        return 0

    task = _flagship_task()
    host_batches = []
    dev_batches = []
    from ..data.synthetic import make_batch as _mb

    for s in range(2):
        hb = _mb(np.random.RandomState(s), batch_size=BATCH, height=225,
                 width=400, n_points=N_POINTS, num_classes=6, full_scale=4096)
        host_batches.append(hb)
        dev_batches.append(_mk_batch(s))
    state = task.init_state(jax.random.PRNGKey(0), dev_batches[0])

    if "donation" not in args.skip:
        ms, rec = probe_donation(task, dev_batches[0], dev_batches[1],
                                 state, args.iters)
        measured["train_step_ms_by_donation"] = {
            k: round(v, 1) for k, v in ms.items()}
        recommended.update(rec)
        print(f"donation: {measured['train_step_ms_by_donation']} -> {rec}",
              flush=True)

    if "host_topology" not in args.skip:
        ms, rec = probe_host_topology(task, host_batches, dev_batches,
                                      state, args.iters)
        measured["fwd_ms_by_topology"] = {
            k: None if v is None else round(v, 1) for k, v in ms.items()}
        recommended.update(rec)
        print(f"host_topology: {measured['fwd_ms_by_topology']} -> {rec}",
              flush=True)

    if "prefetch" not in args.skip:
        ms, rec = probe_prefetch(task, host_batches, state, args.iters)
        measured["fit_step_ms_by_prefetch"] = {
            k: round(v, 1) for k, v in ms.items()}
        recommended.update(rec)
        print(f"prefetch: {measured['fit_step_ms_by_prefetch']} -> {rec}",
              flush=True)

    print(json.dumps({"measured": measured, "recommended": recommended}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""Headline benchmark: LiDAR scans/sec/chip for the fused 2D+3D forward.

Matches BASELINE.json's north-star metric ("LiDAR scans/sec/chip (fused
2D+3D fwd)") at the reference's nuScenes problem size: 400x225 RGB + sparse
depth, ~8k LiDAR points/scan, 5 cm voxels (full_scale 4096, 7 U-Net levels),
6 classes, eval-mode forward of both branches + softmax ensemble.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "band_lo",
"band_hi", ...}.  `value` is the MEDIAN of REPS interleaved same-process
repetitions; band_lo/band_hi are their min/max, so the recorded number
carries its own run-to-run uncertainty (PERFORMANCE.md "Bench protocol").

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.json "published": {}).  We anchor against an ESTIMATE of the
reference pipeline's per-GPU forward throughput of 20 scans/sec/GPU (batch-16
DDP training on 2 GPUs at ~1000 steps/epoch; typical epoch wall time for
this workload).  BASELINE.json's stretch target is >= 10x that.
`tools/baseline_anchor.py` brackets the estimate with what THIS host can
measure (the torch CPU floor and the FLOPs-roofline ceiling of the
reference 2D branch); its BASELINE_ANCHOR.json, when present, is folded
into the output so the recorded benchmark carries the anchor evidence.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_SCANS_PER_SEC_ESTIMATE = 20.0
# Forward batch: 8 matches the reference's per-GPU train batch and the
# r01-r04 bench series; MM2D3D_BENCH_BATCH overrides (inference batching
# is free — measure the batch the deployment would use).
BATCH = int(os.environ.get("MM2D3D_BENCH_BATCH", "8"))
N_POINTS = 8192
WARMUP = 3
ITERS = 20
REPS = 3  # interleaved same-process repetitions -> median + min/max band


def main():
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the fwd+train graphs take minutes to
    # compile cold over the tunneled backend; cached reruns start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu import native
    from mm2d3d_tpu.data.synthetic import make_batch

    task = _flagship_task()

    def mk(seed):
        return make_batch(
            np.random.RandomState(seed), batch_size=BATCH, height=225,
            width=400, n_points=N_POINTS, num_classes=6, full_scale=4096,
        )

    batches = [mk(s) for s in range(4)]
    dev_batches = [jax.tree_util.tree_map(jnp.asarray, b) for b in batches]
    state = task.init_state(jax.random.PRNGKey(0), dev_batches[0])

    def forward(params2d, params3d, stats2d, stats3d, batch, topo):
        p2, _, _, _ = task._fwd2d(params2d, stats2d, batch, False)
        p3, _, _, _ = task._fwd3d(params3d, stats3d, batch, *topo, False)
        sm2 = jax.nn.softmax(p2["seg_logit"].reshape(-1, task.num_classes), -1)
        sm3 = jax.nn.softmax(p3["seg_logit"], -1)
        return (sm2 + sm3) / 2

    fwd = jax.jit(forward)
    params = (state.params2d, state.params3d, state.stats2d, state.stats3d)

    def drain(x):
        # On the tunneled TPU backend block_until_ready() returns before
        # execution completes; a host readback is the only reliable fence.
        return float(np.asarray(x.reshape(-1)[0]))

    # Host (C++) topology pipelining is a real win on PCIe-attached hosts,
    # but THIS environment reaches its TPU through a ~150MB/s tunnel where
    # shipping ~34MB of topology per batch costs ~0.45s — far more than the
    # ~65ms on-device build.  Measure what this hardware actually runs:
    # on-device topology.  (Set MM2D3D_BENCH_HOST_TOPO=1 to measure the
    # host-pipelined path on real PCIe hosts.)
    use_host = native.available() and os.environ.get("MM2D3D_BENCH_HOST_TOPO") == "1"
    if use_host:
        from mm2d3d_tpu.data.host_topology import topology_for_batch

        def build(i):
            t = topology_for_batch(batches[i % 4], task.full_scale, task.num_planes)
            return jax.tree_util.tree_map(jnp.asarray, t)

        pool = ThreadPoolExecutor(max_workers=3)
        for w in range(max(WARMUP, 4)):
            drain(fwd(*params, dev_batches[w % 4], build(w)))

        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            futures = [pool.submit(build, i) for i in range(ITERS)]
            out = None
            for i, fut in enumerate(futures):
                out = fwd(*params, dev_batches[i % 4], fut.result())
            drain(out)  # program-order execution: draining the last fences all
            samples.append(BATCH * ITERS / (time.perf_counter() - t0))
        pool.shutdown()
    else:
        from mm2d3d_tpu.train.batch import build_topology

        fwd_full = jax.jit(
            lambda p2, p3, s2, s3, b: forward(
                p2, p3, s2, s3, b,
                build_topology(b, task.full_scale, task.num_planes),
            )
        )
        # warm every rotated batch: the first timed rep otherwise pays the
        # other batches' first-touch cost and drags band_lo down
        for w in range(max(WARMUP, 4)):
            drain(fwd_full(*params, dev_batches[w % 4]))
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = None
            for i in range(ITERS):
                out = fwd_full(*params, dev_batches[i % 4])
            drain(out)
            samples.append(BATCH * ITERS / (time.perf_counter() - t0))

    result = {
        "metric": "lidar_scans_per_sec_per_chip_fused_fwd",
        "value": round(float(np.median(samples)), 2),
        "unit": "scans/s/chip",
        "vs_baseline": round(
            float(np.median(samples)) / REFERENCE_SCANS_PER_SEC_ESTIMATE, 2
        ),
        "band_lo": round(min(samples), 2),
        "band_hi": round(max(samples), 2),
        "reps": REPS,
        "iters_per_rep": ITERS,
    }
    anchor_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_ANCHOR.json"
    )
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor = json.load(f)
        result["baseline"] = {
            "estimate_scans_per_sec_per_gpu": REFERENCE_SCANS_PER_SEC_ESTIMATE,
            "anchor_cpu_floor": anchor.get("torch_cpu_this_host_scans_per_sec"),
            "anchor_train_ceiling": anchor.get(
                "ref_train_ceiling_scans_per_sec_per_gpu"
            ),
            "anchor_fwd_ceiling": anchor.get(
                "ref_fwd_ceiling_scans_per_sec_per_gpu"
            ),
        }

    # The actual workload: the full UDA train step at the reference's
    # PER-GPU batch 8 (global 16 over 2 GPUs) — source + target forwards,
    # backward, and both optimizers (reference train.py:186-292 +
    # HybridOptim).  Throughput counts both domains' scans per step (16 =
    # 8 src + 8 trg), the same accounting as PERFORMANCE.md.  Batch 16
    # src+trg per chip exceeds the 16 GB HBM (measured 19.9 GB).
    # MM2D3D_BENCH_SKIP_TRAIN=1 skips it (halves compile time).
    if os.environ.get("MM2D3D_BENCH_SKIP_TRAIN") != "1":
        result.update(_train_bench(task, mk, drain))
    print(json.dumps(result))


TRAIN_BATCH = 8  # per chip, per domain: 16 scans per step counting src+trg
TRAIN_ITERS = 10


def _train_bench(task, mk_fwd, drain):
    import jax
    import jax.numpy as jnp

    from mm2d3d_tpu.data.synthetic import make_batch

    def mk(seed):
        return jax.tree_util.tree_map(
            jnp.asarray,
            make_batch(
                np.random.RandomState(seed), batch_size=TRAIN_BATCH,
                height=225, width=400, n_points=N_POINTS, num_classes=6,
                full_scale=4096,
            ),
        )

    src, trg = mk(10), mk(11)
    state = task.init_state(jax.random.PRNGKey(0), src)
    step = jax.jit(task.train_step)  # no donation: state reused across iters
    rng = jax.random.PRNGKey(1)

    for _ in range(2):
        _, logs = step(state, src, trg, rng)
        drain(logs["train/loss_total"].reshape(1))
    samples = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        logs = None
        for _ in range(TRAIN_ITERS):
            _, logs = step(state, src, trg, rng)
        drain(logs["train/loss_total"].reshape(1))
        samples.append(2 * TRAIN_BATCH * TRAIN_ITERS
                       / (time.perf_counter() - t0))
    med = float(np.median(samples))
    return {
        "train_scans_per_sec_per_chip": round(med, 2),
        "train_band_lo": round(min(samples), 2),
        "train_band_hi": round(max(samples), 2),
        "train_step_ms": round(2 * TRAIN_BATCH / med * 1000, 1),
        "train_batch_per_domain": TRAIN_BATCH,
    }


if __name__ == "__main__":
    main()

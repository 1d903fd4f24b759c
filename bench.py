"""Headline benchmark: LiDAR scans/sec/chip for the fused 2D+3D forward.

Matches BASELINE.json's north-star metric ("LiDAR scans/sec/chip (fused
2D+3D fwd)") at the reference's nuScenes problem size: 400x225 RGB + sparse
depth, ~8k LiDAR points/scan, 5 cm voxels (full_scale 4096, 7 U-Net levels),
6 classes, eval-mode forward of both branches + softmax ensemble.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.json "published": {}).  We anchor against an ESTIMATE of the
reference pipeline's per-GPU forward throughput of 20 scans/sec/GPU (batch-16
DDP training on 2 GPUs at ~1000 steps/epoch; typical epoch wall time for
this workload).  BASELINE.json's stretch target is >= 10x that.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SCANS_PER_SEC_ESTIMATE = 20.0
BATCH = 8
N_POINTS = 8192
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu.data.synthetic import make_batch

    task = _flagship_task()
    rng = np.random.RandomState(0)
    batch = jax.tree_util.tree_map(
        jnp.asarray,
        make_batch(rng, batch_size=BATCH, height=225, width=400,
                   n_points=N_POINTS, num_classes=6, full_scale=4096),
    )
    state = task.init_state(jax.random.PRNGKey(0), batch)

    from mm2d3d_tpu.train.batch import build_topology

    def forward(params2d, params3d, stats2d, stats3d, batch):
        topo = build_topology(batch, task.full_scale, task.num_planes)
        p2, _, _, _ = task._fwd2d(params2d, stats2d, batch, False)
        p3, _, _, _ = task._fwd3d(params3d, stats3d, batch, *topo, False)
        sm2 = jax.nn.softmax(p2["seg_logit"].reshape(-1, task.num_classes), -1)
        sm3 = jax.nn.softmax(p3["seg_logit"], -1)
        return (sm2 + sm3) / 2

    fwd = jax.jit(forward)
    args = (state.params2d, state.params3d, state.stats2d, state.stats3d, batch)

    def drain(x):
        # On the tunneled TPU backend block_until_ready() returns before
        # execution completes; a host readback is the only reliable fence.
        return float(np.asarray(x.reshape(-1)[0]))

    for _ in range(WARMUP):
        drain(fwd(*args))

    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fwd(*args)
    drain(out)  # device executes in program order; draining the last
    # execution fences all of them.
    dt = time.perf_counter() - t0

    scans_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "lidar_scans_per_sec_per_chip_fused_fwd",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s/chip",
                "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

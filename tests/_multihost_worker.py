"""Worker process for the true multi-process test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices (8 global over 2 processes),
initializes the real `jax.distributed` runtime against a localhost
coordinator, loads ONLY its per-process shard through `data.loader.Loader
(num_shards, shard_id)`, assembles the global batch via
`parallel.mesh.shard_batch` (the `make_array_from_process_local_data` seam),
and runs one sharded train step.  Prints the pmean'd loss — identical on
every process and equal to the single-process 8-device run by construction.

Run with process_id -1 for the single-process 8-device reference.
"""

from __future__ import annotations

import os
import sys


def make_dataset(n_scans: int):
    """Deterministic per-index samples in the datasets' output schema."""
    import numpy as np

    class TinyDataset:
        def __len__(self):
            return n_scans

        def __getitem__(self, index, rng=None):
            r = np.random.RandomState(1000 + index)
            n = 96
            h, w = 16, 24
            img = r.rand(h, w, 3).astype(np.float32)
            idx = np.stack(
                [r.randint(0, h, n), r.randint(0, w, n)], 1
            ).astype(np.int64)
            depth = np.zeros((h, w, 1), np.float32)
            depth[idx[:, 0], idx[:, 1], 0] = r.rand(n) * 50
            return {
                "img": img,
                "depth": depth,
                "img_indices": idx,
                "coords": r.randint(0, 64, (n, 3)).astype(np.int64),
                "feats": r.rand(n, 3).astype(np.float32),
                "seg_label": r.randint(0, 4, n).astype(np.int64),
                "seg_labels_2d": np.full((h, w), -100, np.int64),
            }

    return TinyDataset()


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    n_local_dev = 4

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_dev if process_id >= 0 else 8}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if process_id >= 0:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=2,
            process_id=process_id,
        )
        assert jax.device_count() == 8 and jax.local_device_count() == 4

    import jax.numpy as jnp
    import numpy as np

    from mm2d3d_tpu.data.loader import Loader
    from mm2d3d_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_train_step,
        shard_batch,
    )
    from mm2d3d_tpu.train.step import MM2D3DTask

    num_shards = 2 if process_id >= 0 else 1
    shard_id = max(process_id, 0)
    per_process = 8 // num_shards
    loader = Loader(
        make_dataset(16), batch_size=per_process, n_points=128,
        shuffle=True, drop_last=True, seed=7,
        num_shards=num_shards, shard_id=shard_id,
    )

    task = MM2D3DTask(
        num_classes=4, full_scale=64, num_planes=2, m=4,
        compute_dtype=jnp.float32, axis_name="data",
        optimizer_2d={"name": "adamw", "lr": 1e-3},
        optimizer_3d={"name": "adamw", "lr": 1e-3},
    )
    mesh = make_mesh()

    batches = [shard_batch(b, mesh) for _, b in zip(range(2), loader)]
    state = task.init_state(jax.random.PRNGKey(0), batches[0])
    step = make_sharded_train_step(task, mesh)
    for i, b in enumerate(batches):
        state, logs = step(state, b, b, jax.random.PRNGKey(5))
        loss = float(np.asarray(jax.device_get(logs["train/loss_total"])))
        print(f"STEP {i} LOSS {loss:.10f}", flush=True)
    print("WORKER OK", flush=True)


if __name__ == "__main__":
    main()

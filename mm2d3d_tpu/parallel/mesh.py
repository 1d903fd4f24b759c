"""Data-parallel execution over a device mesh (NCCL-DDP equivalent).

The reference parallelizes with PyTorch-Lightning DDP over NCCL: global
batch split across GPUs, gradient all-reduce
(``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/run.py:52-54,262-268``).

TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over the "data" axis,
batches sharded on their leading dimension, parameters replicated, and
`shard_map` around the train step so every device computes on its local
shard only (the per-step sort-based voxelizer stays device-local — no
cross-device collectives except the gradient/stat `pmean`).  Scaling to a
multi-host slice only changes the device list (`jax.distributed` runtime);
collectives ride ICI within a slice.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.batch import PointBatch

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_spec() -> P:
    return P(DATA_AXIS)


def shard_batch(batch: PointBatch, mesh: Mesh) -> PointBatch:
    """Place a host batch onto the mesh, sharded along the batch dimension.

    Single-host: `batch` is the full global batch, device_put sharded.
    Multi-host (jax.process_count() > 1): `batch` is this PROCESS's local
    shard (the loaders shard by process, `data.loader.Loader(num_shards)`);
    the global array is assembled from the per-process shards without any
    cross-host data movement.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    multihost = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(task, mesh: Mesh):
    """Wrap `task.train_step` with shard_map over the data axis.

    `task.axis_name` must be "data" so gradients/batch-stats/log scalars are
    pmean'd inside the step (DDP all-reduce equivalent).
    """
    assert task.axis_name == DATA_AXIS, "task must be built with axis_name='data'"
    from jax.sharding import PartitionSpec

    replicated = PartitionSpec()
    data = PartitionSpec(DATA_AXIS)

    def step(state, src, trg, rng):
        return task.train_step(state, src, trg, rng)

    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(replicated, data, data, replicated),
        out_specs=(replicated, replicated),
        check_vma=False,
    )
    # donation off by default — see MM2D3DTask jit helpers (donated-state
    # chains measured up to 10x slower on the tunneled backend)
    from ..train.step import MM2D3DTask

    return jax.jit(mapped, donate_argnums=MM2D3DTask._donate((0,)))


def make_sharded_viz_forward(task, mesh: Mesh):
    """Qualitative-figure forward under shard_map (batch-sharded in/out).

    Multi-process note: EVERY process must call this (it is an SPMD
    computation over global arrays); only process 0 then reads its local
    shard and draws the figure (`train.trainer.Trainer._log_images`).
    """
    from jax.sharding import PartitionSpec

    replicated = PartitionSpec()
    data = PartitionSpec(DATA_AXIS)

    mapped = jax.shard_map(
        lambda state, batch: task.viz_forward(state, batch),
        mesh=mesh,
        in_specs=(replicated, data),
        out_specs=data,
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_eval_step(task, mesh: Mesh):
    """Eval under shard_map: each device accumulates its local confusion
    matrices; they are psum'd so the returned metrics are global."""
    assert task.axis_name == DATA_AXIS

    from jax.sharding import PartitionSpec

    replicated = PartitionSpec()
    data = PartitionSpec(DATA_AXIS)

    def step(state, batch, metrics):
        import jax.numpy as jnp

        new_metrics, logs = task.eval_step(state, batch, metrics)
        # metrics passed in replicated; each device added its local counts.
        # Sum the *deltas* so replicated input + global delta stays correct.
        delta = jax.tree_util.tree_map(
            lambda new, old: jax.lax.psum(new - old, DATA_AXIS), new_metrics, metrics
        )
        summed = jax.tree_util.tree_map(lambda old, d: old + d, metrics, delta)
        # losses are masked means over each shard's valid points: average
        # them weighted by the per-shard valid count (psum num/denom), not
        # pmean — a padded-tail shard with FEW (or zero: pure filler) valid
        # points would otherwise bias the reported val loss toward its
        # degenerate 0 value.  Other scalars (overflow counters) stay pmean.
        w = logs.get("valid_weight")
        if w is not None:
            wsum = jax.lax.psum(w, DATA_AXIS)
            out_logs = {
                k: (
                    jax.lax.psum(v * w, DATA_AXIS) / jnp.maximum(wsum, 1.0)
                    if k.startswith("loss")
                    else wsum if k == "valid_weight"
                    else jax.lax.pmean(v, DATA_AXIS)
                )
                for k, v in logs.items()
            }
        else:
            out_logs = jax.lax.pmean(logs, DATA_AXIS)
        return summed, out_logs

    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(replicated, data, replicated),
        out_specs=(replicated, replicated),
        check_vma=False,
    )
    from ..train.step import MM2D3DTask

    return jax.jit(mapped, donate_argnums=MM2D3DTask._donate((2,)))

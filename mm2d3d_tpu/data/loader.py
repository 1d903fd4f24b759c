"""Host-side data loading: worker pools, deterministic RNG, batch assembly.

Replaces torch DataLoader + Lightning's "max_size_cycle" multi-loader
(``lib/dataset/__init__.py:299-389``, ``run.py:280-282``) with a
forkserver-based worker pool that materializes statically padded
`PointBatch`es.  Per-sample
RNG is derived from (seed, epoch, index) so runs are reproducible regardless
of worker scheduling (the reference seeds each worker once, making sample
augmentations depend on worker assignment).
"""

from __future__ import annotations

import itertools
import os
import time
from multiprocessing import get_context
from typing import Iterator, Optional

import numpy as np

# Worker start method.  Default FORKSERVER: the server process is exec'd
# fresh, so pool children never inherit the parent's device-backend state —
# fork()ing a process that holds live TPU-client/gRPC threads copies their
# held locks into the child, which deadlocks the pool (observed on the
# axon backend whenever a pool starts after jax.devices()).  Datasets are
# pickled to the server's children (all shipped datasets are plain
# data + paths).  MM2D3D_POOL_CTX=fork restores raw fork for exotic
# unpicklable datasets — then create loaders BEFORE first device use.
# As with every spawning start method, user SCRIPTS that define custom
# datasets must be import-safe (top-level work behind an
# `if __name__ == "__main__":` guard) — forkserver children re-import
# the main module, and an unguarded script re-runs itself in each worker.
_POOL_CTX = os.environ.get("MM2D3D_POOL_CTX", "forkserver")

from ..train.batch import PointBatch
from .base import collate

_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_get(args):
    index, seed = args
    rng = np.random.RandomState(seed)
    return _WORKER_DATASET.__getitem__(index, rng=rng)


class Loader:
    """Iterates a dataset as PointBatches; one epoch per __iter__ call."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        n_points: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
        full_scale: Optional[int] = None,
        pad_last: bool = False,
    ):
        """`batch_size` is the PER-PROCESS batch.  With `num_shards` > 1
        (multi-host training: one process per host), every process samples
        the same global order (same seed) and takes its `shard_id` slice of
        each global batch of `batch_size * num_shards` scans — each host
        loads only its own shard (SURVEY §2.7 DCN/multi-host story).

        `pad_last` pads a partial tail batch to the full `batch_size` with
        fully-masked filler samples (zero metric/loss contribution) so
        every batch has the same static shape — no tail recompile, and
        device meshes can always shard the leading dim.  Sharded loaders
        (`num_shards` > 1, not drop_last) pad regardless: equal per-process
        batch counts are required for the collectives, and padding (unlike
        dropping) keeps multi-host evaluation exact."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.n_points = n_points
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.pad_last = pad_last
        # Host-side Morton sort scale (None disables; see data.base.collate).
        # MUST equal the model/voxelizer full_scale when set: a larger value
        # here would host-sort points the device later masks invalid,
        # breaking voxelize(presorted=True)'s sortedness contract (silent
        # table corruption).  The registry wires the model's value through
        # (`run.build_datamodule`); the None default keeps directly
        # constructed loaders on the always-safe device-sort path.
        self.full_scale = full_scale
        self.epoch = 0
        # within-epoch restart counter (max_size_cycle): folded into the
        # per-sample seed so the shorter loader RE-DRAWS augmentations on
        # every cycle (torch DataLoader re-draws too; without it the second
        # cycle replays bit-identical augmentations, shrinking augmentation
        # diversity exactly on the smaller UDA domain).  Reset by set_epoch,
        # so (seed, epoch, cycle, index) stays fully reproducible.
        self.cycle = 0
        self._pool = None
        self._inflight = None  # pending pool results (drained by close()
        # and at the next __iter__ after an abandoned epoch)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self.cycle = 0

    def set_cycle(self, cycle: int):
        self.cycle = cycle

    def __len__(self) -> int:
        n = len(self.dataset)
        g = self.batch_size * self.num_shards
        if self.drop_last:
            return n // g
        # sharded eval loaders PAD the partial global tail batch instead of
        # dropping it (equal per-process batch counts for the collectives,
        # exact coverage of every scan; see __iter__)
        return (n + g - 1) // g

    def _sample_seed(self, index: int) -> int:
        return (
            self.seed * 1_000_003 + self.epoch * 97
            + self.cycle * 15_485_863 + index
        ) % (2**31 - 1)

    def _pool_handle(self):
        if self.num_workers > 0 and self._pool is None:
            ctx = get_context(_POOL_CTX)
            self._pool = ctx.Pool(
                self.num_workers, initializer=_worker_init, initargs=(self.dataset,)
            )
        return self._pool

    def __iter__(self) -> Iterator[PointBatch]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)

        g = self.batch_size * self.num_shards
        lo = self.shard_id * self.batch_size
        batches = []  # (index array, number of trailing padding entries)
        for i in range(0, n, g):
            if i + g > n:  # partial GLOBAL tail batch
                if self.drop_last:
                    # train: drop the whole GLOBAL tail batch.  Filtering
                    # each shard's slice by ITS length would let low shards
                    # keep a full slice of a partial global batch while high
                    # shards drop theirs — unequal per-process batch counts,
                    # and multi-host collectives deadlock.
                    continue
                if self.num_shards > 1 or self.pad_last:
                    # eval: PAD the tail so every process still sees a full
                    # batch and every scan is evaluated exactly once.  The
                    # filler repeats a real index; its samples are marked
                    # `_pad_tail_` so pad_sample masks every point / sets
                    # all labels -100 — zero contribution to losses or
                    # confusion matrices (the reference evaluates every
                    # scan, train.py:297-339; dropping the tail
                    # under-reported multi-host mIoU by up to
                    # batch*shards - 1 scans).
                    b = order[i + lo : i + lo + self.batch_size]
                    n_pad = self.batch_size - len(b)
                    fill = np.full(n_pad, order[i], dtype=order.dtype)
                    batches.append((np.concatenate([b, fill]), n_pad))
                    continue
            b = order[i + lo : i + lo + self.batch_size]
            if len(b):
                batches.append((b, 0))

        def finish(samples, n_pad):
            if n_pad:
                samples = list(samples)
                samples[len(samples) - n_pad:] = [
                    {**s, "_pad_tail_": True}
                    for s in samples[len(samples) - n_pad:]
                ]
            return collate(samples, self.n_points, full_scale=self.full_scale)

        pool = self._pool_handle()
        if pool is None:
            for idxs, n_pad in batches:
                samples = [
                    self.dataset.__getitem__(
                        int(i), rng=np.random.RandomState(self._sample_seed(int(i)))
                    )
                    for i in idxs
                ]
                yield finish(samples, n_pad)
        else:
            # BOUNDED submission window (not one big imap over the epoch):
            # an epoch-sized backlog can fill the pool's task pipe, and
            # `Pool.terminate()` then deadlocks joining its task-feeder
            # thread blocked mid-`put` (observed whenever a consumer stops
            # early — limit_train_batches, exceptions — and close() runs).
            # A ~2-batch window keeps workers reading ahead while keeping
            # the in-flight backlog far below the pipe capacity.
            from collections import deque

            # a previous iteration abandoned mid-epoch (limit_train_batches,
            # exceptions) leaves its window of results in flight; drain them
            # first or the workers stay blocked on the clogged result pipe
            # and this epoch's tasks never run
            leftover = self._inflight
            deadline = time.monotonic() + 60  # total, not per result
            while leftover:
                try:
                    leftover.popleft().get(
                        timeout=max(0.1, deadline - time.monotonic()))
                except Exception:
                    pass

            args = iter(
                (int(i), self._sample_seed(int(i)))
                for b, _ in batches
                for i in b
            )
            window = max(2 * self.batch_size, 4 * self.num_workers)
            pending: deque = deque()
            self._inflight = pending  # close() drains these (see below)

            def refill():
                while len(pending) < window:
                    a = next(args, None)
                    if a is None:
                        return
                    pending.append(pool.apply_async(_worker_get, (a,)))

            refill()
            for idxs, n_pad in batches:
                samples = []
                for _ in idxs:
                    samples.append(pending.popleft().get())
                    refill()
                yield finish(samples, n_pad)
            self._inflight = None

    def iterate(self, num_iterations: int) -> Iterator[PointBatch]:
        """Yield exactly `num_iterations` batches, cycling epochs with
        reshuffling (reference lib/utils/sampler.py IterationBasedBatchSampler)."""
        produced = 0
        while produced < num_iterations:
            for batch in self:
                yield batch
                produced += 1
                if produced >= num_iterations:
                    return
            self.set_epoch(self.epoch + 1)

    def close(self):
        if self._pool is not None:
            # Drain in-flight results, then close GRACEFULLY.  Never
            # Pool.terminate() with results in flight: workers block
            # mid-`put` of multi-hundred-KB samples on the full result
            # pipe, and terminate() deadlocks joining the feeder thread
            # against those clogged pipes (observed hard-hang whenever a
            # consumer stopped early — limit_train_batches, probe loops).
            # The window bound above keeps this drain to <= ~2 batches.
            inflight = getattr(self, "_inflight", None)
            deadline = time.monotonic() + 60  # total, not per result
            while inflight:
                try:
                    inflight.popleft().get(
                        timeout=max(0.1, deadline - time.monotonic()))
                except Exception:
                    pass  # worker error/timeout: still unclogs the pipe
            self._inflight = None
            self._pool.close()
            # Bound the join: with the result pipe drained above, join()
            # returns promptly unless a worker is wedged INSIDE
            # dataset.__getitem__ (disk/NFS stall, fork-context deadlock).
            # Those tasks keep running after the drain's .get(timeout)
            # gave up, and a bare join() would then hang the whole process
            # (run.py closes loaders in a finally precisely to shut down
            # cleanly).  Once the pipe is unclogged, terminate() no longer
            # risks the feeder-thread deadlock — kill the wedged worker.
            import threading

            joiner = threading.Thread(target=self._pool.join, daemon=True)
            joiner.start()
            joiner.join(timeout=30)
            if joiner.is_alive():
                self._pool.terminate()
                joiner.join(timeout=30)
            self._pool = None


def prefetch_topology_pairs(
    pair_iter,
    full_scale: int,
    num_levels: int,
    capacities=None,
    workers: int = 3,
    depth: int = 4,
):
    """Pipeline host (C++) topology construction with device compute.

    Wraps an iterator of (src, trg) PointBatch pairs; yields
    (src, trg, topo_src, topo_trg) with topologies built in a thread pool
    `depth` batches ahead (the C++ ops release the GIL via ctypes).
    """
    from concurrent.futures import ThreadPoolExecutor

    from .host_topology import topology_for_batch

    def job(pair):
        src, trg = pair
        ts = topology_for_batch(src, full_scale, num_levels, capacities)
        tt = topology_for_batch(trg, full_scale, num_levels, capacities)
        return src, trg, ts, tt

    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending = []
        it = iter(pair_iter)
        try:
            for _ in range(depth):
                pending.append(pool.submit(job, next(it)))
        except StopIteration:
            pass
        while pending:
            done = pending.pop(0)
            try:
                pending.append(pool.submit(job, next(it)))
            except StopIteration:
                pass
            yield done.result()


def prefetched(gen, depth: int = 2):
    """Run a generator in a background thread, `depth` items ahead.

    Used by the Trainer to overlap host work (loader collate + the async
    `jax.device_put` issue) with device compute — the double-buffered
    host->device pipeline (the reference gets this from torch DataLoader
    prefetch + pinned-memory copies, ``lib/dataset/__init__.py:299-389``).
    Exceptions in the generator propagate to the consumer.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err = []
    stop = threading.Event()

    def fill():
        try:
            for x in gen:
                while not stop.is_set():
                    try:
                        q.put(x, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate to the consuming thread
            err.append(e)
        finally:
            while True:
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    if stop.is_set():
                        break  # consumer already gone

    t = threading.Thread(target=fill, daemon=True)
    t.start()
    try:
        while True:
            x = q.get()
            if x is sentinel:
                t.join()
                if err:
                    raise err[0]
                return
            yield x
    finally:
        # consumer broke out early (limit_train_batches / exception):
        # unblock and retire the fill thread
        stop.set()


def max_size_cycle(source: Loader, target: Loader):
    """Pair source/target batches, cycling the shorter loader (Lightning's
    multiple_trainloader_mode="max_size_cycle").

    Each within-epoch restart of a loader bumps its cycle counter
    (`Loader.set_cycle`) so the repeated domain draws FRESH augmentations
    per cycle while staying reproducible across reruns."""
    n = max(len(source), len(target))

    def cycled(loader):
        for c in itertools.count():
            if hasattr(loader, "set_cycle"):
                loader.set_cycle(c)
            for batch in loader:
                yield batch

    src_it, trg_it = cycled(source), cycled(target)
    for _ in range(n):
        yield next(src_it), next(trg_it)

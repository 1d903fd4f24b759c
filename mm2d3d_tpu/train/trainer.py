"""Training orchestration: fit/validate/test loop, checkpointing, resume.

Functional equivalent of the reference's Lightning harness
(``experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/run.py:37-305`` +
``train.py:341-489``):

- per-epoch loop over paired source/target batches (max_size_cycle);
- validation every ``check_val_every_n_epoch`` on [target-val, target-test]
  loaders, printing per-class IoUs for 2D/3D/ensemble;
- model selection: best ``val/target/iou`` (2D checkpoint) and
  ``val/target/iou_3d`` (3D checkpoint), plus ``last`` for resume — via
  orbax; best-IoU scalars persist in checkpoint metadata
  (on_save_checkpoint equivalent, train.py:475-489);
- resume from ``ckpts/last`` (run.py:132-140);
- fit then test (run.py:291-301).

All device work is the jitted steps from `train.step`; this file is plain
Python orchestration.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import Loader, max_size_cycle
from ..utils.logging import rank_zero
from .metrics import iou_per_class
from .step import EvalMetrics, MM2D3DTask, TrainState

# capacity-overflow monitors -> suggested remedy; an overflow corrupts
# GRADIENTS (train.batch.default_slot_caps), so both trainer log paths
# (per-step flush with a logger, epoch-end history scan without) warn
_OVERFLOW_FIXES = {
    "train/nbr_slot_overflow":
        "raise the slot caps (train.slot_profile: dense for 64-beam "
        "scans, or explicit slot_caps)",
    "train/voxel_overflow_levels":
        "raise the level capacities (train.batch.default_capacities)",
}


class CheckpointIO:
    """last/best_2d/best_3d checkpoints + metadata via orbax.

    Multi-process: every process participates in the (distributed) orbax
    save/restore — orbax coordinates them — but the sidecar ``meta.json``
    is written by process 0 only (shared-filesystem write race otherwise).
    """

    def __init__(self, ckpt_dir: str):
        import orbax.checkpoint as ocp

        self.dir = osp.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return osp.join(self.dir, name)

    def save(self, name: str, state: TrainState, meta: Dict):
        path = self._path(name)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()  # orbax saves are async
        if rank_zero():
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f)

    def restore(self, name: str, template: TrainState):
        path = self._path(name)
        state = self._ckpt.restore(path, template)
        meta = {}
        if osp.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        return state, meta

    def exists(self, name: str) -> bool:
        return osp.exists(self._path(name))


class Trainer:
    def __init__(
        self,
        task: MM2D3DTask,
        source_loader: Loader,
        target_loader: Loader,
        val_loader: Optional[Loader] = None,
        test_loader: Optional[Loader] = None,
        ckpt_dir: str = "ckpts",
        max_epochs: int = 1,
        check_val_every_n_epoch: int = 1,
        class_names=None,
        logger=None,
        seed: int = 42,
        limit_train_batches: Optional[int] = None,
        limit_val_batches: Optional[int] = None,
        fast_dev_run: bool = False,
        train_log_images_step: Optional[int] = None,
        val_log_images_step: Optional[int] = None,
        class_palette=None,
        viz_dir: Optional[str] = None,
        strict_eval_points: bool = False,
        strict_eval_overflow: bool = False,
        host_topology: bool = False,
        mesh=None,  # jax.sharding.Mesh for data-parallel training
        prefetch_batches: int = 2,  # host->device double buffering depth
        # (0 disables): loader collate + async device_put run in a
        # background thread `depth` pairs ahead of the step dispatch
    ):
        self.task = task
        self.source_loader = source_loader
        self.target_loader = target_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.ckpt = CheckpointIO(ckpt_dir)
        self.max_epochs = max_epochs
        self.check_val_every = check_val_every_n_epoch
        self.class_names = class_names or [
            f"class_{i}" for i in range(task.num_classes)
        ]
        self.logger = logger
        self.seed = seed
        self.limit_train_batches = 2 if fast_dev_run else limit_train_batches
        self.limit_val_batches = 2 if fast_dev_run else limit_val_batches
        if fast_dev_run:
            self.max_epochs = 1
        self.train_log_images_step = train_log_images_step
        self.val_log_images_step = val_log_images_step
        if isinstance(class_palette, str):
            from ..utils.visualize import PALETTES

            class_palette = PALETTES[class_palette]
        self.class_palette = class_palette
        self.viz_dir = viz_dir
        # point-budget truncation policy: scans beyond n_points are cut by
        # pad_sample; during eval that silently changes the metric (the
        # reference evaluates every in-bounds point), so surface it — and in
        # strict mode refuse to report a metric computed on truncated scans
        self.strict_eval_points = strict_eval_points
        # same policy for dropped conv hits at eval (see _run_eval)
        self.strict_eval_overflow = strict_eval_overflow
        if host_topology:
            from ..native import available

            host_topology = available()
        self.host_topology = host_topology
        self.mesh = mesh
        self.prefetch_batches = prefetch_batches
        self._sharded_train = None
        self._sharded_eval = None
        self._sharded_viz = None
        if mesh is not None:
            from ..parallel.mesh import (
                make_sharded_eval_step,
                make_sharded_train_step,
                make_sharded_viz_forward,
            )

            assert task.axis_name is not None, (
                "multi-device training needs MM2D3DTask(axis_name='data')"
            )
            self._sharded_train = make_sharded_train_step(task, mesh)
            self._sharded_eval = make_sharded_eval_step(task, mesh)
            self._sharded_viz = make_sharded_viz_forward(task, mesh)
            self.host_topology = False  # topo is built inside the sharded step
        # stdout/figure side-effects are process-0 only in multi-process
        # runs (reference rank_zero_only, lib/logging/__init__.py:12);
        # metric values are pmean'd/psum'd so every process agrees anyway
        self._rank0 = rank_zero()

        self.global_step = 0
        self.start_epoch = 0
        self.best = {
            "best_target_iou": 0.0,
            "best_target_iou_3d": 0.0,
            "best_target_iou_avg": 0.0,
        }
        self.state: Optional[TrainState] = None
        self._rng = jax.random.PRNGKey(seed)

    # -- lifecycle -----------------------------------------------------------

    def init_or_resume(self, example_batch, resume: bool = False):
        self.state = self.task.init_state(jax.random.PRNGKey(self.seed), example_batch)
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)
        if resume and self.ckpt.exists("last"):
            self.state, meta = self.ckpt.restore("last", self.state)
            self.best.update(meta.get("best", {}))
            self.start_epoch = meta.get("epoch", -1) + 1
            self.global_step = meta.get("global_step", 0)
            if self._rank0:
                print(
                    f"resumed from epoch {self.start_epoch}, "
                    f"step {self.global_step}"
                )

    def _to_device(self, batch):
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            return shard_batch(batch, self.mesh)
        return jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.asarray(x), batch
        )

    # -- train ---------------------------------------------------------------

    def fit(self, resume: bool = False):
        assert self.source_loader is not None
        first = next(iter(self.source_loader))
        if self.state is None:
            self.init_or_resume(self._to_device(first), resume=resume)

        pending_logs = None  # (step, device logs) awaiting batched readback
        overflow_hist = []  # logger=None: retained per-step overflow scalars
        self._overflow_warned = set()
        for epoch in range(self.start_epoch, self.max_epochs):
            self.source_loader.set_epoch(epoch)
            self.target_loader.set_epoch(epoch)
            t_epoch = time.time()
            n = 0
            pair_iter = max_size_cycle(self.source_loader, self.target_loader)
            if self.host_topology:
                from ..data.loader import prefetch_topology_pairs

                pair_iter = prefetch_topology_pairs(
                    pair_iter, self.task.full_scale, self.task.num_planes
                )
            def to_device_items(it):
                for item in it:
                    if self.host_topology:
                        s, t, ts, tt = item
                        yield (self._to_device(s), self._to_device(t),
                               self._to_device(ts), self._to_device(tt))
                    else:
                        s, t = item
                        yield self._to_device(s), self._to_device(t), None, None

            items = to_device_items(pair_iter)
            if self.prefetch_batches:
                from ..data.loader import prefetched

                # double buffering: loader collate + the async device_put
                # issue run a couple of batches ahead in a background
                # thread, overlapping host input with device compute
                items = prefetched(items, self.prefetch_batches)
            for src_dev, trg_dev, topo_src, topo_trg in items:
                if (
                    self.train_log_images_step
                    and self.global_step % self.train_log_images_step == 0
                ):
                    self._log_images(src_dev, "train_source")
                    self._log_images(trg_dev, "train_target")
                if self._sharded_train is not None:
                    self.state, logs = self._sharded_train(
                        self.state, src_dev, trg_dev, self._rng
                    )
                elif topo_src is not None:
                    self.state, logs = self.task.jit_train_step_pre(
                        self.state, src_dev, trg_dev, self._rng,
                        topo_src, topo_trg,
                    )
                else:
                    self.state, logs = self.task.jit_train_step(
                        self.state, src_dev, trg_dev, self._rng
                    )
                self.global_step += 1
                n += 1
                # one-step-delayed, batched readback: fetching the
                # PREVIOUS step's scalars (already computed) keeps the
                # dispatch pipeline full, and one stacked transfer
                # replaces a blocking per-key float() round trip —
                # per-scalar fetches over this backend's tunnel cost
                # ~1.4 ms each, more than the whole train step saves
                if pending_logs is not None and self.logger is not None:
                    self._flush_train_logs(*pending_logs)
                elif pending_logs is not None:
                    # no logger: skip the per-step readback but RETAIN the
                    # overflow device scalars (references only, no
                    # dispatch) — scanned at epoch end so a mid-epoch
                    # capacity overflow still warns
                    s_prev, l_prev = pending_logs
                    overflow_hist.append((s_prev, {
                        k: l_prev[k] for k in _OVERFLOW_FIXES if k in l_prev
                    }))
                pending_logs = (self.global_step, logs)
                if self.limit_train_batches and n >= self.limit_train_batches:
                    break
            if pending_logs is not None:
                # flushed even with logger=None: the overflow monitors it
                # carries warn about gradient corruption — a direct-API run
                # without a logger must still hear that (one readback per
                # epoch in that case)
                self._flush_train_logs(*pending_logs)
                pending_logs = None
            self._check_overflow_history(overflow_hist)
            overflow_hist = []
            if self._rank0:
                print(
                    f"epoch {epoch}: {n} steps in {time.time() - t_epoch:.1f}s",
                    flush=True,
                )

            if (epoch + 1) % self.check_val_every == 0 or epoch == self.max_epochs - 1:
                self.validate(epoch)

        return self.state

    def _warn_overflow(self, key: str, value: float, step: int) -> None:
        if key in self._overflow_warned:
            return
        self._overflow_warned.add(key)
        if self._rank0:
            print(
                f"WARNING: {key} = {value:.0f} at step {step} — "
                f"dropped topology entries make the computed gradients "
                f"inconsistent with the forward; {_OVERFLOW_FIXES[key]}.",
                flush=True,
            )

    def _check_overflow_history(self, hist) -> None:
        """logger=None path: per-step flushes are skipped (each readback
        over this backend costs more than a train step), so the fit loop
        RETAINS the per-step overflow device scalars — zero extra
        dispatches — and this scans them once per epoch.  Without it, an
        overflow on any batch but the epoch's last would go unwarned."""
        if not hist:
            return
        for key in _OVERFLOW_FIXES:
            entries = [(s, d[key]) for s, d in hist if key in d]
            if not entries:
                continue
            arr = np.asarray(jnp.stack([v for _, v in entries]))
            nz = np.nonzero(arr > 0)[0]
            if nz.size:
                self._warn_overflow(
                    key, float(arr[nz[0]]), entries[int(nz[0])][0])

    def _flush_train_logs(self, step: int, logs) -> None:
        keys = list(logs)
        vals = np.asarray(
            jnp.stack([jnp.asarray(logs[k], jnp.float32) for k in keys])
        )  # ONE host transfer for all scalars
        host = dict(zip(keys, map(float, vals)))
        # capacity monitors: a scalar in the metric stream is easy to miss,
        # and slot overflow corrupts GRADIENTS (train.batch.default_slot_caps)
        for key in _OVERFLOW_FIXES:
            if host.get(key, 0.0) > 0:
                self._warn_overflow(key, host[key], step)
        if self.logger is not None:
            self.logger.log_metrics(
                {**host, **self.task.current_lrs(step)}, step,
            )

    def _log_images(self, batch, stage: str):
        """Qualitative point-overlay figure of the first sample
        (reference train.py:226-241 -> lib/utils/visualize.py:474-553).

        Multi-process: the viz forward is an SPMD computation so EVERY
        process runs it; only process 0 reads its first local sample and
        draws/writes the figure (rank_zero_only equivalent)."""
        if self.class_palette is None or self.viz_dir is None:
            return
        from ..utils.visualize import draw_points_image_labels_with_confidence

        if self._sharded_viz is not None:
            out = self._sharded_viz(self.state, batch)
        else:
            out = self.task.jit_viz_forward(self.state, batch)
        if not self._rank0:
            return

        def first(x):
            # a globally-sharded array's remote shards are not addressable
            # from this process — read the first sample of OUR local shard
            if jax.process_count() > 1 and hasattr(x, "addressable_data"):
                return np.asarray(x.addressable_data(0))[0]
            return np.asarray(x[0])

        mask = first(batch.point_mask)
        idx = first(batch.img_indices)[mask]
        img0 = first(batch.img)
        if img0.dtype == np.uint8:  # wire format ships raw uint8 pixels
            img0 = img0.astype(np.float32) / 255.0
            if batch.jitter_params is not None:
                # the network consumed the device-jittered image
                # (prepare_device_batch); draw the SAME image as backdrop,
                # not the raw pixels, so the figure matches the input
                from ..ops.image import apply_color_jitter

                img0 = np.asarray(
                    apply_color_jitter(
                        jnp.asarray(img0)[None],
                        jnp.asarray(first(batch.jitter_params))[None],
                    )[0]
                )
        path = osp.join(
            self.viz_dir, f"{stage}_step{self.global_step}.png"
        )
        os.makedirs(self.viz_dir, exist_ok=True)
        draw_points_image_labels_with_confidence(
            img0,
            first(out["pred_2d_dense"]),
            first(out["pred_2d_points"])[mask],
            first(out["pred_3d_points"])[mask],
            first(out["confidence"])[mask],
            first(batch.seg_label)[mask],
            idx,
            color_palette=self.class_palette,
            out_path=path,
        )
        if self.logger is not None:
            # route the figure to the experiment trackers too (reference
            # train.py:226-241 logs them to W&B, not just to disk)
            self.logger.log_image(f"{stage}/figure", path, self.global_step)

    # -- eval ----------------------------------------------------------------

    def _run_eval(self, loader: Loader, stage: str) -> Dict[str, float]:
        metrics = EvalMetrics.create(self.task.num_classes)
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            metrics = replicate(metrics, self.mesh)
        losses = []
        points_dropped = 0
        for i, batch in enumerate(loader):
            if batch.n_dropped is not None:
                points_dropped += int(np.sum(batch.n_dropped))
            batch_dev = self._to_device(batch)
            if (
                self.val_log_images_step
                and i % self.val_log_images_step == 0
            ):
                # qualitative val-time figures every val_log_images_step
                # batches (reference vkitti train.py:341-356)
                self._log_images(batch_dev, stage.replace("/", "_"))
            eval_fn = self._sharded_eval or self.task.jit_eval_step
            metrics, logs = eval_fn(self.state, batch_dev, metrics)
            # keep device scalars; convert once after the loop so eval
            # batches pipeline instead of blocking on per-key readbacks
            losses.append(logs)
            if self.limit_val_batches and i + 1 >= self.limit_val_batches:
                break

        if points_dropped:
            msg = (
                f"{stage}: {points_dropped} in-bounds points were truncated "
                f"by the n_points={loader.n_points} budget — the reported "
                "IoU misses them (the reference evaluates every point). "
                "Raise train.n_points to cover the dataset."
            )
            if self.strict_eval_points:
                raise RuntimeError(msg)
            if self._rank0:
                print(f"WARNING: {msg}", flush=True)

        out = {f"{stage}/points_dropped": float(points_dropped)}
        for head, cm in (
            ("", metrics.cm_2d),
            ("_3d", metrics.cm_3d),
            ("_avg", metrics.cm_avg),
        ):
            ious = np.asarray(iou_per_class(cm))
            if self._rank0:
                print(f"{stage} {head or '2d'}:")
                print(
                    [(c, round(float(v), 4))
                     for c, v in zip(self.class_names, ious)]
                )
            out[f"{stage}/iou{head}"] = float(ious.mean())
        if losses:
            keys = list(losses[0])
            stacked = np.asarray(
                jnp.stack(
                    [
                        jnp.stack(
                            [jnp.asarray(l[k], jnp.float32) for l in losses]
                        )
                        for k in keys
                    ]
                )
            )  # one transfer for the whole eval run
            # loss scalars are masked means: average across batches weighted
            # by each batch's valid point count so the padded tail batch
            # (few real samples) doesn't count like a full one
            w = (
                stacked[keys.index("valid_weight")]
                if "valid_weight" in keys else None
            )
            for j, k in enumerate(keys):
                if k == "valid_weight":
                    continue
                if w is not None and k.startswith("loss"):
                    out[f"{stage}/{k}"] = float(
                        (stacked[j] * w).sum() / max(w.sum(), 1.0)
                    )
                else:
                    out[f"{stage}/{k}"] = float(stacked[j].mean())

        # slot overflow at EVAL corrupts the numbers users actually report
        # (dropped conv hits change the predictions) — same loud treatment
        # as truncated points above, not just an averaged scalar
        overflow = out.get(f"{stage}/nbr_slot_overflow", 0.0)
        if overflow > 0:
            msg = (
                f"{stage}: neighbour-slot overflow (mean {overflow:.1f} "
                "dropped conv hits/batch) — the reported IoU is computed on "
                "truncated sparse convolutions. Raise the slot caps "
                "(train.slot_profile: dense, or explicit slot_caps)."
            )
            if self.strict_eval_overflow:
                raise RuntimeError(msg)
            if self._rank0:
                print(f"WARNING: {msg}", flush=True)
        return out

    def validate(self, epoch: int) -> Dict[str, float]:
        results = {}
        if self.val_loader is not None:
            results.update(self._run_eval(self.val_loader, "val/target"))
        if self.test_loader is not None:
            results.update(self._run_eval(self.test_loader, "test/target"))

        iou_2d = results.get("val/target/iou", 0.0)
        iou_3d = results.get("val/target/iou_3d", 0.0)
        iou_avg = results.get("val/target/iou_avg", 0.0)
        meta = {
            "epoch": epoch,
            "global_step": self.global_step,
            "best": self.best,
            "results": results,
        }
        if iou_2d > self.best["best_target_iou"]:
            self.best["best_target_iou"] = iou_2d
            self.ckpt.save("best_2d", self.state, meta)
        if iou_3d > self.best["best_target_iou_3d"]:
            self.best["best_target_iou_3d"] = iou_3d
            self.ckpt.save("best_3d", self.state, meta)
        if iou_avg > self.best["best_target_iou_avg"]:
            self.best["best_target_iou_avg"] = iou_avg
        self.ckpt.save("last", self.state, meta)

        if self.logger is not None:
            self.logger.log_metrics({**results, **self.best}, self.global_step)
        return results

    def test(self) -> Dict[str, float]:
        assert self.test_loader is not None and self.state is not None
        return self._run_eval(self.test_loader, "test/target")

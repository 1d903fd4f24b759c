"""Pure jitted train/eval steps for the cross-modal UDA task.

Functional re-expression of the reference training logic
(``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/train.py``):

- `_generic_step` (train.py:186-292): source CE losses for both branches +
  cross-modal KL on source and target (xMUDA recipe), total = sum;
- `_generic_step_val` (train.py:297-339): eval losses + 2D/3D/softmax-avg
  ensemble IoU updates masked by label != -100;
- HybridOptim semantics (train.py:574-637): one AdamW+OneCycle per model,
  stepped together — here simply two optax transforms over two subtrees;
- DDP all-reduce (run.py:262-268) -> `lax.pmean` over the "data" mesh axis
  when the step runs under shard_map.

Everything (both forwards on both domains, losses, grads, the optimizer
update, metric updates) is ONE jitted function per step — no Python in the
hot loop.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.net2d import Net2DSeg
from ..models.sparse_unet import Net3DSeg
from .batch import (
    PointBatch,
    build_topology,
    flatten_points,
    prepare_device_batch,
)
from .losses import kl_consistency, weighted_cross_entropy
from .metrics import confusion_matrix_update
from .optim import make_optimizer


@struct.dataclass
class TrainState:
    step: jax.Array
    params2d: Any
    params3d: Any
    stats2d: Any
    stats3d: Any
    opt2d: Any
    opt3d: Any


@struct.dataclass
class EvalMetrics:
    """Confusion-matrix accumulators for 2D / 3D / ensemble predictions."""

    cm_2d: jax.Array
    cm_3d: jax.Array
    cm_avg: jax.Array

    @classmethod
    def create(cls, num_classes: int) -> "EvalMetrics":
        def z():  # distinct buffers — they get donated independently
            return jnp.zeros((num_classes, num_classes), jnp.int32)

        return cls(cm_2d=z(), cm_3d=z(), cm_avg=z())


class MM2D3DTask:
    """Static task config + pure step functions (hashable, jit-friendly)."""

    def __init__(
        self,
        num_classes: int,
        class_weights=None,
        loss_composer=None,  # train.losses.LossComposer; routes the config's
        # `losses:` list end-to-end (composition + weights honored)
        lambda_xm_src: float = 1.0,
        lambda_xm_trg: float = 0.1,
        full_scale: int = 4096,
        num_planes: int = 7,
        m: int = 16,
        block_reps: int = 1,
        residual_blocks: bool = False,
        in_channels_3d: int = 3,
        frozen_batch_norm: bool = False,
        compute_dtype=jnp.bfloat16,
        optimizer_2d: Optional[Dict] = None,
        optimizer_3d: Optional[Dict] = None,
        axis_name: Optional[str] = None,
        model2d=None,  # custom plugin instances (models.registry.load_model)
        model3d=None,
        slot_profile: str = "default",  # slot-cap plan: "default" (32-beam
        # nuScenes-style scans) or "dense" (64-beam KITTI-family scans —
        # see train.batch.default_slot_caps)
    ):
        self.num_classes = num_classes
        self.class_weights = (
            None if class_weights is None else jnp.asarray(class_weights, jnp.float32)
        )
        self.loss_composer = loss_composer
        self.lambda_xm_src = lambda_xm_src
        self.lambda_xm_trg = lambda_xm_trg
        self.full_scale = full_scale
        self.num_planes = num_planes
        self.slot_profile = slot_profile
        self.axis_name = axis_name

        self.model2d = model2d or Net2DSeg(
            num_classes=num_classes,
            frozen_batch_norm=frozen_batch_norm,
            compute_dtype=compute_dtype,
        )
        self.model3d = model3d or Net3DSeg(
            num_classes=num_classes,
            in_channels=in_channels_3d,
            m=m,
            block_reps=block_reps,
            residual_blocks=residual_blocks,
            full_scale=full_scale,
            num_planes=num_planes,
            compute_dtype=compute_dtype,
        )
        opt2d = optimizer_2d or {"name": "adamw", "lr": 1e-3}
        opt3d = optimizer_3d or {"name": "adamw", "lr": 1e-3}
        self.tx2d = make_optimizer(**opt2d)
        self.tx3d = make_optimizer(**opt3d)
        # LR monitors (LearningRateMonitor equivalent, reference run.py:260)
        from .optim import make_schedule

        self.lr_schedule_2d = make_schedule(opt2d.get("lr_scheduler"), opt2d.get("lr", 1e-3))
        self.lr_schedule_3d = make_schedule(opt3d.get("lr_scheduler"), opt3d.get("lr", 1e-3))

    def current_lrs(self, step: int) -> Dict[str, float]:
        def at(s):
            return float(s(step)) if callable(s) else float(s)

        return {"lr/net2d": at(self.lr_schedule_2d), "lr/net3d": at(self.lr_schedule_3d)}

    # -- state ---------------------------------------------------------------

    def init_state(self, rng: jax.Array, example: PointBatch) -> TrainState:
        # jitted as a whole: eager init would dispatch thousands of tiny ops
        # (catastrophic over a remote-TPU tunnel).
        def _init(rng, example):
            example = prepare_device_batch(example)
            grid, hier = build_topology(example, self.full_scale, self.num_planes,
                                        slot_profile=self.slot_profile)
            _, feats, _, _, _ = flatten_points(example)
            r2, r3 = jax.random.split(rng)
            v2 = self.model2d.init(
                r2, example.img, example.depth, example.img_indices,
                example.point_mask, False,
            )
            v3 = self.model3d.init(r3, feats, grid, hier, False)
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params2d=v2["params"],
                params3d=v3["params"],
                stats2d=v2.get("batch_stats", {}),
                stats3d=v3.get("batch_stats", {}),
                opt2d=self.tx2d.init(v2["params"]),
                opt3d=self.tx3d.init(v3["params"]),
            )

        return jax.jit(_init)(rng, example)

    # -- forwards ------------------------------------------------------------

    def _fwd2d(self, params, stats, batch: PointBatch, train: bool, rng=None):
        variables = {"params": params, "batch_stats": stats}
        kwargs = {}
        # Net2DSeg can skip materializing the 64-channel full-res feature
        # map (segm_last) — nothing in the train/eval path consumes it and
        # its conv is the most expensive in the 2D branch.  Plugins without
        # the flag just return it.
        import inspect

        if "with_features" in inspect.signature(
            type(self.model2d).__call__
        ).parameters:
            kwargs["with_features"] = False
        if train:
            kwargs.update(mutable=["batch_stats"], rngs={"dropout": rng})
            (preds, segm_last, aux), mut = self.model2d.apply(
                variables, batch.img, batch.depth, batch.img_indices,
                batch.point_mask, True, **kwargs,
            )
            return preds, segm_last, aux, mut["batch_stats"]
        preds, segm_last, aux = self.model2d.apply(
            variables, batch.img, batch.depth, batch.img_indices,
            batch.point_mask, False, **kwargs,
        )
        return preds, segm_last, aux, stats

    def _fwd3d(self, params, stats, batch: PointBatch, grid, hier, train: bool):
        variables = {"params": params, "batch_stats": stats}
        _, feats, _, _, _ = flatten_points(batch)
        if train:
            (preds, point_feats, aux), mut = self.model3d.apply(
                variables, feats, grid, hier, True, mutable=["batch_stats"]
            )
            return preds, point_feats, aux, mut["batch_stats"]
        preds, point_feats, aux = self.model3d.apply(variables, feats, grid, hier, False)
        return preds, point_feats, aux, stats

    # -- losses --------------------------------------------------------------

    def _seg_loss(self, logits, labels, mask):
        """Segmentation loss: the config's composed `losses:` list when a
        LossComposer is attached (reference lib/losses.py:81-153), else
        plain weighted CE."""
        if self.loss_composer is not None:
            return self.loss_composer("segmentation", logits, labels, mask)
        return weighted_cross_entropy(logits, labels, mask, self.class_weights)

    def _seg_loss_weight(self, labels, mask):
        """Denominator of the masked-mean segmentation loss over these
        points: sum of per-point CLASS weights over valid points (the
        plain count when unweighted — weighted_cross_entropy normalizes
        by sum(w), losses.py).  The sharded eval and the trainer
        recombine per-shard/batch losses as sum(loss*w)/sum(w); using the
        loss's own denominator keeps that recombination exact under
        class-weighted CE, where a class-skewed shard (e.g. the padded
        tail batch) weighted by raw point count would bias the reported
        val loss."""
        cw = (self.loss_composer.class_weights("segmentation")
              if self.loss_composer is not None else self.class_weights)
        valid = ((labels != -100) & mask).astype(jnp.float32)
        if cw is None:
            return jnp.sum(valid)
        w = jnp.asarray(cw, jnp.float32)[jnp.where(valid > 0, labels, 0)]
        return jnp.sum(w * valid)

    # -- train ---------------------------------------------------------------

    def _pmean(self, x):
        if self.axis_name is None:
            return x
        return jax.lax.pmean(x, self.axis_name)

    def train_step(
        self,
        state: TrainState,
        src: PointBatch,
        trg: PointBatch,
        rng: jax.Array,
        topo_src=None,
        topo_trg=None,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        # wire-format batches (uint8 img, device jitter, device feats
        # gather) are materialized first — no-op for float batches
        src = prepare_device_batch(src)
        trg = prepare_device_batch(trg)
        # topology may be precomputed on the host (data.host_topology) and
        # shipped with the batch — identical arrays, zero device build time.
        if topo_src is None:
            topo_src = build_topology(
                src, self.full_scale, self.num_planes,
                slot_profile=self.slot_profile,
            )
        if topo_trg is None:
            topo_trg = build_topology(
                trg, self.full_scale, self.num_planes,
                slot_profile=self.slot_profile,
            )
        rng_src, rng_trg = jax.random.split(jax.random.fold_in(rng, state.step))

        _, _, labels_src, mask_src, _ = flatten_points(src)
        _, _, _, mask_trg, _ = flatten_points(trg)

        def loss_fn(params2d, params3d):
            stats2d, stats3d = state.stats2d, state.stats3d
            # ---- source domain (train.py:192-224)
            p2s, _, a2s, stats2d = self._fwd2d(params2d, stats2d, src, True, rng_src)
            p3s, _, a3s, stats3d = self._fwd3d(
                params3d, stats3d, src, *topo_src, True
            )
            flat2s = p2s["seg_logit"].reshape(-1, self.num_classes)
            seg_loss_src_2d = self._seg_loss(flat2s, labels_src, mask_src)
            seg_loss_src_3d = self._seg_loss(
                p3s["seg_logit"], labels_src, mask_src
            )
            xm_src_2d = kl_consistency(
                a2s["seg_logit_avg"].reshape(-1, self.num_classes),
                p3s["seg_logit"],
                mask_src,
            )
            xm_src_3d = kl_consistency(a3s["seg_logit_point"], flat2s, mask_src)

            # ---- target domain (train.py:244-278)
            p2t, _, a2t, stats2d = self._fwd2d(params2d, stats2d, trg, True, rng_trg)
            p3t, _, a3t, stats3d = self._fwd3d(
                params3d, stats3d, trg, *topo_trg, True
            )
            flat2t = p2t["seg_logit"].reshape(-1, self.num_classes)
            xm_trg_2d = kl_consistency(
                a2t["seg_logit_avg"].reshape(-1, self.num_classes),
                p3t["seg_logit"],
                mask_trg,
            )
            xm_trg_3d = kl_consistency(a3t["seg_logit_point"], flat2t, mask_trg)

            loss_2d = (
                seg_loss_src_2d
                + self.lambda_xm_src * xm_src_2d
                + self.lambda_xm_trg * xm_trg_2d
            )
            loss_3d = (
                seg_loss_src_3d
                + self.lambda_xm_src * xm_src_3d
                + self.lambda_xm_trg * xm_trg_3d
            )
            total = loss_2d + loss_3d
            logs = {
                "train/loss_segmentation": seg_loss_src_2d,
                "train/loss_segmentation_3d": seg_loss_src_3d,
                "train/xm_loss_src_2d": xm_src_2d,
                "train/xm_loss_tgt_2d": xm_trg_2d,
                "train/xm_loss_src_3d": xm_src_3d,
                "train/xm_loss_tgt_3d": xm_trg_3d,
                "train/loss_total": total,
            }
            return total, (stats2d, stats3d, logs)

        grads, (stats2d, stats3d, logs) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params2d, state.params3d)
        # voxel-table overflow monitor: the capacity schedule trades speed
        # for headroom; a level at capacity silently drops voxels, so
        # surface it (0 = healthy; > 0 = raise capacities)
        logs["train/voxel_overflow_levels"] = sum(
            (lvl.num_voxels >= lvl.capacity).astype(jnp.float32)
            for topo in (topo_src, topo_trg)
            for lvl in topo[1].levels
        )
        # same monitor for the slot-compacted conv tables (hits dropped
        # because a level's slot cap bound; 0 = healthy, see build_slots)
        logs["train/nbr_slot_overflow"] = sum(
            lvl.slot_overflow.astype(jnp.float32)
            for topo in (topo_src, topo_trg)
            for lvl in topo[1].levels
            if lvl.slot_overflow is not None
        ) + sum(
            tr.cslot_overflow.astype(jnp.float32)
            for topo in (topo_src, topo_trg)
            for tr in topo[1].transitions
            if tr.cslot_overflow is not None
        ) + jnp.float32(0.0)
        # in-bounds points truncated by the n_points budget (data.base
        # pad_sample): dropped points silently vanish from the loss
        if src.n_dropped is not None:
            logs["train/points_dropped"] = (
                jnp.sum(src.n_dropped) + jnp.sum(trg.n_dropped)
            ).astype(jnp.float32)
        grads = self._pmean(grads)
        stats2d = self._pmean(stats2d)
        stats3d = self._pmean(stats3d)
        logs = self._pmean(logs)
        g2d, g3d = grads

        up2, opt2 = self.tx2d.update(g2d, state.opt2d, state.params2d)
        up3, opt3 = self.tx3d.update(g3d, state.opt3d, state.params3d)
        new_state = TrainState(
            step=state.step + 1,
            params2d=optax.apply_updates(state.params2d, up2),
            params3d=optax.apply_updates(state.params3d, up3),
            stats2d=stats2d,
            stats3d=stats3d,
            opt2d=opt2,
            opt3d=opt3,
        )
        return new_state, logs

    # -- eval ----------------------------------------------------------------

    def eval_step(
        self, state: TrainState, batch: PointBatch, metrics: EvalMetrics,
        topo=None,
    ) -> Tuple[EvalMetrics, Dict[str, jax.Array]]:
        """One eval batch: losses + 2D/3D/ensemble confusion-matrix updates
        (train.py:297-339)."""
        batch = prepare_device_batch(batch)
        if topo is None:
            topo = build_topology(batch, self.full_scale, self.num_planes,
                                  slot_profile=self.slot_profile)
        _, _, labels, mask, _ = flatten_points(batch)

        p2, _, _, _ = self._fwd2d(state.params2d, state.stats2d, batch, False)
        p3, _, _, _ = self._fwd3d(state.params3d, state.stats3d, batch, *topo, False)

        flat2 = p2["seg_logit"].reshape(-1, self.num_classes).astype(jnp.float32)
        flat3 = p3["seg_logit"].astype(jnp.float32)
        loss_2d = self._seg_loss(flat2, labels, mask)
        loss_3d = self._seg_loss(flat3, labels, mask)

        sm2 = jax.nn.softmax(flat2, axis=-1)
        sm3 = jax.nn.softmax(flat3, axis=-1)
        ens = (sm2 + sm3) / 2

        new_metrics = EvalMetrics(
            cm_2d=confusion_matrix_update(
                metrics.cm_2d, jnp.argmax(flat2, -1), labels, mask
            ),
            cm_3d=confusion_matrix_update(
                metrics.cm_3d, jnp.argmax(flat3, -1), labels, mask
            ),
            cm_avg=confusion_matrix_update(
                metrics.cm_avg, jnp.argmax(ens, -1), labels, mask
            ),
        )
        logs = {"loss_segmentation": loss_2d, "loss_segmentation_3d": loss_3d}
        # the masked-mean losses' own denominator (class-weight sum over
        # valid points): the sharded eval step and the trainer's
        # cross-batch average weight the losses by it, so batches/shards
        # that are partly (or, on a filler tail shard, entirely) padding
        # don't bias the reported val loss — an all-filler shard's masked
        # mean collapses to 0 and its weight to 0, so it simply drops out
        # of the weighted mean — and class-weighted CE recombines exactly
        logs["valid_weight"] = self._seg_loss_weight(labels, mask)
        # hits dropped by the slot-compacted conv tables: at inference this
        # would otherwise be completely silent (train_step logs it too)
        logs["nbr_slot_overflow"] = sum(
            lvl.slot_overflow.astype(jnp.float32)
            for lvl in topo[1].levels
            if lvl.slot_overflow is not None
        ) + sum(
            tr.cslot_overflow.astype(jnp.float32)
            for tr in topo[1].transitions
            if tr.cslot_overflow is not None
        ) + jnp.float32(0.0)
        return new_metrics, logs

    # -- qualitative visualization forward ------------------------------------

    def viz_forward(self, state: TrainState, batch: PointBatch):
        """Small-output forward for qualitative figures (train.py:226-241):
        dense 2D argmax, lifted 2D/3D point argmaxes, the 3D confidence gate."""
        batch = prepare_device_batch(batch)
        topo = build_topology(batch, self.full_scale, self.num_planes,
                                  slot_profile=self.slot_profile)
        p2, _, _, _ = self._fwd2d(state.params2d, state.stats2d, batch, False)
        p3, _, _, _ = self._fwd3d(state.params3d, state.stats3d, batch, *topo, False)
        b, n = batch.point_mask.shape
        return {
            "pred_2d_dense": jnp.argmax(p2["seg_logit_2d"], -1),  # (B, H, W)
            "pred_2d_points": jnp.argmax(
                p2["seg_logit"].reshape(b, n, -1), -1
            ),  # (B, N)
            "pred_3d_points": jnp.argmax(
                p3["seg_logit"].reshape(b, n, -1), -1
            ),
            "confidence": p3["confidence"].reshape(b, n),
        }

    @functools.cached_property
    def jit_viz_forward(self):
        return jax.jit(self.viz_forward)

    # -- jit helpers ---------------------------------------------------------
    #
    # Buffer donation is OFF by default: on the tunneled TPU backend the
    # donated-state train-step chain measured 371-2240 ms/step vs a flat
    # ~209 ms without donation (tools/exp_chain_step.py — donation forces
    # some pathological buffer round trip), and even on healthy backends
    # the saving is just one extra TrainState copy (~0.4 GB at flagship
    # scale, far under the batch-8 HBM headroom).  MM2D3D_DONATE=1 turns
    # it back on for memory-constrained configurations.

    @staticmethod
    def _donate(argnums):
        import os

        return argnums if os.environ.get("MM2D3D_DONATE") == "1" else ()

    @functools.cached_property
    def jit_train_step(self):
        return jax.jit(self.train_step, donate_argnums=self._donate((0,)))

    @functools.cached_property
    def jit_train_step_pre(self):
        """Train step with host-precomputed topologies."""
        return jax.jit(
            lambda state, src, trg, rng, ts, tt: self.train_step(
                state, src, trg, rng, ts, tt
            ),
            donate_argnums=self._donate((0,)),
        )

    @functools.cached_property
    def jit_eval_step(self):
        return jax.jit(self.eval_step, donate_argnums=self._donate((2,)))

    @functools.cached_property
    def jit_eval_step_pre(self):
        return jax.jit(
            lambda state, batch, metrics, topo: self.eval_step(
                state, batch, metrics, topo
            ),
            donate_argnums=self._donate((2,)),
        )

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

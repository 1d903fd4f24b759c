"""Device-resident segmentation metrics: confusion matrix -> per-class IoU.

Equivalent of the reference's torchmetrics ``JaccardIndex(average="none")``
usage (``train.py:65-135, 319-330, 374-458``): predictions and labels are
masked by ``label != -100`` before the update; per-class IoU is computed from
the accumulated confusion matrix; classes absent from both pred and gt score
0 (torchmetrics ``absent_score`` default); the scalar metric is the
unweighted mean over classes.

The confusion matrix is accumulated *inside* the jitted eval step (a single
scatter-add), so evaluation never leaves the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .losses import IGNORE_INDEX


def confusion_matrix_update(
    cm: jax.Array,  # (C, C) int32/float32 accumulator [gt, pred]
    preds: jax.Array,  # (M,) int32 predicted class
    labels: jax.Array,  # (M,) int32
    valid: jax.Array,  # (M,) bool padding mask
) -> jax.Array:
    c = cm.shape[0]
    mask = (labels != IGNORE_INDEX) & valid
    gt = jnp.where(mask, labels, 0)
    pr = jnp.where(mask, preds, 0)
    updates = mask.astype(cm.dtype)
    return cm.at[gt, pr].add(updates)


def iou_per_class(cm: jax.Array, absent_score: float = 0.0) -> jax.Array:
    cm = cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    gt_total = cm.sum(axis=1)
    pred_total = cm.sum(axis=0)
    union = gt_total + pred_total - tp
    absent = union == 0
    iou = tp / jnp.where(absent, 1.0, union)
    return jnp.where(absent, absent_score, iou)


def mean_iou(cm: jax.Array) -> jax.Array:
    return iou_per_class(cm).mean()

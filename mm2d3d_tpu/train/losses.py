"""Training losses: weighted CE with ignore-index, cross-modal KL.

Semantics match the reference exactly (masked-mean forms of):

- ``lib/losses.py:55-68``: ``F.cross_entropy(pred, gt, weight=w)`` with
  torch's default ``ignore_index=-100`` — weighted mean where each valid
  sample contributes weight ``w[label]``.
- ``train.py:157-184``: ``F.kl_div(log_softmax(student), softmax(teacher
  .detach()), reduction="none").sum(1).mean()`` — KL per point summed over
  classes, mean over points.

Our point arrays are padded; every loss takes an explicit validity mask and
reduces only over valid points (the reference's ragged arrays contain only
valid points, so this is the same number).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def weighted_cross_entropy(
    logits: jax.Array,  # (M, C) fp32
    labels: jax.Array,  # (M,) int32, IGNORE_INDEX to ignore
    valid: Optional[jax.Array] = None,  # (M,) bool extra mask (padding)
    class_weights: Optional[jax.Array] = None,  # (C,)
) -> jax.Array:
    mask = labels != IGNORE_INDEX
    if valid is not None:
        mask = mask & valid
    safe_labels = jnp.where(mask, labels, 0)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]

    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)[safe_labels]
    else:
        w = jnp.ones_like(nll)
    w = w * mask.astype(jnp.float32)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def kl_consistency(
    student_logits: jax.Array,  # (M, C)
    teacher_logits: jax.Array,  # (M, C) — gradient is stopped here
    valid: jax.Array,  # (M,) bool
) -> jax.Array:
    """KL(softmax(teacher) || softmax(student)), mean over valid points."""
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32))
    s = student_logits.astype(jnp.float32)
    log_p = jax.nn.log_softmax(t, axis=-1)
    p = jnp.exp(log_p)
    log_q = jax.nn.log_softmax(s, axis=-1)
    per_point = jnp.sum(p * (log_p - log_q), axis=-1)
    m = valid.astype(jnp.float32)
    return jnp.sum(per_point * m) / jnp.maximum(jnp.sum(m), 1e-12)


class LossComposer:
    """Config-driven loss registry + composer (reference lib/losses.py:81-153).

    cfg is a name, a list of names, or a list of
    {name, weight, target, args} dicts; calling with a target sums
    weight * loss over entries whose target matches.
    Registry: cross_entropy (segmentation), l1/l2 (depth).
    """

    _REGISTRY = {
        "cross_entropy": ("segmentation",),
        "l1": ("depth",),
        "l2": ("depth",),
    }

    def __init__(self, cfg):
        if isinstance(cfg, str):
            cfg = [cfg]
        self._entries = []
        for item in cfg:
            if isinstance(item, str):
                item = {"name": item}
            name = item["name"]
            if name not in self._REGISTRY:
                raise ValueError(f"unknown loss {name!r}")
            self._entries.append(
                {
                    "name": name,
                    "weight": item.get("weight", 1.0),
                    "target": item.get("target", self._REGISTRY[name][0]),
                    "args": dict(item.get("args", {})),
                }
            )

    def update_loss_params(self, name: str, target: str, **kwargs):
        for e in self._entries:
            if e["name"] == name and e["target"] == target:
                e["args"].update(kwargs)

    def targets(self):
        """The set of loss targets this composer serves."""
        return {e["target"] for e in self._entries}

    def class_weights(self, target: str = "segmentation"):
        for e in self._entries:
            if e["target"] == target and "weight" in e["args"]:
                return e["args"]["weight"]
        return None

    def __call__(self, target: str, pred, gt, valid=None):
        entries = [e for e in self._entries if e["target"] == target]
        if not entries:
            raise RuntimeError(f"no losses for target {target!r}")
        out = 0.0
        for e in entries:
            if e["name"] == "cross_entropy":
                w = e["args"].get("weight")
                loss = weighted_cross_entropy(
                    pred, gt, valid,
                    None if w is None else jnp.asarray(w, jnp.float32),
                )
            elif e["name"] == "l1":
                loss = l1_masked(pred, gt)
            else:
                loss = l2_masked(pred, gt)
            out = out + e["weight"] * loss
        return out

    def __repr__(self):
        return "+".join(
            f"{e['weight'] if e['weight'] != 1.0 else ''}{e['name']}"
            for e in self._entries
        )


def l1_masked(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Reference L1 depth loss (lib/losses.py:37-43): mean |pred-gt| over gt>0."""
    mask = (gt > 0).astype(jnp.float32)
    return jnp.sum(jnp.abs(pred - gt) * mask) / jnp.maximum(jnp.sum(mask), 1e-12)


def l2_masked(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Reference L2 depth loss (lib/losses.py:46-52)."""
    mask = (gt > 0).astype(jnp.float32)
    return jnp.sum(jnp.square(pred - gt) * mask) / jnp.maximum(jnp.sum(mask), 1e-12)

"""Optimizer + LR-schedule factory (optax).

Mirrors the reference registry (``lib/optimizers.py:11-42``): optimizers
{adam, adamw, sgd, rmsprop} x schedulers {step, cosine_annealing, cyclic,
multi_step_lr, one_cycle, constant}.  Shipped configs use AdamW(lr=1e-3,
torch-default weight_decay=0.01) + OneCycle(max_lr=5e-3) stepped per
iteration (``config/config.yaml:9-17`` + ``train.py:138-152``).

The reference's HybridOptim (one optimizer per model stepped together,
``train.py:574-637``) maps to simply building one optax transform per model
and applying them to their own param subtrees — no shim needed in a
functional framework.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import optax


def make_schedule(cfg: Optional[Dict[str, Any]], base_lr: float):
    """Build an optax schedule from a reference-style lr_scheduler config."""
    if cfg is None:
        return base_lr
    name = cfg["name"]
    if name == "one_cycle":
        # torch-exact OneCycleLR (cos anneal): warmup spans
        # pct_start*total - 1 steps (optax's variant is shifted by one step
        # and diverges a few % mid-warmup).  Defaults: pct_start .3,
        # div_factor 25, final_div_factor 1e4.
        import jax.numpy as jnp

        total = cfg["total_steps"]
        max_lr = cfg["max_lr"]
        initial = max_lr / cfg.get("div_factor", 25.0)
        min_lr = initial / cfg.get("final_div_factor", 1e4)
        su = max(float(cfg.get("pct_start", 0.3)) * total - 1, 1.0)
        sd = max(total - su - 1, 1.0)

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            up = initial + (max_lr - initial) * 0.5 * (
                1 - jnp.cos(jnp.pi * jnp.minimum(step, su) / su)
            )
            t = jnp.clip((step - su) / sd, 0.0, 1.0)
            down = min_lr + (max_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * t))
            return jnp.where(step <= su, up, down)

        return schedule
    if name == "step":
        # torch StepLR(step_size, gamma): lr * gamma^(step // step_size)
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=cfg["step_size"],
            decay_rate=cfg.get("gamma", 0.1),
            staircase=True,
        )
    if name == "multi_step_lr":
        gamma = cfg.get("gamma", 0.1)
        return optax.piecewise_constant_schedule(
            init_value=base_lr,
            boundaries_and_scales={int(m): gamma for m in cfg["milestones"]},
        )
    if name == "cosine_annealing":
        return optax.cosine_decay_schedule(
            init_value=base_lr,
            decay_steps=cfg["T_max"],
            alpha=cfg.get("eta_min", 0.0) / max(base_lr, 1e-12),
        )
    if name == "cyclic":
        # torch CyclicLR triangular mode
        base = cfg.get("base_lr", base_lr)
        peak = cfg["max_lr"]
        up = cfg.get("step_size_up", 2000)
        return optax.join_schedules(
            [optax.linear_schedule(base, peak, up), optax.linear_schedule(peak, base, up)],
            boundaries=[up],
        )
    if name == "constant":
        return base_lr
    raise ValueError(f"unknown scheduler {name!r}")


def make_optimizer(
    name: str = "adamw",
    lr: float = 1e-3,
    lr_scheduler: Optional[Dict[str, Any]] = None,
    weight_decay: Optional[float] = None,
    accumulate_steps: int = 1,
    **kwargs,
) -> optax.GradientTransformation:
    tx = _make_base(name, lr, lr_scheduler, weight_decay, **kwargs)
    if accumulate_steps > 1:  # gradient accumulation (SURVEY.md §2.6)
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def _make_base(
    name, lr, lr_scheduler, weight_decay, **kwargs
) -> optax.GradientTransformation:
    schedule = make_schedule(lr_scheduler, lr)
    if name == "adamw":
        return optax.adamw(
            learning_rate=schedule,
            b1=kwargs.get("b1", 0.9),
            b2=kwargs.get("b2", 0.999),
            eps=kwargs.get("eps", 1e-8),
            weight_decay=0.01 if weight_decay is None else weight_decay,  # torch default
        )
    if name == "adam":
        return optax.adam(
            learning_rate=schedule,
            b1=kwargs.get("b1", 0.9),
            b2=kwargs.get("b2", 0.999),
            eps=kwargs.get("eps", 1e-8),
        )
    if name == "sgd":
        return optax.sgd(
            learning_rate=schedule,
            momentum=kwargs.get("momentum", 0.0),
            nesterov=kwargs.get("nesterov", False),
        )
    if name == "rmsprop":
        return optax.rmsprop(
            learning_rate=schedule,
            decay=kwargs.get("alpha", 0.99),
            eps=kwargs.get("eps", 1e-8),
            momentum=kwargs.get("momentum", 0.0),
        )
    raise ValueError(f"unknown optimizer {name!r}")

"""Loss semantics vs torch reference (CE ignore/weights, KL reduction),
loss composer, optimizer schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm2d3d_tpu.train.losses import (
    LossComposer,
    kl_consistency,
    weighted_cross_entropy,
)
from mm2d3d_tpu.train.optim import make_schedule

torch = pytest.importorskip("torch")


def test_weighted_ce_matches_torch(rng):
    m, c = 64, 6
    logits = rng.randn(m, c).astype(np.float32)
    labels = rng.randint(0, c, m).astype(np.int64)
    labels[rng.rand(m) < 0.2] = -100
    weights = rng.rand(c).astype(np.float32) + 0.5

    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels),
        weight=torch.from_numpy(weights),
    ).item()
    got = float(
        weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels),
            class_weights=jnp.asarray(weights),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    # unweighted + extra validity mask
    valid = rng.rand(m) < 0.8
    masked_labels = np.where(valid, labels, -100)
    ref2 = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(masked_labels)
    ).item()
    got2 = float(
        weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               valid=jnp.asarray(valid))
    )
    np.testing.assert_allclose(got2, ref2, rtol=1e-5)


def test_valid_weight_recombines_class_weighted_ce_exactly(rng):
    """Sharded/batched eval recombines per-shard masked-mean losses as
    sum(loss*valid_weight)/sum(valid_weight).  With CLASS-weighted CE the
    masked mean is normalized by the class-weight sum, so valid_weight
    must be that sum (task._seg_loss_weight), not the raw point count —
    this asserts the recombination equals the single-shot global loss on
    class-skewed shards, where count weighting is measurably wrong."""
    from mm2d3d_tpu.train.step import MM2D3DTask

    c = 4
    weights = np.array([1.0, 2.8, 0.7, 1.5], np.float32)
    task = MM2D3DTask(num_classes=c, full_scale=64, num_planes=2, m=4,
                      class_weights=weights)

    # two shards with very different class mixes + some padding/ignore
    def shard(classes, m):
        logits = rng.randn(m, c).astype(np.float32)
        labels = rng.choice(classes, m).astype(np.int64)
        mask = rng.rand(m) < 0.9
        labels[rng.rand(m) < 0.1] = -100
        return logits, labels, mask

    shards = [shard([0, 3], 48), shard([1, 2], 80)]
    losses = [
        float(task._seg_loss(jnp.asarray(lg), jnp.asarray(lb), jnp.asarray(mk)))
        for lg, lb, mk in shards
    ]
    vw = [
        float(task._seg_loss_weight(jnp.asarray(lb), jnp.asarray(mk)))
        for _, lb, mk in shards
    ]
    recombined = sum(l * w for l, w in zip(losses, vw)) / sum(vw)

    glob = float(task._seg_loss(
        jnp.concatenate([jnp.asarray(s[0]) for s in shards]),
        jnp.concatenate([jnp.asarray(s[1]) for s in shards]),
        jnp.concatenate([jnp.asarray(s[2]) for s in shards]),
    ))
    np.testing.assert_allclose(recombined, glob, rtol=1e-6)

    # count weighting is NOT exact here (guards against regressing
    # valid_weight back to a raw point count)
    counts = [float(((s[1] != -100) & s[2]).sum()) for s in shards]
    by_count = sum(l * n for l, n in zip(losses, counts)) / sum(counts)
    assert abs(by_count - glob) > 1e-3


def test_kl_matches_torch(rng):
    m, c = 48, 6
    student = rng.randn(m, c).astype(np.float32)
    teacher = rng.randn(m, c).astype(np.float32)

    ref = (
        torch.nn.functional.kl_div(
            torch.log_softmax(torch.from_numpy(student), dim=1),
            torch.softmax(torch.from_numpy(teacher), dim=1),
            reduction="none",
        )
        .sum(1)
        .mean()
        .item()
    )
    got = float(
        kl_consistency(jnp.asarray(student), jnp.asarray(teacher),
                       jnp.ones(m, bool))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    # masked mean over valid subset only
    valid = np.zeros(m, bool)
    valid[: m // 2] = True
    ref_half = (
        torch.nn.functional.kl_div(
            torch.log_softmax(torch.from_numpy(student[: m // 2]), dim=1),
            torch.softmax(torch.from_numpy(teacher[: m // 2]), dim=1),
            reduction="none",
        ).sum(1).mean().item()
    )
    got_half = float(
        kl_consistency(jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(valid))
    )
    np.testing.assert_allclose(got_half, ref_half, rtol=1e-5)


def test_loss_composer(rng):
    cfg = [
        {"name": "cross_entropy", "weight": 2.0, "target": "segmentation",
         "args": {"weight": [1.0] * 6}},
        {"name": "l1", "weight": 0.5, "target": "depth"},
    ]
    composer = LossComposer(cfg)
    assert composer.class_weights("segmentation") == [1.0] * 6

    logits = jnp.asarray(rng.randn(10, 6).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 6, 10))
    seg = float(composer("segmentation", logits, labels))
    base = float(weighted_cross_entropy(logits, labels,
                                        class_weights=jnp.ones(6)))
    np.testing.assert_allclose(seg, 2.0 * base, rtol=1e-6)

    pred = jnp.asarray(rng.rand(10).astype(np.float32))
    gt = jnp.asarray(rng.rand(10).astype(np.float32))
    d = float(composer("depth", pred, gt))
    np.testing.assert_allclose(d, 0.5 * float(jnp.mean(jnp.abs(pred - gt))), rtol=1e-6)

    with pytest.raises(RuntimeError):
        composer("unknown_target", logits, labels)


def test_one_cycle_matches_torch():
    total, max_lr = 100, 5e-3
    sched = make_schedule({"name": "one_cycle", "max_lr": max_lr,
                           "total_steps": total}, base_lr=1e-3)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1e-3)
    tsched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=max_lr,
                                                 total_steps=total)
    for step in range(total - 1):
        torch_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(sched(step)), torch_lr, rtol=2e-3)
        opt.step()
        tsched.step()

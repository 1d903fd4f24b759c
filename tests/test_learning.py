"""End-to-end learning evidence: the REAL Trainer on a separable task.

The round-2 review flagged that learning evidence rested on one loose
overfit bound.  This drives `Trainer.fit` (jitted train step, custom VJPs,
BN stats, both optimizers, checkpoint selection) for a few hundred steps on
a synthetic task whose labels are geometry/color-separable
(`data.synthetic.make_batch(separable=True)`) and asserts the thing that
actually matters: all three evaluation heads (2D, 3D, ensemble — the
reference's eval protocol, ``train.py:315-330``) reach high mIoU on HELD-OUT
batches.  Subtly wrong gradients anywhere in the stack cap the reachable
mIoU and fail this, where a loss-ratio bound would still pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm2d3d_tpu.data.synthetic import make_batch
from mm2d3d_tpu.train.step import MM2D3DTask
from mm2d3d_tpu.train.trainer import Trainer

pytestmark = [pytest.mark.slow, pytest.mark.xslow]  # two real 90-120-step
# training runs through Trainer.fit on CPU — the e2e LEARNING evidence;
# minutes per test, so the nightly/CI tier (see pytest.ini)

FULL_SCALE = 512
KW = dict(height=32, width=64, n_points=768, num_classes=6,
          full_scale=FULL_SCALE, separable=True)


class SepLoader:
    def __init__(self, seeds, batch_size=4):
        self.seeds = seeds
        self.batch_size = batch_size

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return len(self.seeds)

    def __iter__(self):
        for s in self.seeds:
            yield make_batch(
                np.random.RandomState(s), batch_size=self.batch_size, **KW
            )


def test_trainer_learns_separable_task(tmp_path):
    task = MM2D3DTask(
        num_classes=6, full_scale=FULL_SCALE, num_planes=3, m=8,
        compute_dtype=jnp.float32, slot_profile="dense",
        optimizer_2d={"name": "adamw", "lr": 1e-3},
        optimizer_3d={"name": "adamw", "lr": 5e-3},
    )
    n_train, epochs = 6, 20  # 120 steps (the 0.85 bar is passed well
    # before 150; trimmed per the round-3 review so the slow tier stays
    # runnable — measured 0.95/0.96/0.96 at 120 steps)
    trainer = Trainer(
        task,
        source_loader=SepLoader(range(0, n_train)),
        target_loader=SepLoader(range(100, 100 + n_train)),
        val_loader=SepLoader([500, 501]),  # held out
        ckpt_dir=str(tmp_path / "ckpts"),
        max_epochs=epochs,
        check_val_every_n_epoch=8,  # 2 mid-run validations + the final one
    )
    trainer.fit()

    results = trainer.validate(epochs - 1)
    # Measured on a correct build: iou 0.93, iou_3d 0.96, iou_avg 0.96
    # after 150 steps.  0.85 leaves backend/seed margin while still failing
    # any systematically wrong gradient path.
    assert results["val/target/iou"] >= 0.85, results
    assert results["val/target/iou_3d"] >= 0.85, results
    assert results["val/target/iou_avg"] >= 0.85, results

    # model selection engaged on the improving metric
    assert trainer.ckpt.exists("best_2d") and trainer.ckpt.exists("best_3d")
    assert trainer.best["best_target_iou"] >= 0.85

    # resume roundtrip restores the selected state
    task2 = MM2D3DTask(
        num_classes=6, full_scale=FULL_SCALE, num_planes=3, m=8,
        compute_dtype=jnp.float32, slot_profile="dense",
    )
    trainer2 = Trainer(
        task2,
        source_loader=SepLoader(range(0, n_train)),
        target_loader=SepLoader(range(100, 100 + n_train)),
        val_loader=SepLoader([500, 501]),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_epochs=epochs,
    )
    first = next(iter(SepLoader([0])))
    trainer2.init_or_resume(
        jax.tree_util.tree_map(jnp.asarray, first), resume=True
    )
    assert trainer2.best["best_target_iou"] == trainer.best["best_target_iou"]
    a = jax.tree_util.tree_leaves(trainer.state.params2d)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params2d)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Flagship conv path: the tiered/split slot machinery under end-to-end
# learning (the round-3 review's gap: unit VJP tests covered the tiers, but
# no e2e learning signal flowed through them — a tier-dropping bug the unit
# geometries miss would pass everything).
# ---------------------------------------------------------------------------

FS7 = 512
KW7 = dict(height=32, width=64, n_points=2048, num_classes=6,
           full_scale=FS7, separable=True, variant="kitti")


class SepLoader7(SepLoader):
    def __iter__(self):
        for s in self.seeds:
            yield make_batch(
                np.random.RandomState(s), batch_size=self.batch_size, **KW7
            )


def test_trainer_learns_through_tiered_slots(tmp_path):
    """End-to-end learning with the PRODUCTION slot machinery: 5 levels of
    3-tier (mid + heavy compacted) tables on the dense 64-beam geometry.
    First asserts the mid/heavy tiers are actually populated (a config
    where they are empty would prove nothing), then that held-out mIoU is
    reached — gradients flowing wrongly through any tier cap it."""
    from mm2d3d_tpu.train.batch import build_topology

    task = MM2D3DTask(
        num_classes=6, full_scale=FS7, num_planes=5, m=8,
        compute_dtype=jnp.float32, slot_profile="dense",
        optimizer_2d={"name": "adamw", "lr": 1e-3},
        optimizer_3d={"name": "adamw", "lr": 5e-3},
    )

    batch = jax.tree_util.tree_map(
        jnp.asarray, next(iter(SepLoader7([0], batch_size=4)))
    )
    _, hier = jax.jit(
        lambda b: build_topology(b, FS7, 5, slot_profile="dense")
    )(batch)
    mid = heavy = 0
    for lev in hier.levels:
        v_pad = lev.slot_src.shape[1]
        if lev.slot_idxm is not None:
            mid += int((np.asarray(lev.slot_idxm) < v_pad).sum())
        if lev.slot_idx is not None:
            heavy += int((np.asarray(lev.slot_idx) < v_pad).sum())
    # the dense 64-beam geometry populates thousands of mid-tier and
    # hundreds of heavy-tier voxels — the tiers are genuinely exercised
    assert mid > 1000, mid
    assert heavy > 100, heavy

    n_train, epochs = 6, 15  # 90 steps
    trainer = Trainer(
        task,
        source_loader=SepLoader7(range(0, n_train)),
        target_loader=SepLoader7(range(100, 100 + n_train)),
        val_loader=SepLoader7([500, 501]),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_epochs=epochs,
        check_val_every_n_epoch=epochs,  # final validation only
    )
    trainer.fit()
    results = trainer.validate(epochs - 1)
    assert results["val/target/iou"] >= 0.85, results
    assert results["val/target/iou_3d"] >= 0.85, results
    assert results["val/target/iou_avg"] >= 0.85, results

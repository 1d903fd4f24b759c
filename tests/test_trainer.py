"""Trainer fit/validate/checkpoint/resume smoke test on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm2d3d_tpu.data.synthetic import make_batch
from mm2d3d_tpu.train.step import MM2D3DTask
from mm2d3d_tpu.train.trainer import Trainer
from mm2d3d_tpu.utils.logging import create_logger

FULL_SCALE = 256
TINY = dict(height=32, width=48, n_points=128, num_classes=6, full_scale=FULL_SCALE)


pytestmark = pytest.mark.slow  # trainer fit/resume graphs: compile-dominated


class SyntheticLoader:
    """Duck-typed Loader over synthetic batches."""

    def __init__(self, n_batches, seed):
        self.n_batches = n_batches
        self.seed = seed

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        for i in range(self.n_batches):
            yield make_batch(np.random.RandomState(self.seed + i), batch_size=2, **TINY)


def _task():
    return MM2D3DTask(
        num_classes=6, full_scale=FULL_SCALE, num_planes=3, m=8,
        compute_dtype=jnp.float32,
        optimizer_2d={"name": "adamw", "lr": 1e-3},
        optimizer_3d={"name": "adamw", "lr": 1e-3},
    )


def test_trainer_multi_device_mesh(tmp_path):
    """Full trainer loop over the 8-device CPU mesh (DDP equivalent)."""
    from mm2d3d_tpu.parallel.mesh import make_mesh

    class Loader8(SyntheticLoader):
        def __iter__(self):
            for i in range(self.n_batches):
                yield make_batch(
                    np.random.RandomState(self.seed + i), batch_size=8, **TINY
                )

    task = MM2D3DTask(
        num_classes=6, full_scale=FULL_SCALE, num_planes=3, m=8,
        compute_dtype=jnp.float32, axis_name="data",
    )
    trainer = Trainer(
        task,
        source_loader=Loader8(1, 0),
        target_loader=Loader8(1, 50),
        val_loader=Loader8(1, 100),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_epochs=1,
        mesh=make_mesh(),
        limit_train_batches=1,
        limit_val_batches=1,
    )
    state = trainer.fit()
    assert int(np.asarray(state.step)) == 1
    assert trainer.ckpt.exists("last")


def test_trainer_fit_validate_resume(tmp_path):
    task = _task()
    logger = create_logger({}, out_dir=str(tmp_path))
    trainer = Trainer(
        task,
        source_loader=SyntheticLoader(2, 0),
        target_loader=SyntheticLoader(2, 100),
        val_loader=SyntheticLoader(1, 200),
        test_loader=SyntheticLoader(1, 300),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_epochs=1,
        class_names=["a", "b", "c", "d", "e", "f"],
        logger=logger,
        limit_train_batches=2,
        limit_val_batches=1,
    )
    state = trainer.fit()
    assert int(state.step) == 2
    assert trainer.ckpt.exists("last")
    results = trainer.test()
    assert "test/target/iou" in results
    assert (tmp_path / "metrics.jsonl").exists()

    # resume: new trainer restores epoch/step/best
    task2 = _task()
    trainer2 = Trainer(
        task2,
        source_loader=SyntheticLoader(2, 0),
        target_loader=SyntheticLoader(2, 100),
        val_loader=SyntheticLoader(1, 200),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_epochs=1,
        limit_train_batches=1,
        limit_val_batches=1,
    )
    first = next(iter(SyntheticLoader(1, 0)))
    trainer2.init_or_resume(
        jax.tree_util.tree_map(jnp.asarray, first), resume=True
    )
    assert trainer2.start_epoch == 1
    assert trainer2.global_step == 2
    # restored params match saved ones
    a = jax.tree_util.tree_leaves(state.params2d)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params2d)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

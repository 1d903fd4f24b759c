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


def test_sharded_eval_tail_exact():
    """Dataset size % (batch x devices) != 0: the padded-tail sharded eval
    must yield confusion totals identical to a single-device run over the
    same scans (multi-host evaluation is EXACT, not a subset)."""
    from mm2d3d_tpu.data.loader import Loader
    from mm2d3d_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_eval_step,
        replicate,
        shard_batch,
    )
    from mm2d3d_tpu.train.step import EvalMetrics

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, index, rng=None):
            r = np.random.RandomState(1000 + index)
            n, h, w = 96, 16, 24
            idx = np.stack([r.randint(0, h, n), r.randint(0, w, n)], 1)
            depth = np.zeros((h, w, 1), np.float32)
            depth[idx[:, 0], idx[:, 1], 0] = r.rand(n) * 50
            return {
                "img": r.rand(h, w, 3).astype(np.float32),
                "depth": depth,
                "img_indices": idx.astype(np.int64),
                "coords": r.randint(0, 64, (n, 3)).astype(np.int64),
                "feats": r.rand(n, 3).astype(np.float32),
                "seg_label": r.randint(0, 4, n).astype(np.int64),
            }

    task = MM2D3DTask(
        num_classes=4, full_scale=64, num_planes=2, m=4,
        compute_dtype=jnp.float32, axis_name="data",
    )
    mesh = make_mesh()
    to_dev = lambda b: jax.tree_util.tree_map(  # noqa: E731
        lambda x: None if x is None else jnp.asarray(x), b
    )

    batches = list(Loader(DS(), batch_size=8, n_points=128, pad_last=True))
    assert len(batches) == 2 and all(b.batch_size == 8 for b in batches)
    state = task.init_state(jax.random.PRNGKey(0), to_dev(batches[0]))

    metrics = replicate(EvalMetrics.create(4), mesh)
    eval_sharded = make_sharded_eval_step(task, mesh)
    sharded_logs = []
    for b in batches:
        metrics, logs = eval_sharded(state, shard_batch(b, mesh), metrics)
        sharded_logs.append(logs)

    ref = EvalMetrics.create(4)
    ref_logs = []
    for b in Loader(DS(), batch_size=8, n_points=128):  # partial tail
        ref, logs = task.eval_step(state, to_dev(b), ref)
        ref_logs.append(logs)

    for name in ("cm_2d", "cm_3d", "cm_avg"):
        sharded_cm = np.asarray(getattr(metrics, name))
        ref_cm = np.asarray(getattr(ref, name))
        np.testing.assert_array_equal(sharded_cm, ref_cm, err_msg=name)
        # every real point is counted exactly once
        assert sharded_cm.sum() == 10 * 96

    # val LOSSES are tail-exact too: the tail batch shards 2 real + 6
    # pure-filler samples over the 8 devices; the count-weighted reduction
    # (valid_weight) must drop the all-filler shards instead of pmean'ing
    # their degenerate 0 losses into the reported loss
    def weighted(logs_list, key):
        num = sum(float(l[key]) * float(l["valid_weight"]) for l in logs_list)
        den = sum(float(l["valid_weight"]) for l in logs_list)
        return num / den

    for key in ("loss_segmentation", "loss_segmentation_3d"):
        np.testing.assert_allclose(
            weighted(sharded_logs, key), weighted(ref_logs, key),
            rtol=1e-5, err_msg=key,
        )


def test_overflow_warning_without_logger(tmp_path, monkeypatch, capsys):
    """A direct-API fit WITHOUT a logger must still surface the
    gradient-corrupting capacity monitors (round-4 verdict: the warning was
    coupled to `_flush_train_logs`' logger branch).  Deliberately tiny
    voxel capacities overflow every level; the loud warning must print."""
    from mm2d3d_tpu.train import batch as B

    monkeypatch.setattr(
        B, "default_capacities",
        lambda num_points, num_levels, batch_size=None, profile="default":
        (16,) * num_levels,
    )
    trainer = Trainer(
        _task(),
        source_loader=SyntheticLoader(1, 0),
        target_loader=SyntheticLoader(1, 50),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_epochs=1,
        limit_train_batches=1,
    )
    trainer.fit()
    out = capsys.readouterr().out
    assert "WARNING: train/voxel_overflow_levels" in out
    assert "gradients" in out.lower()


def test_overflow_history_catches_mid_epoch(tmp_path, capsys):
    """logger=None retains per-step overflow scalars and scans them at
    epoch end: an overflow on a MIDDLE batch (not the epoch's last, which
    the final flush covers) must still warn, with the offending step."""
    import jax.numpy as jnp

    trainer = Trainer(
        _task(),
        source_loader=SyntheticLoader(1, 0),
        target_loader=SyntheticLoader(1, 50),
        ckpt_dir=str(tmp_path / "ckpts"),
        max_epochs=1,
    )
    trainer._overflow_warned = set()
    hist = [
        (s, {"train/nbr_slot_overflow": jnp.asarray(v, jnp.float32)})
        for s, v in ((1, 0.0), (2, 7.0), (3, 0.0))  # middle step overflows
    ]
    trainer._check_overflow_history(hist)
    out = capsys.readouterr().out
    assert "WARNING: train/nbr_slot_overflow = 7 at step 2" in out
    # dedup: a second scan stays silent
    trainer._check_overflow_history(hist)
    assert "WARNING" not in capsys.readouterr().out


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


def test_strict_eval_points(tmp_path):
    """An eval loader whose scans exceed the point budget truncates
    in-bounds points: strict mode refuses to report the metric, and a
    larger (eval_n_points-style) budget clears it untruncated."""

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, index, rng=None):
            r = np.random.RandomState(3000 + index)
            n, h, w = 96, 16, 24
            idx = np.stack([r.randint(0, h, n), r.randint(0, w, n)], 1)
            depth = np.zeros((h, w, 1), np.float32)
            depth[idx[:, 0], idx[:, 1], 0] = r.rand(n) * 50
            return {
                "img": r.rand(h, w, 3).astype(np.float32),
                "depth": depth,
                "img_indices": idx.astype(np.int64),
                "coords": r.randint(0, 64, (n, 3)).astype(np.int64),
                "feats": r.rand(n, 3).astype(np.float32),
                "seg_label": r.randint(0, 4, n).astype(np.int64),
            }

    from mm2d3d_tpu.data.loader import Loader

    task = MM2D3DTask(
        num_classes=4, full_scale=64, num_planes=2, m=4,
        compute_dtype=jnp.float32,
    )
    trainer = Trainer(
        task, source_loader=None, target_loader=None,
        ckpt_dir=str(tmp_path / "ckpts"), strict_eval_points=True,
    )
    tight = Loader(DS(), batch_size=4, n_points=64)  # 96-pt scans truncate
    first = next(iter(tight))
    trainer.state = task.init_state(
        jax.random.PRNGKey(0), trainer._to_device(first)
    )
    with pytest.raises(RuntimeError, match="truncated"):
        trainer._run_eval(tight, "val/target")

    # the decoupled eval budget covers the scans: no truncation, no raise
    out = trainer._run_eval(Loader(DS(), batch_size=4, n_points=128),
                            "val/target")
    assert out["val/target/points_dropped"] == 0.0

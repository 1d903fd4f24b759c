"""Scenario config composition: each UDA scenario's composed config must
match the reference training scales (SURVEY.md §6 / BASELINE.md):

- USA->Singapore: batch 16, 49 epochs, OneCycle total_steps 49,047
- Day->Night: batch 16, 35 epochs, total_steps 54,130
  (experiments_day_night/.../config/run/train.yaml:5, config.yaml:17)
- vKITTI->SemKITTI: batch 16 / test batch 8, 15 epochs, total_steps 16,903,
  lambda_xm 0.1/0.01 (experiments_vkitti_skitti/.../config/run/{train,test}.yaml)
"""

import os.path as osp

import pytest

from mm2d3d_tpu.utils.config import load_config

CONFIGS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "configs")


def _load(name, overrides=()):
    return load_config(osp.join(CONFIGS, name), list(overrides))


def test_usa_singapore_composition():
    cfg = _load("config.yaml")
    assert cfg["run"]["batch_size"] == 16
    assert cfg["run"]["max_epochs"] == 49
    assert cfg["run"]["check_val_every_n_epoch"] == 2  # checkpoint_period 2
    for branch in ("net2d", "net3d"):
        sched = cfg["models"][branch]["optimizer"]["lr_scheduler"]
        assert sched["total_steps"] == 49047
        assert sched["max_lr"] == 0.005
    assert cfg["train"]["params"]["lambda_xm_src"] == 1.0
    assert cfg["train"]["params"]["lambda_xm_trg"] == 0.1
    assert cfg["dataset"]["name"] == "nuscenes"


def test_day_night_composition():
    cfg = _load("day_night.yaml")
    assert cfg["run"]["batch_size"] == 16
    assert cfg["run"]["max_epochs"] == 35
    assert cfg["run"]["check_val_every_n_epoch"] == 1  # checkpoint_period 1
    for branch in ("net2d", "net3d"):
        sched = cfg["models"][branch]["optimizer"]["lr_scheduler"]
        assert sched["total_steps"] == 54130
    assert cfg["dataset"]["source"]["TRAIN"] == ["train_day"]
    assert cfg["dataset"]["target"]["TRAIN"] == ["train_night"]
    assert cfg["train"]["params"]["lambda_xm_src"] == 1.0
    assert cfg["train"]["params"]["lambda_xm_trg"] == 0.1


def test_day_night_test_mode_override():
    # `run=test` must swap the whole run group (1 epoch, resume), not keep
    # the scenario's 35-epoch schedule
    cfg = _load("day_night.yaml", ["run=test"])
    assert cfg["run"]["max_epochs"] == 1
    assert cfg["run"]["mode"] == "test"
    assert cfg["run"]["resume"] is True


def test_vkitti_composition():
    cfg = _load("vkitti_skitti.yaml")
    assert cfg["run"]["batch_size"] == 16
    assert cfg["run"]["test_batch_size"] == 8  # reference run/test.yaml: 8
    assert cfg["run"]["max_epochs"] == 15
    assert cfg["run"]["check_val_every_n_epoch"] == 2  # checkpoint_period 2
    for branch in ("net2d", "net3d"):
        sched = cfg["models"][branch]["optimizer"]["lr_scheduler"]
        assert sched["total_steps"] == 16903
    assert cfg["train"]["params"]["lambda_xm_src"] == 0.1
    assert cfg["train"]["params"]["lambda_xm_trg"] == 0.01
    assert cfg["train"]["n_points"] == 10240
    assert cfg["dataset"]["name"] == "vkitti_semantic_kitti"
    assert cfg["dataset"]["specific"]["downsample"] == [10000]
    # 64-beam scans need the dense slot-cap plan (default drops hits)
    assert cfg["train"]["slot_profile"] == "dense"


def test_build_task_rejects_unsupported_loss_targets():
    from mm2d3d_tpu.run import build_task

    cfg = {
        "models": {
            "net2d": {"optimizer": {"name": "adamw", "lr": 1e-3}},
            "net3d": {
                "backbone_3d": {
                    "in_channels": 3, "m": 8, "block_reps": 1,
                    "residual_blocks": False, "full_scale": 256,
                    "num_planes": 3,
                },
                "optimizer": {"name": "adamw", "lr": 1e-3},
            },
        },
        "losses": [
            {"name": "cross_entropy", "target": "segmentation"},
            {"name": "l1", "target": "depth"},
        ],
        "train": {"params": {}},
    }
    with pytest.raises(ValueError, match="depth"):
        build_task(cfg, num_classes=6)


def _task_cfg(losses):
    return {
        "models": {
            "net2d": {"optimizer": {"name": "adamw", "lr": 1e-3}},
            "net3d": {
                "backbone_3d": {
                    "in_channels": 3, "m": 8, "block_reps": 1,
                    "residual_blocks": False, "full_scale": 256,
                    "num_planes": 3,
                },
                "optimizer": {"name": "adamw", "lr": 1e-3},
            },
        },
        "losses": losses,
        "train": {"params": {}},
    }


def test_build_task_rejects_class_weight_length_mismatch():
    # jnp gather clips out-of-range label indices SILENTLY — a 6-entry
    # weight list with num_classes=10 must be a config error, not wrong math
    losses = [{
        "name": "cross_entropy", "target": "segmentation",
        "args": {"weight": [1.9, 1.0, 2.1, 2.7, 1.5, 1.8]},
    }]
    with pytest.raises(ValueError, match="class weights"):
        build_task_with(losses, num_classes=10)


def test_build_task_rejects_unresolved_compute_weight():
    losses = [{
        "name": "cross_entropy", "target": "segmentation",
        "args": {"weight": "compute"},
    }]
    with pytest.raises(ValueError, match="unresolved"):
        build_task_with(losses, num_classes=10)


def build_task_with(losses, num_classes):
    from mm2d3d_tpu.run import build_task

    return build_task(_task_cfg(losses), num_classes=num_classes)


def test_a2d2_composition():
    # A2D2 -> SemanticKITTI scenario: 10 classes, data-resolved weights and
    # schedule, dense slot profile (reference datasets/a2d2_semantic_kitti.yaml;
    # no experiments_a2d2 dir exists, so weights/schedule are `compute`/`auto`)
    cfg = _load("a2d2.yaml")
    assert cfg["run"]["batch_size"] == 16
    assert cfg["run"]["test_batch_size"] == 8
    assert cfg["run"]["check_val_every_n_epoch"] == 2
    assert cfg["dataset"]["name"] == "a2d2_semantic_kitti"
    assert cfg["dataset"]["specific"]["merge_classes_style"] == "A2D2"
    assert len(cfg["train"]["params"]["class_names"]) == 10
    assert cfg["train"]["slot_profile"] == "dense"
    assert cfg["losses"][0]["args"]["weight"] == "compute"
    for branch in ("net2d", "net3d"):
        sched = cfg["models"][branch]["optimizer"]["lr_scheduler"]
        assert sched["total_steps"] == "auto"


def test_resolve_auto_params():
    # `weight: compute` and `total_steps: auto` resolve from the datamodule
    from mm2d3d_tpu.run import resolve_auto_params

    class _FakeLoader:
        def __init__(self, n, dataset=None):
            self._n = n
            self.dataset = dataset

        def __len__(self):
            return self._n

    class _FakeDM:
        pass

    class _FakeDataset:
        num_classes = 3

        def __init__(self):
            import numpy as np

            self.data = [
                {"seg_labels": np.array([0, 0, 0, 1, 2], np.int64)},
                {"seg_labels": np.array([0, 1, 1, 2, 2], np.int64)},
            ]

        def map_labels(self, labels):
            return labels

    dm = _FakeDM()
    dm.source_train = _FakeLoader(7, _FakeDataset())
    dm.target_train = _FakeLoader(5)
    cfg = _task_cfg([{
        "name": "cross_entropy", "target": "segmentation",
        "args": {"weight": "compute"},
    }])
    cfg["models"]["net2d"]["optimizer"]["lr_scheduler"] = {
        "name": "one_cycle", "max_lr": 5e-3, "total_steps": "auto",
    }
    cfg["run"] = {"max_epochs": 3}
    resolve_auto_params(cfg, dm)
    w = cfg["losses"][0]["args"]["weight"]
    assert len(w) == 3 and min(w) == 1.0  # normalized by the min
    assert w[1] > w[0] and w[2] > w[0]    # rarer classes weigh more
    sched = cfg["models"]["net2d"]["optimizer"]["lr_scheduler"]
    assert sched["total_steps"] == 3 * 7  # max_size_cycle: max(len(src), len(trg))

"""Model plugin protocol end to end (reference ModelWrapper, train.py:508-544):
a third-party module exporting ``Model``/``signature``/``dependencies`` is
loadable by module name, its config keys are filtered against the model's
declared fields, and the experiment driver resolves branch names through
the registry."""

import numpy as np

from mm2d3d_tpu.models.registry import available_models, get_entry, load_model

PLUGIN_SRC = """
from flax import linen as nn
from mm2d3d_tpu.models.net2d import Net2DSeg


class Model(Net2DSeg):
    pass


signature = None
dependencies = ["jax", "flax"]
"""


def test_builtin_registry_entries():
    assert {"net2d", "net3d"} <= set(available_models())
    entry = get_entry("net2d")
    assert entry["signature"] is not None
    assert "jax" in entry["dependencies"]


def test_load_model_filters_config_keys():
    # bogus keys are dropped, declared keys are applied (train.py:525-530)
    m = load_model("net3d", num_classes=4, m=8, not_a_field=123)
    assert m.num_classes == 4 and m.m == 8


def test_plugin_module_load(tmp_path, monkeypatch):
    (tmp_path / "my_plugin_2d.py").write_text(PLUGIN_SRC)
    monkeypatch.syspath_prepend(str(tmp_path))
    m = load_model("my_plugin_2d", num_classes=5, bogus=1)
    assert type(m).__name__ == "Model"
    assert m.num_classes == 5
    entry = get_entry("my_plugin_2d")
    assert entry["dependencies"] == ["jax", "flax"]


def test_build_task_resolves_plugin_names(tmp_path, monkeypatch):
    (tmp_path / "my_plugin_2d.py").write_text(PLUGIN_SRC)
    monkeypatch.syspath_prepend(str(tmp_path))
    from mm2d3d_tpu.run import build_task

    cfg = {
        "models": {
            "net2d": {
                "name": "my_plugin_2d",
                "optimizer": {"name": "adamw", "lr": 1e-3},
            },
            "net3d": {
                "backbone_3d": {
                    "in_channels": 3, "m": 8, "block_reps": 1,
                    "residual_blocks": False, "full_scale": 256,
                    "num_planes": 3,
                },
                "optimizer": {"name": "adamw", "lr": 1e-3},
            },
        },
        "losses": ["cross_entropy"],
        "train": {"params": {}, "compute_dtype": "float32"},
    }
    task = build_task(cfg, num_classes=6)
    assert type(task.model2d).__name__ == "Model"  # the plugin class
    assert task.model2d.num_classes == 6
    assert task.model3d.m == 8
    # plugin metadata is recorded for the run (reference logs signature +
    # dependencies per wrapped model)
    assert task.model_info["net2d"]["name"] == "my_plugin_2d"
    assert task.model_info["net2d"]["dependencies"] == ["jax", "flax"]
    assert task.model_info["net3d"]["name"] == "net3d"
    sig3 = task.model_info["net3d"]["signature"]
    assert sig3 is not None and "feats" in sig3[0]

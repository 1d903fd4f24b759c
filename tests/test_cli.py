"""End-to-end CLI test: config composition -> datamodule -> fast_dev_run."""

import os.path as osp
import pickle

import numpy as np
import pytest

from mm2d3d_tpu.run import main

pytestmark = pytest.mark.slow  # full CLI runs: compile-dominated

H, W = 90, 160


@pytest.fixture
def workspace(tmp_path, rng):
    from PIL import Image

    # fake nuScenes data
    pre = tmp_path / "data" / "preprocess"
    pre.mkdir(parents=True)

    def scan(n=250):
        pts_cam = np.stack(
            [(rng.rand(n) - 0.5) * 20, (rng.rand(n) - 0.5) * 4, rng.rand(n) * 40 + 2], 1
        ).astype(np.float32)
        return {
            "points": pts_cam[:, [2, 0, 1]].copy(),
            "seg_labels": rng.randint(0, 17, n).astype(np.uint8),
            "points_img": np.stack(
                [rng.randint(0, H, n), rng.randint(0, W, n)], 1
            ).astype(np.float64),
            "camera_path": "img.png",
            "lidar_path": "x",
            "sample_token": "t",
            "scene_name": "s",
            "calib": {"cam_intrinsic": np.eye(3) * 100},
            "pts_cam_coord": pts_cam,
        }

    for split in ("train_usa", "train_singapore", "val_singapore", "test_singapore"):
        with open(pre / f"{split}.pkl", "wb") as f:
            pickle.dump([scan() for _ in range(4)], f)
    Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
        tmp_path / "data" / "img.png"
    )

    # tiny config tree
    (tmp_path / "configs" / "datasets").mkdir(parents=True)
    (tmp_path / "configs" / "run").mkdir()
    root = tmp_path / "data"
    (tmp_path / "configs" / "config.yaml").write_text(f"""
defaults:
  - _self_
  - datasets: tiny
  - run: train
models:
  net2d:
    frozen_batch_norm: false
    optimizer: {{name: adamw, lr: 0.001}}
  net3d:
    backbone_3d: {{in_channels: 3, m: 8, block_reps: 1, residual_blocks: false,
                  full_scale: 256, num_planes: 3}}
    optimizer: {{name: adamw, lr: 0.001}}
losses:
  - name: cross_entropy
    weight: 1.0
    target: segmentation
train:
  seed: 42
  out_dir: {tmp_path}/runs/t
  n_points: 256
  compute_dtype: float32
  num_workers: 0
  params:
    class_names: [vehicle, driveable_surface, sidewalk, terrain, manmade, vegetation]
    class_palette: nuscenes
    val_log_images_step: 1
    train_log_images_step: null
    lambda_xm_src: 1.0
    lambda_xm_trg: 0.1
""")
    (tmp_path / "configs" / "datasets" / "tiny.yaml").write_text(f"""
dataset:
  name: nuscenes
  source:
    TRAIN: [train_usa]
    preprocess_dir: {pre}
    nuscenes_dir: {root}
  target:
    TRAIN: [train_singapore]
    VAL: [val_singapore]
    TEST: [test_singapore]
    preprocess_dir: {pre}
    nuscenes_dir: {root}
  specific:
    merge_classes: true
    scale: 20
    full_scale: 256
    resize: [40, 22]
    use_rgb: true
  augmentations:
    fliplr: 0.5
""")
    (tmp_path / "configs" / "run" / "train.yaml").write_text(
        "run:\n  mode: train\n  batch_size: 2\n  max_epochs: 1\n"
        "  check_val_every_n_epoch: 1\n  resume: false\n  fast_dev_run: true\n"
    )
    return tmp_path


def test_cli_fast_dev_run(workspace):
    main(["--config", str(workspace / "configs" / "config.yaml")])
    out = workspace / "runs" / "t"
    assert (out / "ckpts" / "last").exists()
    assert (out / "metrics.jsonl").exists()
    assert (out / "code_snapshot" / "mm2d3d_tpu").exists()
    # val-time qualitative figures (val_log_images_step, reference vkitti
    # train.py:341-356)
    figs = list((out / "figures").glob("val_target_*.png"))
    assert figs, "val_log_images_step produced no val figures"


def test_test_batch_size_plumbing(workspace):
    """run.test_batch_size reaches the val/test loaders while the train
    loaders keep run.batch_size (reference vkitti train-16/test-8 split)."""
    from mm2d3d_tpu.run import build_datamodule
    from mm2d3d_tpu.utils.config import load_config

    cfg = load_config(
        str(workspace / "configs" / "config.yaml"), ["run.test_batch_size=1"]
    )
    dm = build_datamodule(cfg)
    assert dm.source_train.batch_size == 2
    assert dm.target_val.batch_size == 1
    assert dm.target_test.batch_size == 1


def test_pseudo_label_generation_round_trip(workspace):
    """fast_dev_run -> generate pselab .npy from the ckpt -> retrain with
    pselab_paths consuming it (the self-training loop, SURVEY D10)."""
    cfg_path = str(workspace / "configs" / "config.yaml")
    main(["--config", cfg_path])

    from mm2d3d_tpu.tools.generate_pseudo_labels import generate
    from mm2d3d_tpu.utils.config import load_config

    out_npy = str(workspace / "runs" / "t" / "pselab" / "target_train.npy")
    cfg = load_config(cfg_path, [])
    if "train_overrides" in cfg:
        from mm2d3d_tpu.utils.config import _deep_merge

        cfg["train"] = _deep_merge(cfg["train"], cfg.pop("train_overrides"))
    records = generate(cfg, "last", out_npy)

    # schema: one record per target-train scan, full-scan-length arrays
    import pickle

    with open(workspace / "data" / "preprocess" / "train_singapore.pkl", "rb") as f:
        scans = pickle.load(f)
    assert len(records) == len(scans)
    for rec, scan in zip(records, scans):
        n = len(scan["points"])
        for key in ("probs_2d", "pseudo_label_2d", "probs_3d",
                    "pseudo_label_3d", "probs_ensemble", "pseudo_label_ensemble"):
            assert len(rec[key]) == n
        assert rec["probs_2d"].max() <= 1.0

    # retrain consuming the generated labels through pselab_paths
    import yaml

    tiny = workspace / "configs" / "datasets" / "tiny.yaml"
    d = yaml.safe_load(tiny.read_text())
    d["dataset"]["target"]["pselab_paths"] = out_npy
    tiny.write_text(yaml.safe_dump(d))
    main(["--config", cfg_path])

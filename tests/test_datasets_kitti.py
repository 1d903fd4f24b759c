"""Pipeline tests for the KITTI-family loaders (SemanticKITTI / VirtualKITTI
/ A2D2) on synthetic on-disk fixtures — crops, merges, on-the-fly projection,
weather variants (reference: lib/dataset/{semantic_kitti,virtual_kitti_dataloader,a2d2}.py).
"""

import os
import pickle

import numpy as np
import pytest

from mm2d3d_tpu.data.base import IGNORE, collate


def _save_img(path, h, w, rng):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(path)


def _check_sample(out, num_classes, full_scale):
    h, w = out["img"].shape[:2]
    n = len(out["coords"])
    assert out["depth"].shape == (h, w, 1)
    assert out["img_indices"].shape == (n, 2)
    assert (out["img_indices"][:, 0] >= 0).all() and (out["img_indices"][:, 0] < h).all()
    assert (out["img_indices"][:, 1] >= 0).all() and (out["img_indices"][:, 1] < w).all()
    assert (out["coords"] >= 0).all() and (out["coords"] < full_scale).all()
    lab = out["seg_label"]
    assert ((lab == IGNORE) | ((lab >= 0) & (lab < num_classes))).all()
    assert out["feats"].shape[0] == n


def test_semantic_kitti_pipeline(tmp_path, rng):
    from mm2d3d_tpu.data.semantic_kitti import SemanticKITTI

    h, w, npts = 120, 160, 1200
    raw_ids = np.array([10, 40, 48, 50, 70, 72, 30, 0], np.int64)  # incl unlabeled
    scans = []
    for _ in range(3):
        pts_cam = np.stack(
            [(rng.rand(npts) - 0.5) * 20, (rng.rand(npts) - 0.5) * 4,
             rng.rand(npts) * 40 + 2], 1).astype(np.float32)
        scans.append({
            "points": pts_cam[:, [2, 0, 1]].copy(),
            "pts_cam_coord": pts_cam,
            "seg_labels": raw_ids[rng.randint(0, len(raw_ids), npts)],
            "points_img": np.stack(
                [rng.randint(0, h, npts), rng.randint(0, w, npts)], 1
            ).astype(np.float64),
            "camera_path": "img.png",
            "intrinsics": np.eye(3) * 100,
        })
    with open(tmp_path / "train.pkl", "wb") as f:
        pickle.dump(scans, f)
    _save_img(str(tmp_path / "img.png"), h, w, rng)

    for style, ncls in (("A2D2", 10), ("VirtualKITTI", 6), ("nuScenes", 6)):
        ds = SemanticKITTI(
            split=("train",), preprocess_dir=str(tmp_path),
            semantic_kitti_dir=str(tmp_path), merge_classes_style=style,
            full_scale=512, crop_size=(80, 60), bottom_crop=True,
            fliplr=0.5, color_jitter=(0.4, 0.4, 0.4),
        )
        assert ds.num_classes == ncls
        out = ds.__getitem__(0, np.random.RandomState(0))
        assert out["img"].shape[:2] == (60, 80)  # (H, W) after bottom crop
        _check_sample(out, ncls, 512)
        # unlabeled (id 0) must map to ignore
        assert ds.label_mapping[0] == IGNORE

    # random-crop variant + collate
    ds = SemanticKITTI(
        split=("train",), preprocess_dir=str(tmp_path),
        semantic_kitti_dir=str(tmp_path), merge_classes_style="A2D2",
        full_scale=512, crop_size=(80, 60), rand_crop=(0.5, 1.0, 0.5, 1.0),
    )
    batch = collate([ds.__getitem__(i, np.random.RandomState(i)) for i in range(2)], 2048)
    assert batch.coords.shape == (2, 2048, 3)
    assert batch.point_mask.any()


def test_virtual_kitti_pipeline(tmp_path, rng):
    from mm2d3d_tpu.data.virtual_kitti import VirtualKITTI

    npts = 800
    z = rng.rand(npts).astype(np.float32) * 35 + 5
    xc = z * (rng.rand(npts).astype(np.float32) * 1.6 - 0.8)
    yc = z * (rng.rand(npts).astype(np.float32) * 0.48 - 0.24)
    pts_cam = np.stack([xc, yc, z], 1)
    # world coords from cam = (-y, -z, x): world = (z_c, -x_c, -y_c)
    points = np.stack([pts_cam[:, 2], -pts_cam[:, 0], -pts_cam[:, 1]], 1)
    labels = rng.randint(0, 13, npts).astype(np.int64)
    labels[:5] = 99  # "Don't care" sentinel used by the raw data
    scans = [{
        "points": points, "seg_labels": labels,
        "scene_id": "0001", "frame_id": "00042",
    }]
    with open(tmp_path / "train.pkl", "wb") as f:
        pickle.dump(scans, f)
    for weather in ("clone", "fog"):
        _save_img(
            str(tmp_path / "vkitti_1.3.1_rgb" / "0001" / weather / "00042.png"),
            375, 1242, rng,
        )

    ds = VirtualKITTI(
        split=("train",), preprocess_dir=str(tmp_path),
        virtual_kitti_dir=str(tmp_path), full_scale=1024,
        random_weather=("clone", "fog"), downsample=(400,),
    )
    assert ds.num_classes == 6
    out = ds.__getitem__(0, np.random.RandomState(3))
    assert len(out["coords"]) <= 400  # random downsample applied
    _check_sample(out, 6, 1024)
    # weather variants must actually vary with the rng
    imgs = {ds.__getitem__(0, np.random.RandomState(s))["img"].sum() for s in range(6)}
    assert len(imgs) > 1


def test_a2d2_pipeline(tmp_path, rng):
    from mm2d3d_tpu.data.a2d2 import A2D2

    h, w, npts = 604, 960, 700
    pre = tmp_path / "preprocess"
    pre.mkdir()
    pts_cam = np.stack(
        [(rng.rand(npts) - 0.5) * 20, (rng.rand(npts) - 0.5) * 4,
         rng.rand(npts) * 40 + 2], 1).astype(np.float32)
    scans = [{
        "points": pts_cam[:, [2, 0, 1]].copy(),
        "pts_cam_coord": pts_cam,
        "seg_labels": rng.randint(0, len(A2D2.class_names), npts).astype(np.int64),
        "points_img": np.stack(
            [rng.randint(0, h, npts), rng.randint(0, w, npts)], 1
        ).astype(np.float64),
        "camera_path": "img.png",
    }]
    with open(pre / "train.pkl", "wb") as f:
        pickle.dump(scans, f)
    _save_img(str(tmp_path / "img.png"), h, w, rng)

    ds = A2D2(
        split=("train",), preprocess_dir=str(tmp_path), full_scale=512,
        resize=(480, 302), rand_crop=(0.5, 0.7, 1.0, 0.7, 1.0), fliplr=0.5,
    )
    assert ds.num_classes == 10
    for seed in range(3):  # hits both crop and no-crop branches
        out = ds.__getitem__(0, np.random.RandomState(seed))
        assert out["img"].shape[:2] == (302, 480)  # always resized
        _check_sample(out, 10, 512)
    # merge spot checks: "Sky" unmapped -> ignore; "Car 1" -> "car"
    assert ds.label_mapping[A2D2.class_names.index("Sky")] == IGNORE
    car = list(ds.categories.keys()).index("car")
    assert ds.label_mapping[A2D2.class_names.index("Car 1")] == car

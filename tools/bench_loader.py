"""Host input pipeline rate test: can the loader feed the device?

Builds a synthetic ON-DISK nuScenes-shaped dataset (1600x900 JPEG frames +
pkl scan records), then measures `data.loader.Loader` end-to-end scans/s
(JPEG decode -> resize -> depth/label maps -> jitter/flip -> 3D augment ->
Morton pre-sort -> collate) under:

  numpy        pure-numpy image ops (MM2D3D_HOST_NATIVE=0 equivalent)
  native       C++ resize + map ops (the default when csrc builds)
  cache        decoded-image cache (tools/cache_images) + native ops

and reports, against the measured device train rate (PERFORMANCE.md), how
many such worker cores each configuration needs.  Usage:

    python tools/bench_loader.py [--scans 48] [--points 12000] [--workers N]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

DEVICE_TRAIN_SCANS_PER_SEC = 77.0  # PERFORMANCE.md train step, 1 chip


def make_on_disk_dataset(root: str, n_scans: int, n_points: int, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    records = []
    os.makedirs(osp.join(root, "samples"), exist_ok=True)
    for i in range(n_scans):
        # smooth-ish image so the JPEG is realistically sized
        low = rng.randint(0, 255, size=(45, 80, 3), dtype=np.uint8)
        img = np.asarray(
            Image.fromarray(low).resize((1600, 900), Image.BILINEAR)
        )
        rel = f"samples/frame_{i:04d}.jpg"
        Image.fromarray(img).save(osp.join(root, rel), quality=90)

        pts_cam = np.stack(
            [
                rng.uniform(-20, 20, n_points),
                rng.uniform(-3, 3, n_points),
                rng.uniform(2, 60, n_points),
            ],
            1,
        ).astype(np.float32)
        points_img = np.stack(
            [rng.uniform(0, 899, n_points), rng.uniform(0, 1599, n_points)], 1
        ).astype(np.float32)
        records.append(
            {
                "points": pts_cam + rng.randn(3).astype(np.float32),
                "pts_cam_coord": pts_cam,
                "seg_labels": rng.randint(
                    0, 17, size=n_points
                ).astype(np.uint8),
                "points_img": points_img,
                "camera_path": rel,
                "lidar_path": "",
                "sample_token": f"tok{i}",
                "scene_name": "scene-0001",
                "calib": {
                    "cam_intrinsic": [[1266.0, 0, 816.0], [0, 1266.0, 491.0],
                                      [0, 0, 1.0]],
                },
            }
        )
    with open(osp.join(root, "train_usa.pkl"), "wb") as f:
        pickle.dump(records, f)
    return records


def run_config(name, root, n_scans, num_workers, cache_dir=None, epochs=2):
    from mm2d3d_tpu.data.loader import Loader
    from mm2d3d_tpu.data.nuscenes import NuScenesLidarSeg

    ds = NuScenesLidarSeg(
        split=("train_usa",),
        preprocess_dir=root,
        nuscenes_dir=root,
        image_cache_dir=cache_dir,
        noisy_rot=0.1, flip_x=0.5, rot=6.2831, transl=True,
        fliplr=0.5, color_jitter=(0.4, 0.4, 0.4),
    )
    loader = Loader(ds, batch_size=8, n_points=8192, shuffle=True,
                    num_workers=num_workers, full_scale=4096)
    # warm one batch (imports, native lib build, file cache)
    next(iter(loader))
    t0 = time.perf_counter()
    n = 0
    for ep in range(epochs):
        loader.set_epoch(ep)
        for b in loader:
            n += b.batch_size
    dt = time.perf_counter() - t0
    loader.close()
    rate = n / dt
    cores = DEVICE_TRAIN_SCANS_PER_SEC / rate
    print(
        f"{name:28s} {rate:8.1f} scans/s/core   "
        f"({1000 * dt / n:6.2f} ms/scan, cores for "
        f"{DEVICE_TRAIN_SCANS_PER_SEC:.0f} scans/s: {cores:.1f})",
        flush=True,
    )
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=48)
    ap.add_argument("--points", type=int, default=12000)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from mm2d3d_tpu import native
    from mm2d3d_tpu.data import augment

    tmp = tempfile.mkdtemp(prefix="mm2d3d_loaderbench_")
    print(f"dataset: {args.scans} scans x {args.points} pts -> {tmp}")
    records = make_on_disk_dataset(tmp, args.scans, args.points)

    results = {}
    have_native = native.available()
    # numpy-only path
    augment._USE_NATIVE = False
    results["numpy"] = run_config("numpy image ops", tmp, args.scans,
                                  args.workers)
    if have_native:
        augment._USE_NATIVE = True
        results["native"] = run_config("native (C++) image ops", tmp,
                                       args.scans, args.workers)
        from mm2d3d_tpu.data.image_cache import build_image_cache

        cache_dir = osp.join(tmp, "img_cache")
        t0 = time.perf_counter()
        build_image_cache([r["camera_path"] for r in records], tmp,
                          cache_dir, (400, 225))
        print(f"cache build: {time.perf_counter() - t0:.1f}s one-time")
        results["cache"] = run_config("decoded-image cache", tmp,
                                      args.scans, args.workers, cache_dir)
    print(json.dumps({
        "metric": "loader_scans_per_sec_per_core",
        "results": {k: round(v, 1) for k, v in results.items()},
        "device_train_scans_per_sec": DEVICE_TRAIN_SCANS_PER_SEC,
    }))
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

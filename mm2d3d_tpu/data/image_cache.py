"""Decoded-image cache: resize-once, load-as-memcpy for the train loop.

JPEG decode + bilinear resize of the 1600x900 nuScenes frames is the
dominant per-sample CPU cost of the host input pipeline (~10x the rest of
`__getitem__`).  Both are deterministic per image, so they belong in the
one-time preprocess step, not in the hot loop — the reference pays them
every epoch in its DataLoader workers
(``/root/reference/lib/dataset/nuscenes_dataloader.py:257-266``).

`build_image_cache` decodes every camera frame referenced by the pkl scan
records, resizes it to the training resolution with the same bilinear
kernel the datasets use (`data.augment.bilinear_resize`, C++-accelerated
when available), and stores it as a uint8 ``.npy`` mirroring the original
path layout plus a ``meta.json`` carrying the original (W, H) per file
(needed to rescale projected points/intrinsics) and the cache resolution.

`ImageCache.get` then serves (resized uint8 HWC, original (W, H)) with a
single small file read.  uint8 quantization matches the PIL convention the
reference uses (PIL resize returns uint8); the numpy float path differs by
at most 0.5/255 per channel.

CLI: ``python -m mm2d3d_tpu.tools.cache_images``.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_META = "meta.json"


class ImageCache:
    """Read side: serves resized frames from a `build_image_cache` dir."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        with open(osp.join(cache_dir, _META)) as f:
            meta = json.load(f)
        self.resize: Tuple[int, int] = tuple(meta["resize"])  # (W, H)
        self.orig_sizes: Dict[str, Tuple[int, int]] = {
            k: tuple(v) for k, v in meta["orig_sizes"].items()
        }

    def get(self, rel_path: str) -> Optional[Tuple[np.ndarray, Tuple[int, int]]]:
        """(resized uint8 HWC image, original (W, H)) or None if not cached."""
        size = self.orig_sizes.get(rel_path)
        if size is None:
            return None
        img = np.load(osp.join(self.cache_dir, rel_path + ".npy"))
        return img, size


def build_image_cache(
    camera_paths: Sequence[str],
    image_dir: str,
    cache_dir: str,
    resize: Tuple[int, int],  # (W, H), PIL convention — the dataset's value
) -> int:
    """Decode + resize every frame once; returns the number of frames cached.

    Frames already present in the cache (same resize) are skipped, so the
    tool is resumable and can be run per split.
    """
    from .augment import bilinear_resize
    from .nuscenes import load_image

    os.makedirs(cache_dir, exist_ok=True)
    meta_path = osp.join(cache_dir, _META)
    orig_sizes: Dict[str, Tuple[int, int]] = {}
    if osp.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if tuple(meta["resize"]) != tuple(resize):
            raise ValueError(
                f"cache at {cache_dir} was built at resize {meta['resize']}, "
                f"requested {resize}; use a fresh directory per resolution"
            )
        orig_sizes = {k: tuple(v) for k, v in meta["orig_sizes"].items()}

    done = 0
    for rel in dict.fromkeys(camera_paths):  # dedup, keep order
        if rel in orig_sizes:
            continue
        img = load_image(osp.join(image_dir, rel))
        in_size = (img.shape[1], img.shape[0])  # (W, H)
        if in_size != tuple(resize):
            img = bilinear_resize(img, (resize[1], resize[0]))
        out = np.clip(np.round(img), 0, 255).astype(np.uint8)
        dst = osp.join(cache_dir, rel + ".npy")
        os.makedirs(osp.dirname(dst), exist_ok=True)
        np.save(dst, out)
        orig_sizes[rel] = in_size
        done += 1

    with open(meta_path, "w") as f:
        json.dump(
            {"resize": list(resize),
             "orig_sizes": {k: list(v) for k, v in orig_sizes.items()}},
            f,
        )
    return done

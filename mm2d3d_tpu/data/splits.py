"""Dataset split tables.

The nuScenes scene-name tables (official train/val/test plus the UDA/SSDA
splits: val_night, val_singapore, val_all, singapore_train,
train_singapore_labeled/unlabeled) and the VirtualKITTI scene ids are data
constants of the benchmark (reference:
``lib/dataset/nuscenes_splits.py:1-1516``,
``lib/dataset/virtual_kitti_splits.py:1-9``); they are shipped here as JSON
assets and loaded lazily.
"""

from __future__ import annotations

import functools
import json
import os.path as osp
from typing import Dict, List

_ASSET_DIR = osp.join(osp.dirname(__file__), "assets")


@functools.lru_cache(maxsize=None)
def nuscenes_splits() -> Dict[str, List[str]]:
    with open(osp.join(_ASSET_DIR, "nuscenes_splits.json")) as f:
        return json.load(f)


@functools.lru_cache(maxsize=None)
def virtual_kitti_splits() -> Dict[str, List[str]]:
    with open(osp.join(_ASSET_DIR, "virtual_kitti_splits.json")) as f:
        return json.load(f)

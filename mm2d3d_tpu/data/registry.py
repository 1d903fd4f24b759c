"""Dataset registry + datamodule assembly (load_datamodule equivalent).

Mirrors ``lib/dataset/__init__.py:156-296``: a scenario name selects the
source/target dataset classes; four datasets are built (source-train,
target-train, target-val, target-test) and wrapped into loaders.  The
train pair is consumed via max_size_cycle (see `data.loader`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

from .a2d2 import A2D2
from .loader import Loader
from .nuscenes import NuScenesLidarSeg
from .semantic_kitti import SemanticKITTI
from .virtual_kitti import VirtualKITTI


@dataclass
class DataModule:
    source_train: Loader
    target_train: Loader
    target_val: Loader
    target_test: Loader
    num_classes: int
    class_names: list


def _merge(base: Dict, extra: Optional[Dict]) -> Dict:
    out = dict(base)
    out.update(extra or {})
    return out


def load_datamodule(
    name: str,
    cfg_source: Dict[str, Any],
    cfg_target: Dict[str, Any],
    batch_size: int = 8,
    n_points: int = 8192,
    test_batch_size: Optional[int] = None,
    num_workers: int = 0,
    augmentations: Optional[Dict] = None,
    specific: Optional[Dict] = None,
    seed: int = 42,
    short_run: bool = False,
    reduce_factor: int = 1,
    num_shards: int = 1,
    shard_id: int = 0,
    full_scale: int = 4096,
    eval_n_points: Optional[int] = None,
) -> DataModule:
    """Build the four datasets + loaders for a UDA scenario.

    name: "nuscenes" | "a2d2_semantic_kitti" | "vkitti_semantic_kitti"
    cfg_source/cfg_target: dicts with TRAIN/VAL/TEST split lists plus
      dataset-specific paths (preprocess_dir, nuscenes_dir, ...).
    eval_n_points: separate point budget for the val/test loaders (defaults
      to `n_points`).  The reference evaluates EVERY in-bounds point
      (train.py:319-330); real 64-beam scans can exceed a training budget
      tuned for speed, so evaluation gets its own (usually larger) budget
      — training keeps the tight one.
    """
    specific = specific or {}
    augmentations = augmentations or {}
    common = dict(specific)
    # production default: ship raw uint8 images + jitter params and run
    # /255 + ColorJitter + the RGB feats gather ON DEVICE (4x less
    # host->device traffic; train.batch.prepare_device_batch).  Opt out per
    # scenario with `datasets.specific.device_image_ops: false`; host path
    # is forced when an image_normalizer is configured (device path does
    # not support it).
    if augmentations.get("image_normalizer"):
        # augmentations are merged into TRAIN datasets only (reference
        # lib/dataset/__init__.py:181-209 does the same), so a normalizer
        # here would train on normalized images and evaluate on /255-only
        # ones — a silent train/eval input-distribution mismatch.  Refuse
        # loudly; `specific` applies to all four datasets.
        raise ValueError(
            "image_normalizer belongs under datasets.specific (it must "
            "apply identically to train AND val/test datasets), not under "
            "datasets.augmentations, which only reaches the train datasets"
        )
    common.setdefault(
        # the device image path has no normalizer hook, so a configured
        # normalizer forces the host path for every dataset
        "device_image_ops", not common.get("image_normalizer"),
    )
    shared_kw = dict(short_run=short_run, reduce_factor=reduce_factor)

    def splits(cfg, key):
        v = cfg.get(key)
        return tuple(v) if v else None

    if name == "nuscenes":
        def make(cfg, split, train):
            kw = _merge(common, augmentations if train else {})
            kw.pop("merge_classes_style", None)
            return NuScenesLidarSeg(
                split=split,
                preprocess_dir=cfg["preprocess_dir"],
                nuscenes_dir=cfg.get("nuscenes_dir", ""),
                pselab_paths=cfg.get("pselab_paths"),
                image_cache_dir=cfg.get("image_cache_dir"),
                output_orig=not train,
                **kw,
                **shared_kw,
            )

        src_train = make(cfg_source, splits(cfg_source, "TRAIN"), True)
        trg_train = make(cfg_target, splits(cfg_target, "TRAIN"), True)
        trg_val = make(cfg_target, splits(cfg_target, "VAL"), False)
        trg_test = make(cfg_target, splits(cfg_target, "TEST"), False)

    elif name == "a2d2_semantic_kitti":
        style = specific.get("merge_classes_style", "A2D2")

        def make_src(cfg, split, train):
            kw = _merge(common, augmentations if train else {})
            kw.pop("merge_classes_style", None)
            kw.pop("crop_size", None)
            kw.pop("bottom_crop", None)
            return A2D2(
                split=split, preprocess_dir=cfg["preprocess_dir"],
                **kw, **shared_kw,
            )

        def make_trg(cfg, split, train):
            kw = _merge(common, augmentations if train else {})
            kw["merge_classes_style"] = style
            kw.pop("merge_classes", None)
            kw.pop("resize", None)
            kw.pop("rand_crop", None)
            if not train:
                kw.pop("crop_size", None)
                kw.pop("bottom_crop", None)
            return SemanticKITTI(
                split=split, preprocess_dir=cfg["preprocess_dir"],
                semantic_kitti_dir=cfg.get("semantic_kitti_dir", ""),
                pselab_paths=cfg.get("pselab_paths") if train else None,
                output_orig=not train,
                **kw, **shared_kw,
            )

        src_train = make_src(cfg_source, splits(cfg_source, "TRAIN"), True)
        trg_train = make_trg(cfg_target, splits(cfg_target, "TRAIN"), True)
        trg_val = make_trg(cfg_target, splits(cfg_target, "VAL"), False)
        trg_test = make_trg(cfg_target, splits(cfg_target, "TEST"), False)

    elif name == "vkitti_semantic_kitti":
        def make_src(cfg, split, train):
            kw = _merge(common, augmentations if train else {})
            kw.pop("merge_classes_style", None)
            return VirtualKITTI(
                split=split, preprocess_dir=cfg["preprocess_dir"],
                virtual_kitti_dir=cfg.get("virtual_kitti_dir", ""),
                output_orig=not train,
                **kw, **shared_kw,
            )

        def make_trg(cfg, split, train):
            kw = _merge(common, augmentations if train else {})
            kw["merge_classes_style"] = "VirtualKITTI"
            kw.pop("merge_classes", None)
            kw.pop("downsample", None)
            kw.pop("random_weather", None)
            if not train:
                kw.pop("crop_size", None)
                kw.pop("bottom_crop", None)
            return SemanticKITTI(
                split=split, preprocess_dir=cfg["preprocess_dir"],
                semantic_kitti_dir=cfg.get("semantic_kitti_dir", ""),
                pselab_paths=cfg.get("pselab_paths") if train else None,
                output_orig=not train,
                **kw, **shared_kw,
            )

        src_train = make_src(cfg_source, splits(cfg_source, "TRAIN"), True)
        trg_train = make_trg(cfg_target, splits(cfg_target, "TRAIN"), True)
        trg_val = make_trg(cfg_target, splits(cfg_target, "VAL"), False)
        trg_test = make_trg(cfg_target, splits(cfg_target, "TEST"), False)
    else:
        raise ValueError(f"unknown datamodule {name!r}")

    test_bs = test_batch_size or batch_size
    eval_np = eval_n_points or n_points
    shard_kw = dict(num_shards=num_shards, shard_id=shard_id,
                    full_scale=full_scale)
    # NB multi-host (num_shards > 1): val/test loaders shard too; the tail
    # partial GLOBAL batch is padded with fully-masked filler samples
    # (collectives need equal per-process batches) so every scan is still
    # evaluated exactly once — same totals as a single-host run.
    return DataModule(
        source_train=Loader(src_train, batch_size, n_points, shuffle=True,
                            drop_last=True, seed=seed, num_workers=num_workers,
                            **shard_kw),
        target_train=Loader(trg_train, batch_size, n_points, shuffle=True,
                            drop_last=True, seed=seed + 1, num_workers=num_workers,
                            **shard_kw),
        target_val=Loader(trg_val, test_bs, eval_np, num_workers=num_workers,
                          pad_last=True, **shard_kw),
        target_test=Loader(trg_test, test_bs, eval_np, num_workers=num_workers,
                           pad_last=True, **shard_kw),
        num_classes=src_train.num_classes,
        class_names=list(src_train.merged_class_names),
    )

"""Experiment driver CLI (reference run.py equivalent).

Usage:
    python -m mm2d3d_tpu.run --config configs/config.yaml [overrides...]
    python -m mm2d3d_tpu.run --config configs/config.yaml run=test
    python -m mm2d3d_tpu.run --config configs/config.yaml \
        datasets=nuscenes_day_night run.fast_dev_run=true

Re-expresses ``experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/run.py:37-305``:
seeding, logger + run-id persistence, datamodule, per-model optimizers with
OneCycle, task construction, jit smoke-check (TorchScript-check analog),
checkpoint/resume, fit then test.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Dict

import numpy as np


def build_task(cfg: Dict, num_classes: int, axis_name=None):
    import jax.numpy as jnp

    from .models.registry import get_entry, load_model
    from .train.losses import LossComposer
    from .train.step import MM2D3DTask

    m3 = cfg["models"]["net3d"]["backbone_3d"]
    params = cfg["train"]["params"]
    composer = LossComposer(cfg.get("losses", ["cross_entropy"]))
    # the train step produces segmentation predictions only; a config that
    # lists losses for other targets (e.g. depth) would be silently ignored
    # — fail loudly instead (the reference also only ever calls
    # Loss("segmentation", ...), train.py:199-211)
    unknown = composer.targets() - {"segmentation"}
    if unknown:
        raise ValueError(
            f"losses configured for unsupported target(s) {sorted(unknown)}; "
            "the cross-modal UDA step only produces 'segmentation' predictions"
        )
    # class-weight/num_classes seam: jnp gather CLIPS out-of-bounds indices,
    # so a 6-entry weight list against num_classes=10 would silently weight
    # labels 6-9 with weight[5] — refuse instead of training wrong
    cw = composer.class_weights("segmentation")
    if isinstance(cw, str):
        raise ValueError(
            f"class weight {cw!r} is unresolved; 'compute' is resolved from "
            "the source train split by the run driver (resolve_auto_params) "
            "— pass explicit per-class weights when building a task directly"
        )
    if cw is not None and len(cw) != num_classes:
        raise ValueError(
            f"losses: {len(cw)} cross-entropy class weights but the dataset "
            f"has num_classes={num_classes}; out-of-range labels would "
            "silently gather clipped weights"
        )
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg["train"].get("compute_dtype", "bfloat16")
    ]
    # model plugin protocol (reference ModelWrapper, train.py:508-544): each
    # branch is resolved by name through the registry — built-in or any
    # importable module exporting `Model`
    name2d = cfg["models"]["net2d"].get("name", "net2d")
    name3d = cfg["models"]["net3d"].get("name", "net3d")
    model2d = load_model(
        name2d,
        num_classes=num_classes,
        frozen_batch_norm=cfg["models"]["net2d"].get("frozen_batch_norm", False),
        compute_dtype=dtype,
        **cfg["models"]["net2d"].get("args", {}),
    )
    model3d = load_model(
        name3d,
        num_classes=num_classes,
        in_channels=m3.get("in_channels", 3),
        m=m3["m"],
        block_reps=m3.get("block_reps", 1),
        residual_blocks=m3.get("residual_blocks", False),
        full_scale=m3["full_scale"],
        num_planes=m3["num_planes"],
        compute_dtype=dtype,
        **cfg["models"]["net3d"].get("args", {}),
    )
    task = MM2D3DTask(
        num_classes=num_classes,
        class_weights=composer.class_weights("segmentation"),
        loss_composer=composer,
        lambda_xm_src=params.get("lambda_xm_src", 1.0),
        lambda_xm_trg=params.get("lambda_xm_trg", 0.1),
        full_scale=m3["full_scale"],
        num_planes=m3["num_planes"],
        m=m3["m"],
        block_reps=m3.get("block_reps", 1),
        residual_blocks=m3.get("residual_blocks", False),
        in_channels_3d=m3.get("in_channels", 3),
        frozen_batch_norm=cfg["models"]["net2d"].get("frozen_batch_norm", False),
        compute_dtype=dtype,
        optimizer_2d=cfg["models"]["net2d"]["optimizer"],
        optimizer_3d=cfg["models"]["net3d"]["optimizer"],
        axis_name=axis_name,
        model2d=model2d,
        model3d=model3d,
        slot_profile=cfg["train"].get("slot_profile", "default"),
    )
    # model plugin metadata for the run record (reference logs signature +
    # pip dependencies per wrapped model, train.py:514-521)
    task.model_info = {}
    for branch, name in (("net2d", name2d), ("net3d", name3d)):
        entry = get_entry(name)
        sig = entry.get("signature")
        task.model_info[branch] = {
            "name": name,
            "dependencies": list(entry.get("dependencies") or []),
            "signature": None
            if sig is None
            else [
                {k: list(v.shape) for k, v in part.items()} for part in sig
            ],
        }
    return task


def resolve_auto_params(cfg: Dict, dm) -> None:
    """Resolve data-dependent config placeholders in place.

    - ``losses[*].args.weight: compute`` → log-smoothed class weights from
      the SOURCE train split (``data.base.compute_class_weights`` — the same
      recipe the reference used to derive its published lists,
      ``lib/dataset/nuscenes_dataloader.py:421-441``).  This is how a new
      scenario (e.g. A2D2→SemanticKITTI, which ships no experiment dir in
      the reference) gets correct per-class weights without hand-editing.
    - ``optimizer.lr_scheduler.total_steps: auto`` → ``max_epochs × steps
      per epoch`` where steps/epoch is ``max(len(source), len(target))``
      (max_size_cycle pairing, reference run.py:253).
    """
    from .utils.logging import rank_zero

    for entry in cfg.get("losses", []):
        if (
            isinstance(entry, dict)
            and entry.get("args", {}).get("weight") == "compute"
        ):
            from .data.base import compute_class_weights

            w = compute_class_weights(dm.source_train.dataset)
            entry["args"]["weight"] = [float(x) for x in w]
            if rank_zero():
                print(f"computed class weights: {entry['args']['weight']}")
    steps_per_epoch = max(len(dm.source_train), len(dm.target_train))
    for branch in cfg["models"].values():
        sched = (branch.get("optimizer") or {}).get("lr_scheduler") or {}
        if sched.get("total_steps") == "auto":
            sched["total_steps"] = cfg["run"]["max_epochs"] * steps_per_epoch
            if rank_zero():
                print(f"total_steps=auto -> {sched['total_steps']}")


def resolve_num_workers(value) -> int:
    """``train.num_workers: auto`` -> cpu_count() // 4 (the reference's
    DataLoader default, ``lib/dataset/__init__.py:161``), floored to 0 on
    tiny hosts where a fork pool costs more than it parallelizes.  Ints
    pass through."""
    if value == "auto":
        n = os.cpu_count() or 1
        return n // 4 if n >= 4 else 0
    return int(value)


def build_datamodule(cfg: Dict, num_shards: int = 1, shard_id: int = 0):
    from .data.registry import load_datamodule

    ds = cfg["dataset"]
    run = cfg["run"]
    per_process = run["batch_size"] // num_shards
    test_bs = run.get("test_batch_size")
    return load_datamodule(
        ds["name"],
        cfg_source=ds["source"],
        cfg_target=ds["target"],
        batch_size=per_process,
        test_batch_size=None if test_bs is None else test_bs // num_shards,
        n_points=cfg["train"].get("n_points", 8192),
        eval_n_points=cfg["train"].get("eval_n_points"),
        num_workers=resolve_num_workers(cfg["train"].get("num_workers", "auto")),
        augmentations=ds.get("augmentations"),
        specific=ds.get("specific"),
        seed=cfg["train"].get("seed", 42),
        num_shards=num_shards,
        shard_id=shard_id,
        full_scale=cfg["models"]["net3d"]["backbone_3d"].get("full_scale", 4096),
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("overrides", nargs="*", help="group=name or a.b=c")
    args = parser.parse_args(argv)

    from .utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    # dataset-specific train overrides (e.g. lambda_xm for vkitti)
    if "train_overrides" in cfg:
        from .utils.config import _deep_merge

        cfg["train"] = _deep_merge(cfg["train"], cfg.pop("train_overrides"))

    # multi-host (multi-slice) runtime: one process per host, coordinated by
    # the standard JAX distributed runtime (SURVEY §2.7 — the reference's
    # Lightning DDP process group, recast).  Enable with run.distributed=true
    # or MM2D3D_DISTRIBUTED=1; coordinator/process env vars follow JAX
    # conventions (auto-detected on TPU pods).
    if cfg["run"].get("distributed") or os.environ.get("MM2D3D_DISTRIBUTED") == "1":
        import jax

        jax.distributed.initialize()

    seed = cfg["train"].get("seed", 42)
    np.random.seed(seed)

    out_dir = cfg["train"].get("out_dir", "runs/default")
    os.makedirs(out_dir, exist_ok=True)

    from .utils.logging import create_logger, snapshot_code

    run_cfg = cfg["run"]
    logger = create_logger(
        cfg.get("logging"), out_dir=out_dir, resume=run_cfg.get("resume", False)
    )
    logger.log_hyperparams(
        {"config": args.config, "overrides": args.overrides, **cfg["train"]["params"]}
    )
    snapshot_code(out_dir, osp.dirname(osp.dirname(osp.abspath(__file__))))

    import jax

    # data parallelism over all local devices (NCCL-DDP equivalent): batch
    # sharded along the mesh "data" axis, grads/stats pmean'd (run.py:52-54,
    # 262-268 in the reference)
    mesh = None
    axis_name = None
    n_dev = jax.device_count()
    dp = cfg["run"].get("data_parallel", "auto")
    if dp != "off" and n_dev > 1:
        if cfg["run"]["batch_size"] % n_dev == 0:
            from .parallel.mesh import make_mesh

            mesh = make_mesh()
            axis_name = "data"
            print(f"data parallel over {n_dev} devices")
        elif dp == "on":
            raise ValueError(
                f"batch_size {cfg['run']['batch_size']} not divisible by "
                f"{n_dev} devices"
            )
        else:
            print(
                f"warning: batch_size {cfg['run']['batch_size']} not divisible "
                f"by {n_dev} devices; training single-device"
            )

    n_proc, proc_id = jax.process_count(), jax.process_index()
    if n_proc > 1:
        assert cfg["run"]["batch_size"] % n_proc == 0, (
            f"global batch {cfg['run']['batch_size']} not divisible by "
            f"{n_proc} processes"
        )
        if mesh is None:
            # without the mesh there is no grad/stat pmean: each process
            # would silently train an independent, divergent model on its
            # data shard while writing to the same out_dir
            raise ValueError(
                "multi-host run requires the data-parallel mesh: "
                "run.data_parallel must not be 'off' and the global batch "
                f"({cfg['run']['batch_size']}) must be divisible by the "
                f"device count ({n_dev})"
            )
        tbs = cfg["run"].get("test_batch_size")
        if tbs is not None and tbs % n_proc:
            raise ValueError(
                f"run.test_batch_size {tbs} not divisible by {n_proc} "
                "processes (the floor-divided shards would silently shrink "
                "the global eval batch and drop extra tail scans)"
            )
        print(f"multi-host: process {proc_id}/{n_proc}, "
              f"{jax.local_device_count()} local devices")
    dm = build_datamodule(cfg, num_shards=n_proc, shard_id=proc_id)
    resolve_auto_params(cfg, dm)
    task = build_task(cfg, dm.num_classes, axis_name=axis_name)
    logger.log_hyperparams({"models": task.model_info})

    # optional pretrained RGB backbone import (reference backbones.py:23-27)
    pretrained = cfg["models"]["net2d"].get("pretrained_backbone")

    from .train.trainer import Trainer

    trainer = Trainer(
        task,
        source_loader=dm.source_train,
        target_loader=dm.target_train,
        val_loader=dm.target_val,
        test_loader=dm.target_test,
        ckpt_dir=osp.join(out_dir, "ckpts"),
        max_epochs=run_cfg["max_epochs"],
        check_val_every_n_epoch=run_cfg.get("check_val_every_n_epoch", 1),
        class_names=dm.class_names,
        logger=logger,
        seed=seed,
        limit_train_batches=run_cfg.get("limit_train_batches"),
        limit_val_batches=run_cfg.get("limit_val_batches"),
        fast_dev_run=run_cfg.get("fast_dev_run", False),
        train_log_images_step=cfg["train"]["params"].get("train_log_images_step", 2000),
        val_log_images_step=cfg["train"]["params"].get("val_log_images_step"),
        class_palette=cfg["train"]["params"].get("class_palette"),
        # truncated eval points are always surfaced (WARNING + the
        # {stage}/points_dropped metric); strict mode upgrades that to an
        # error but is opt-in — a default-on RuntimeError at the first
        # validation pass would kill long runs (and, multi-host, hang the
        # other processes in collectives) over a budget knob
        strict_eval_points=cfg["train"].get("strict_eval_points", False),
        strict_eval_overflow=cfg["train"].get("strict_eval_overflow", False),
        viz_dir=osp.join(out_dir, "figures"),
        # host topology pipelining pays off on PCIe-attached TPU hosts; over
        # a low-bandwidth tunnel the array transfer dominates - default off.
        host_topology=cfg["train"].get("host_topology", False),
        mesh=mesh,
        # host->device double buffering depth (0 disables)
        prefetch_batches=cfg["train"].get("prefetch_batches", 2),
    )

    import jax
    import jax.numpy as jnp

    first = next(iter(dm.source_train))
    trainer.init_or_resume(
        jax.tree_util.tree_map(lambda x: None if x is None else jnp.asarray(x), first),
        resume=run_cfg.get("resume", False),
    )

    if pretrained:
        from .models.torch_import import load_pretrained_backbone

        p, s = load_pretrained_backbone(pretrained)
        p, s = dict(p), dict(s)
        params2d = dict(trainer.state.params2d)
        stats2d = dict(trainer.state.stats2d)
        # Net2DSeg hoists the stem into the fused dual-stem module
        params2d["stem_rgb"] = p.pop("stem")
        stats2d["stem_rgb"] = s.pop("stem")
        params2d["rgb_backbone"] = p
        stats2d["rgb_backbone"] = s
        trainer.state = trainer.state.replace(params2d=params2d, stats2d=stats2d)
        print(f"imported pretrained RGB backbone from {pretrained}")

    # fail-fast trace smoke check before committing to training (analog of
    # the reference's TorchScript-ability check, run.py:198-215); the
    # sharded path traces inside shard_map, so check single-device only
    if mesh is None:
        first_dev = trainer._to_device(first)
        jax.eval_shape(
            trainer.task.train_step, trainer.state, first_dev, first_dev,
            jax.random.PRNGKey(0),
        )

    try:
        if run_cfg.get("mode", "train") == "train":
            trainer.fit(resume=run_cfg.get("resume", False))
        trainer.test()
    finally:
        # drain + close the worker pools even on an aborted run: a pool
        # torn down by interpreter-exit with results in flight can hang
        # on its clogged pipes (see data.loader.Loader.close)
        for lo in (dm.source_train, dm.target_train, dm.target_val,
                   dm.target_test):
            lo.close()
    logger.finish()


if __name__ == "__main__":
    main()

"""Generate self-training pseudo-labels for the target-train split.

The reference consumes pseudo-label ``.npy`` files through ``pselab_paths``
(``lib/dataset/nuscenes_dataloader.py:96-162``) with the schema
``[{probs_2d, pseudo_label_2d, probs_3d, pseudo_label_3d, probs_ensemble,
pseudo_label_ensemble}, ...]`` (one record per scan, arrays over the scan's
FULL point set), but ships no generator (SURVEY.md D10).  This tool closes
the self-training loop: it runs a trained checkpoint over the target-train
scans in eval mode (no augmentation) and writes that exact schema; the
datasets then refine them with the BDL median filter
(`data.pseudo_labels.refine_pseudo_labels`) at load time.

Usage:
    python -m mm2d3d_tpu.tools.generate_pseudo_labels \
        --config configs/config.yaml --ckpt best_2d \
        --out runs/default/pselab/target_train.npy [overrides...]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Dict, List

import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << max(8, (n - 1).bit_length())


def generate(
    cfg: Dict, ckpt_name: str, out_path: str, strict: bool = False
) -> List[Dict]:
    import jax
    import jax.numpy as jnp

    from ..data.base import collate
    from ..run import build_datamodule, build_task
    from ..train.batch import build_topology
    from ..train.trainer import CheckpointIO

    # eval-mode dataset over the TRAIN split: reuse the registry's val path
    # (train=False -> no augmentation, output_orig=True) pointed at TRAIN.
    cfg = dict(cfg)
    ds = dict(cfg["dataset"])
    target = dict(ds["target"])
    target["VAL"] = target["TRAIN"]
    target.pop("pselab_paths", None)
    ds["target"] = target
    cfg["dataset"] = ds
    dm = build_datamodule(cfg)
    dataset = dm.target_val.dataset

    task = build_task(cfg, dm.num_classes)

    # restore the checkpoint into a template state
    sample = dataset[0]
    n_pts0 = _next_pow2(len(sample["coords"]))
    example = jax.tree_util.tree_map(
        jnp.asarray, collate([sample], n_pts0, full_scale=task.full_scale)
    )
    state = task.init_state(jax.random.PRNGKey(0), example)
    ckpt_dir = osp.join(cfg["train"].get("out_dir", "runs/default"), "ckpts")
    mgr = CheckpointIO(ckpt_dir)
    if not mgr.exists(ckpt_name):
        raise FileNotFoundError(f"checkpoint {ckpt_name!r} not in {ckpt_dir}")
    state, meta = mgr.restore(ckpt_name, state)
    print(f"restored {ckpt_name} from {ckpt_dir} (meta: {meta})")

    from ..train.batch import prepare_device_batch

    @jax.jit
    def forward(params2d, params3d, stats2d, stats3d, batch):
        batch = prepare_device_batch(batch)  # wire-format batches
        topo = build_topology(batch, task.full_scale, task.num_planes)
        p2, _, _, _ = task._fwd2d(params2d, stats2d, batch, False)
        p3, _, _, _ = task._fwd3d(params3d, stats3d, batch, *topo, False)
        b, n = batch.point_mask.shape
        c = task.num_classes
        sm2 = jax.nn.softmax(p2["seg_logit"].reshape(b, n, c), -1)
        sm3 = jax.nn.softmax(p3["seg_logit"].reshape(b, n, c), -1)
        ens = (sm2 + sm3) / 2
        # slot-table overflow (dropped conv hits) would otherwise be silent
        # at pseudo-labeling time; surfaced per scan below
        slot_overflow = sum(
            lvl.slot_overflow
            for lvl in topo[1].levels
            if lvl.slot_overflow is not None
        ) + jnp.int32(0)
        return {
            "probs_2d": sm2.max(-1),
            "pseudo_label_2d": jnp.argmax(sm2, -1),
            "probs_3d": sm3.max(-1),
            "pseudo_label_3d": jnp.argmax(sm3, -1),
            "probs_ensemble": ens.max(-1),
            "pseudo_label_ensemble": jnp.argmax(ens, -1),
            "slot_overflow": slot_overflow,
        }

    records: List[Dict] = []
    for i in range(len(dataset)):
        sample = dataset[i]
        idxs = np.asarray(sample["orig_points_idx"])  # (full,) bool
        full = len(idxs)
        kept = int(idxs.sum())
        n_pts = _next_pow2(kept)  # bucketed: few distinct compiled shapes
        batch = jax.tree_util.tree_map(
            jnp.asarray, collate([sample], n_pts, full_scale=task.full_scale)
        )
        raw = forward(state.params2d, state.params3d, state.stats2d,
                      state.stats3d, batch)
        overflow = int(raw.pop("slot_overflow"))
        if overflow:
            msg = (
                f"scan {i}: {overflow} conv hits dropped by the "
                "slot-table cap — pseudo labels are approximate; raise "
                "default_slot_caps (train.slot_profile: dense)"
            )
            if strict:
                # corrupted pseudo labels poison the whole SSDA/pselab run;
                # strict mode refuses to write them (mirrors
                # Trainer.strict_eval_overflow)
                raise RuntimeError(msg)
            print(f"WARNING: {msg}")
        # collate Morton-sorts points host-side; restore scan order via the
        # recorded permutation before slicing the kept rows
        perm = np.asarray(batch.point_perm[0])

        def unsort(x):
            x = np.asarray(x[0])
            orig = np.empty_like(x)
            orig[perm] = x
            return orig[:kept]

        out = jax.tree_util.tree_map(unsort, raw)
        rec = {}
        for key in ("2d", "3d", "ensemble"):
            probs = np.zeros(full, np.float32)  # dropped points: prob 0 ->
            labels = np.zeros(full, np.int64)   # discarded by refinement
            probs[idxs] = out[f"probs_{key}"]
            labels[idxs] = out[f"pseudo_label_{key}"]
            rec[f"probs_{key}"] = probs
            rec[f"pseudo_label_{key}"] = labels
        records.append(rec)
        if (i + 1) % 200 == 0 or i + 1 == len(dataset):
            print(f"  {i + 1}/{len(dataset)} scans")

    os.makedirs(osp.dirname(osp.abspath(out_path)), exist_ok=True)
    np.save(out_path, np.asarray(records, dtype=object), allow_pickle=True)
    print(f"wrote {len(records)} pseudo-label records to {out_path}")
    return records


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--ckpt", default="best_2d",
                        help="checkpoint name: best_2d | best_3d | last")
    parser.add_argument("--out", required=True, help="output .npy path")
    parser.add_argument("--strict", action="store_true",
                        help="error (instead of warn) on slot overflow — "
                        "refuse to write approximate pseudo labels")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from ..utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    generate(cfg, args.ckpt, args.out, strict=args.strict)


if __name__ == "__main__":
    main()

"""BDL-style pseudo-label refinement for self-training.

Semantics of the reference (``lib/utils/refine_pseudo_labels.py:4-21`` and
the loading/refine/undo-concat flow in
``lib/dataset/nuscenes_dataloader.py:96-162``): per predicted class, keep
pseudo labels whose probability >= min(median(prob_class), 0.9); discard the
rest as -100.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def refine_pseudo_labels(
    probs: np.ndarray, pseudo_labels: np.ndarray, ignore_label: int = -100
) -> np.ndarray:
    probs = np.asarray(probs)
    out = np.asarray(pseudo_labels).copy()
    for cls in np.unique(out):
        if cls == ignore_label:
            continue
        mask = out == cls
        cls_probs = probs[mask]
        if len(cls_probs) == 0:
            continue
        thresh = min(float(np.median(cls_probs)), 0.9)
        drop = mask & (probs < thresh)
        out[drop] = ignore_label
    return out


def load_and_refine_pseudo_labels(
    path: str, expected_lengths: Optional[List[int]] = None
) -> List[Dict[str, Any]]:
    """Load a pseudo-label .npy (list of per-scan dicts with probs_2d,
    pseudo_label_2d, probs_3d, pseudo_label_3d, probs_ensemble,
    pseudo_label_ensemble), refine globally, and split back per scan."""
    records = list(np.load(path, allow_pickle=True))
    if expected_lengths is not None:
        assert len(records) == len(expected_lengths), "pseudo-label/scan count mismatch"
        for rec, n in zip(records, expected_lengths):
            assert len(rec["pseudo_label_2d"]) == n, "pseudo-label length mismatch"

    def refine_field(prob_key, label_key):
        probs = np.concatenate([r[prob_key] for r in records])
        labels = np.concatenate([r[label_key] for r in records]).astype(np.int64)
        return refine_pseudo_labels(probs, labels)

    refined_2d = refine_field("probs_2d", "pseudo_label_2d")
    has_3d = records[0].get("probs_3d") is not None
    refined_3d = refine_field("probs_3d", "pseudo_label_3d") if has_3d else None
    refined_ens = refine_field("probs_ensemble", "pseudo_label_ensemble")

    out, left = [], 0
    for rec in records:
        right = left + len(rec["probs_2d"])
        out.append(
            {
                "pseudo_label_2d": refined_2d[left:right],
                "pseudo_label_3d": None if refined_3d is None else refined_3d[left:right],
                "pseudo_label_ensemble": refined_ens[left:right],
            }
        )
        left = right
    return out

"""Generic label remapping (reference lib/utils/segmentation.py:13-39).

`MapLabels` maps a name-indexed label space onto a target set of class
names, sending everything else to -100.  The shipped datasets carry their
own mappings; this generic utility covers custom label spaces.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

IGNORE = -100


class MapLabels:
    def __init__(self, source_names: Sequence[str], target_names: Sequence[str]):
        self.source_names = list(source_names)
        self.target_names = list(target_names)
        self.mapping = np.full(len(source_names), IGNORE, np.int64)
        for i, name in enumerate(source_names):
            if name in target_names:
                self.mapping[i] = target_names.index(name)

    def __call__(self, labels: np.ndarray) -> np.ndarray:
        labels = np.asarray(labels, np.int64)
        out = np.full_like(labels, IGNORE)
        valid = (labels >= 0) & (labels < len(self.mapping))
        out[valid] = self.mapping[labels[valid]]
        return out

"""Profiling & tracing hooks (the reference has none — SURVEY.md §5).

- `StepTimer`: rolling wall-clock stats per named phase, cheap enough for
  the hot loop; reports scans/sec.
- `trace`: context manager around `jax.profiler` producing a perfetto trace
  directory for offline analysis.
- `device_fence`: the ONLY reliable way to wait for device completion on the
  tunneled TPU backend (block_until_ready returns early there).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np


def device_fence(tree) -> None:
    """Host readback of one element — fences all prior device work."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0].reshape(-1)[:1]))


class StepTimer:
    def __init__(self):
        self._acc: Dict[str, list] = defaultdict(list)
        self._open: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def summary(self, reset: bool = True) -> Dict[str, float]:
        out = {}
        for name, vals in self._acc.items():
            out[f"time/{name}_ms"] = float(np.median(vals) * 1e3)
        if reset:
            self._acc.clear()
        return out


@contextlib.contextmanager
def trace(out_dir: str):
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

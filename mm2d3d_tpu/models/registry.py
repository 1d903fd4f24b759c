"""Model plugin protocol (reference ModelWrapper equivalent).

The reference loads each branch as a plugin package exporting ``Model``,
``signature`` (example I/O arrays) and ``dependencies``, imported by module
name with ``importlib`` and configured by introspecting ``Model.__init__``
defaults (``train.py:508-544``, ``2d_net/__init__.py:1-4``).

This registry keeps that capability:

- built-in models register via `@register_model("name", signature=...)`;
- `load_model("name" | "pkg.module", **cfg)` resolves a registry entry or
  importlib-imports a module exporting ``Model`` — third-party model
  packages plug in without touching the framework;
- config keys are filtered against the flax module's dataclass fields
  (the `inspect.signature` introspection of the reference).
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

_REGISTRY: Dict[str, Dict[str, Any]] = {}


def register_model(
    name: str,
    signature: Optional[Tuple] = None,
    dependencies: Optional[list] = None,
) -> Callable:
    def deco(cls):
        _REGISTRY[name] = {
            "cls": cls,
            "signature": signature,
            "dependencies": dependencies or [],
        }
        return cls

    return deco


def available_models() -> list:
    return sorted(_REGISTRY)


def get_entry(name: str) -> Dict[str, Any]:
    if name in _REGISTRY:
        return _REGISTRY[name]
    # plugin path: import a module exporting Model/signature/dependencies
    mod = importlib.import_module(name)
    return {
        "cls": mod.Model,
        "signature": getattr(mod, "signature", None),
        "dependencies": getattr(mod, "dependencies", []),
    }


def load_model(name: str, **config):
    """Instantiate a registered or plugin model, applying only the config
    keys the model actually declares (reference train.py:525-530)."""
    entry = get_entry(name)
    cls = entry["cls"]
    if dataclasses.is_dataclass(cls):
        fields = {f.name for f in dataclasses.fields(cls)}
    else:
        import inspect

        fields = set(inspect.signature(cls).parameters)
    params = {k: v for k, v in config.items() if k in fields}
    return cls(**params)


def _register_builtins():
    from .net2d import Net2DSeg
    from .sparse_unet import Net3DSeg

    register_model(
        "net2d",
        signature=(
            {"img": np.zeros([1, 225, 400, 3], np.float32),
             "depth": np.zeros([1, 225, 400, 1], np.float32),
             "img_indices": np.zeros([1, 8192, 2], np.int32)},
            {"seg_logit": np.zeros([1, 8192, 6], np.float32),
             "seg_logit_2d": np.zeros([1, 225, 400, 6], np.float32)},
        ),
        dependencies=["jax", "flax"],
    )(Net2DSeg)
    register_model(
        "net3d",
        signature=(
            {"feats": np.zeros([8192, 3], np.float32)},
            {"seg_logit": np.zeros([8192, 6], np.float32),
             "confidence": np.zeros([8192, 1], np.float32)},
        ),
        dependencies=["jax", "flax"],
    )(Net3DSeg)


_register_builtins()

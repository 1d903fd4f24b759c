"""YAML config system with hydra-style group composition + CLI overrides.

The reference uses Hydra (`experiments_*/config/config.yaml` with
``defaults: [datasets: <scenario>, run: <train|test>]`` and CLI overrides
like ``run=test``).  Hydra isn't in this image, so this is a small
self-contained equivalent:

- `load_config(path, overrides)` reads the root yaml;
- a top-level `defaults:` list of `{group: name}` entries pulls in
  `<config_dir>/<group>/<name>.yaml`, merged under the root (root wins for
  `_self_`-style precedence: entries listed after `_self_` override root);
- CLI overrides: `group=name` swaps a group choice, `a.b.c=value` sets a
  dotted key (values parsed as yaml).
"""

from __future__ import annotations

import copy
import os.path as osp
from typing import Any, Dict, List, Optional

import yaml


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _set_dotted(cfg: Dict, dotted: str, value: Any):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def load_config(
    path: str, overrides: Optional[List[str]] = None
) -> Dict[str, Any]:
    config_dir = osp.dirname(osp.abspath(path))
    with open(path) as f:
        root = yaml.safe_load(f) or {}

    defaults = root.pop("defaults", [])
    overrides = list(overrides or [])

    # group choices may be swapped from the CLI: "run=test"
    group_overrides = {}
    value_overrides = []
    for ov in overrides:
        key, _, val = ov.partition("=")
        if "." not in key and any(
            isinstance(d, dict) and key in d for d in defaults
        ):
            group_overrides[key] = val
        else:
            value_overrides.append((key, val))

    cfg: Dict[str, Any] = {}
    self_seen = False
    for entry in defaults:
        if entry == "_self_":
            cfg = _deep_merge(cfg, root)
            self_seen = True
            continue
        assert isinstance(entry, dict) and len(entry) == 1, f"bad defaults entry {entry}"
        group, name = next(iter(entry.items()))
        name = group_overrides.get(group, name)
        sub_path = osp.join(config_dir, group, f"{name}.yaml")
        with open(sub_path) as f:
            sub = yaml.safe_load(f) or {}
        cfg = _deep_merge(cfg, sub)
        cfg.setdefault("_groups_", {})[group] = name
    if not self_seen:
        cfg = _deep_merge(root, cfg) if not defaults else _deep_merge(cfg, root)

    for key, val in value_overrides:
        _set_dotted(cfg, key, yaml.safe_load(val))
    return cfg

"""Experiment logging facade: stdout always; W&B / MLflow when available.

Mirrors the reference facade (``lib/logging/__init__.py:31-145``): a single
`create_logger(cfg)` builds the configured sinks, persists run ids to
``run_id.yaml`` for resume re-attachment, and exposes scalar/hyperparam/
artifact logging behind one interface.  wandb/mlflow are OPTIONAL — absent
packages degrade to stdout-only (this image ships neither).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import sys
import time
from typing import Any, Dict, List, Optional


def rank_zero() -> bool:
    """True on process 0 (and on single-process runs / before jax init).

    The reference decorates every logging side-effect with
    ``rank_zero_only`` (``lib/logging/__init__.py:12,76,88,114,128``;
    ``run.py:202``); this is the equivalent seam — multi-process runs must
    not create duplicate tracker runs or race on shared-filesystem writes.
    """
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class BaseLogger:
    name = "base"

    def log_metrics(self, metrics: Dict[str, float], step: int):  # pragma: no cover
        raise NotImplementedError

    def log_hyperparams(self, params: Dict[str, Any]):
        pass

    def log_artifacts(self, path: str):
        pass

    def log_image(self, name: str, path: str, step: int):
        """Qualitative figure (a PNG on disk) — reference train.py:226-241
        logs these to the experiment tracker every N steps."""
        pass

    def finish(self):
        pass

    @property
    def run_id(self) -> Optional[str]:
        return None


class StdoutLogger(BaseLogger):
    name = "stdout"

    def __init__(self, every_n: int = 50):
        self.every_n = every_n
        self._t0 = time.time()

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if step % self.every_n == 0:
            parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
            print(f"[{time.time() - self._t0:8.1f}s] step {step}: {parts}", flush=True)

    def log_hyperparams(self, params: Dict[str, Any]):
        print("hyperparams:", json.dumps(params, default=str)[:2000], flush=True)

    def log_image(self, name, path, step):
        print(f"figure {name} @ step {step}: {path}", flush=True)


class JsonlLogger(BaseLogger):
    """Appends metrics to a JSONL file — the always-on machine-readable sink."""

    name = "jsonl"

    def __init__(self, path: str):
        os.makedirs(osp.dirname(path) or ".", exist_ok=True)
        self.path = path

    def log_metrics(self, metrics: Dict[str, float], step: int):
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, **metrics}) + "\n")

    def log_image(self, name, path, step):
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, "image": {name: path}}) + "\n")


class WandbLogger(BaseLogger):
    name = "wandb"

    def __init__(self, project: str, run_name: str, tags=None, run_id=None):
        import wandb  # optional

        self._wandb = wandb
        self.run = wandb.init(
            project=project, name=run_name, tags=tags, id=run_id,
            resume="allow" if run_id else None,
        )

    def log_metrics(self, metrics, step):
        self.run.log(metrics, step=step)

    def log_hyperparams(self, params):
        self.run.config.update(params, allow_val_change=True)

    def log_artifacts(self, path):
        self.run.save(path)

    def log_image(self, name, path, step):
        self.run.log({name: self._wandb.Image(path)}, step=step)

    def finish(self):
        self.run.finish()

    @property
    def run_id(self):
        return self.run.id


class MLflowLogger(BaseLogger):
    name = "mlflow"

    def __init__(self, experiment_name: str, run_name: str, tags=None,
                 tracking_uri=None, run_id=None):
        import mlflow  # optional

        self._mlflow = mlflow
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        mlflow.set_experiment(experiment_name)
        self.run = mlflow.start_run(run_id=run_id, run_name=run_name, tags=tags)

    def log_metrics(self, metrics, step):
        self._mlflow.log_metrics(metrics, step=step)

    def log_hyperparams(self, params):
        self._mlflow.log_params({k: str(v)[:250] for k, v in params.items()})

    def log_artifacts(self, path):
        self._mlflow.log_artifacts(path)

    def log_image(self, name, path, step):
        # artifact path keyed by metric name + step (mlflow has no native
        # stepped-image channel)
        self._mlflow.log_artifact(path, artifact_path=f"figures/{name}")

    def finish(self):
        self._mlflow.end_run()

    @property
    def run_id(self):
        return self.run.info.run_id


class LoggerCollection(BaseLogger):
    def __init__(self, loggers: List[BaseLogger]):
        self.loggers = loggers

    def log_metrics(self, metrics, step):
        metrics = {k: float(v) for k, v in metrics.items()}
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_hyperparams(self, params):
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def log_artifacts(self, path):
        for lg in self.loggers:
            lg.log_artifacts(path)

    def log_image(self, name, path, step):
        for lg in self.loggers:
            lg.log_image(name, path, step)

    def finish(self):
        for lg in self.loggers:
            lg.finish()

    @property
    def run_ids(self) -> Dict[str, str]:
        return {lg.name: lg.run_id for lg in self.loggers if lg.run_id}


def create_logger(cfg: Optional[Dict], out_dir: str = ".", resume: bool = False):
    """Build the logger stack from a `logging:` config section.

    Persists run ids to <out_dir>/run_id.yaml; on resume, re-attaches to the
    recorded runs (reference lib/logging/__init__.py:52-72).

    Rank-zero only: non-zero processes get an empty (no-op) collection — no
    duplicate W&B/MLflow runs, no racing writes to metrics.jsonl or
    run_id.yaml (the metric VALUES are identical on every process anyway:
    they are pmean'd/psum'd inside the sharded steps).
    """
    import yaml

    if not rank_zero():
        return LoggerCollection([])

    run_id_path = osp.join(out_dir, "run_id.yaml")
    saved_ids: Dict[str, str] = {}
    if resume and osp.exists(run_id_path):
        with open(run_id_path) as f:
            saved_ids = yaml.safe_load(f) or {}

    loggers: List[BaseLogger] = [
        StdoutLogger(),
        JsonlLogger(osp.join(out_dir, "metrics.jsonl")),
    ]
    cfg = cfg or {}
    if "wandb" in cfg:
        try:
            w = cfg["wandb"]
            loggers.append(
                WandbLogger(
                    project=w.get("project", "mm2d3d_tpu"),
                    run_name=w.get("run_name", "run"),
                    tags=w.get("tags"),
                    run_id=saved_ids.get("wandb"),
                )
            )
        except Exception as e:  # missing package / no credentials
            print(f"wandb logging disabled: {e}", file=sys.stderr)
    if "mlflow" in cfg:
        try:
            m = cfg["mlflow"]
            loggers.append(
                MLflowLogger(
                    experiment_name=m.get("experiment_name", "mm2d3d_tpu"),
                    run_name=m.get("run_name", "run"),
                    tags=m.get("tags"),
                    tracking_uri=m.get("tracking_uri"),
                    run_id=saved_ids.get("mlflow"),
                )
            )
        except Exception as e:
            print(f"mlflow logging disabled: {e}", file=sys.stderr)

    collection = LoggerCollection(loggers)
    ids = collection.run_ids
    if ids:
        with open(run_id_path, "w") as f:
            yaml.safe_dump(ids, f)
    return collection


def snapshot_code(out_dir: str, repo_root: str):
    """Code-snapshot artifact (reference run.py:184-196): copy the package
    source into the run dir for provenance.  Rank-zero only (the reference
    guards artifact logging the same way, lib/logging/__init__.py:114)."""
    if not rank_zero():
        return None
    dst = osp.join(out_dir, "code_snapshot")
    src = osp.join(repo_root, "mm2d3d_tpu")
    if osp.isdir(src):
        shutil.copytree(src, osp.join(dst, "mm2d3d_tpu"), dirs_exist_ok=True)
    return dst

"""Scalar metric logging: JSONL always, TensorBoard when available.

Replaces the reference's Lightning ``self.log``/``log_dict`` + TensorBoard
("testtube") logger (ref train.py:190-213; ~27 named losses per split,
contperceptual.py:323-349). Cross-rank metric reduction ("sync_dist") is
unnecessary here: metrics come out of the jitted step already globally
reduced over the data mesh axis.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict

import numpy as np


def _to_float(v: Any) -> float:
    try:
        return float(np.asarray(v))
    except Exception:  # noqa: BLE001
        return float("nan")


class MetricsLogger:
    """JSONL scalar logger (+ optional TensorBoard).

    Constructor accepts the reference TensorBoardLogger kwargs (name,
    save_dir) so aliased logger configs instantiate unchanged.
    """

    def __init__(self, save_dir: str = "logs", name: str = "metrics", **_: Any):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, f"{name}.jsonl")
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        try:  # optional TensorBoard backend
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir=os.path.join(save_dir, "tb"))
        except Exception:  # noqa: BLE001
            logging.debug("TensorBoard unavailable; JSONL only")

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        row = {"step": int(step), "time": time.time()}
        row.update({k: _to_float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in row.items():
                if k in ("step", "time"):
                    continue
                if np.isfinite(v):
                    self._tb.add_scalar(k, v, step)

    def log_image_grid(self, tag: str, grid_hw3: np.ndarray, step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, grid_hw3, step, dataformats="HWC")

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


class WandbLogger(MetricsLogger):
    """wandb backend behind the reference's logger surface (ref
    train.py:190-201: ``pytorch_lightning.loggers.WandbLogger`` with
    ``name``/``offline`` params).

    Uses the real ``wandb`` package when importable (``offline=True`` maps to
    ``mode="offline"`` exactly like Lightning's WandbLogger). When wandb is
    not installed (this image does not bundle it), falls back to writing the
    documented wandb run-directory layout — ``wandb/run-<name>/files/
    wandb-history.jsonl`` (one JSON row per log call, ``_step``/``_timestamp``
    keys) + ``config.yaml`` — so dashboards and ``wandb sync``-style tooling
    can ingest the run later. The JSONL+TensorBoard base logging is kept in
    both cases: metrics are never lost to a missing backend."""

    def __init__(
        self,
        save_dir: str = "logs",
        name: str = "run",
        offline: bool = False,
        project: str = "generative-detection",
        config: Dict[str, Any] | None = None,
        **kw: Any,
    ):
        super().__init__(save_dir=save_dir, name="metrics", **kw)
        self._wandb_run = None
        self._history = None
        try:
            import wandb  # type: ignore

            self._wandb_run = wandb.init(
                project=project,
                name=name,
                dir=save_dir,
                mode="offline" if offline else "online",
                config=config or {},
            )
        except Exception:  # noqa: BLE001 — wandb absent or init failed
            run_dir = os.path.join(save_dir, "wandb", f"run-{name}", "files")
            os.makedirs(run_dir, exist_ok=True)
            self._history = open(
                os.path.join(run_dir, "wandb-history.jsonl"), "a", buffering=1
            )
            if config:
                try:
                    import yaml

                    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
                        yaml.safe_dump(config, f)
                except Exception:  # noqa: BLE001
                    pass
            logging.info("wandb not installed; writing run files to %s", run_dir)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        super().log_metrics(metrics, step)
        row = {k: _to_float(v) for k, v in metrics.items()}
        if self._wandb_run is not None:
            self._wandb_run.log(row, step=int(step))
        elif self._history is not None:
            row["_step"] = int(step)
            row["_timestamp"] = time.time()
            self._history.write(json.dumps(row) + "\n")

    def close(self) -> None:
        if self._wandb_run is not None:
            self._wandb_run.finish()
        if self._history is not None:
            self._history.close()
        super().close()


def make_logger(lightning_config, logdir: str, nowname: str = "run"):
    """Config-selected logger (ref train.py get_logger_cfgs:190-213).

    Defaults to the "testtube" choice (TensorBoard-style ``MetricsLogger``)
    and deep-merges ``lightning.logger`` over it, so a config carrying the
    reference's ``pytorch_lightning.loggers.WandbLogger`` target (or our
    native dotted paths) selects the backend unchanged."""
    from ..config import instantiate_from_config
    from ..config.merge import deep_merge

    default_cfg = {
        "target": "generative_detection_tpu.train.metrics.MetricsLogger",
        "params": {},
    }
    user_cfg = {}
    if lightning_config:
        user_cfg = dict(lightning_config.get("logger", {}) or {})
    cfg = deep_merge(default_cfg, user_cfg)
    cfg.setdefault("params", {})
    cfg["params"].setdefault("save_dir", logdir)
    # `name` means different things per backend — the wandb RUN name (the
    # reference threads nowname there, train.py:194) vs the JSONL filename —
    # so default it per resolved target, never cross-pollute
    if "WandbLogger" in str(cfg.get("target", "")):
        cfg["params"].setdefault("name", nowname)
    else:
        cfg["params"].setdefault("name", "metrics")
    return instantiate_from_config(cfg)

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

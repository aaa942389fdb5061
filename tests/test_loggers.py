"""Config-selected logger backends (ref train.py:190-213: the reference's
``get_logger_cfgs`` offers wandb / testtube TensorBoard selection via the
``lightning.logger`` config subtree)."""

import json

import numpy as np

from generative_detection_tpu.train.metrics import (
    MetricsLogger,
    WandbLogger,
    make_logger,
)


def test_make_logger_default_is_jsonl_tb(tmp_path):
    """No lightning.logger config -> the testtube/TB-analog MetricsLogger
    writing into the run dir (the reference's default choice)."""
    logger = make_logger({}, str(tmp_path))
    assert type(logger) is MetricsLogger
    logger.log_metrics({"train/total_loss": 1.5}, 3)
    logger.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["train/total_loss"] == 1.5 and rows[0]["step"] == 3


def test_make_logger_selects_wandb_by_reference_target(tmp_path):
    """A config carrying the REFERENCE dotted path
    (pytorch_lightning.loggers.WandbLogger, ref train.py:194) selects the
    wandb backend unchanged, with the run name threaded through."""
    lightning_config = {
        "logger": {
            "target": "pytorch_lightning.loggers.WandbLogger",
            "params": {"offline": True},
        }
    }
    logger = make_logger(lightning_config, str(tmp_path), nowname="exp7")
    assert isinstance(logger, WandbLogger)
    logger.log_metrics({"train/aeloss": np.float32(2.25)}, 11)
    logger.close()

    # wandb is not packaged in this image -> the fallback writes the wandb
    # run-directory layout; the base JSONL stream is ALSO kept
    hist = tmp_path / "wandb" / "run-exp7" / "files" / "wandb-history.jsonl"
    assert hist.exists()
    row = json.loads(hist.read_text().splitlines()[0])
    assert row["train/aeloss"] == 2.25
    assert row["_step"] == 11 and "_timestamp" in row
    assert (tmp_path / "metrics.jsonl").exists()


def test_make_logger_testtube_alias(tmp_path):
    """The reference's legacy testtube target aliases onto the JSONL+TB
    logger (ref train.py:204-213)."""
    lightning_config = {
        "logger": {"target": "pytorch_lightning.loggers.TestTubeLogger"}
    }
    logger = make_logger(lightning_config, str(tmp_path))
    assert type(logger) is MetricsLogger
    logger.close()

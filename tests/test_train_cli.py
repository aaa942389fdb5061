"""train.py CLI: `lightning.trainer` config keys reach the Trainer.

The explicit kwargs in train.py's Trainer(...) call cover the reference's
own flags (ref train.py:300-340); every OTHER `lightning.trainer` key flows
through by name, so opt-in knobs this framework adds beyond the reference
(async_checkpointing, zero1_optimizer_sharding, fsdp_parameter_sharding,
limit_test_batches) are reachable from YAML / CLI dotlists without a
per-flag line in the driver.
"""

import sys

import pytest


class _Stop(Exception):
    pass


def test_trainer_cfg_passthrough(tmp_path, monkeypatch):
    import train as train_mod
    from generative_detection_tpu.train import loop as loop_mod

    recorded = {}

    class _Recorder:
        def __init__(self, *a, **kw):
            recorded.update(kw)
            raise _Stop

    monkeypatch.setattr(loop_mod, "Trainer", _Recorder)
    monkeypatch.setattr(
        sys, "argv",
        [
            "train.py", "-b", "configs/autoencoder/pose/tiny_cpu.yaml", "-t",
            "-l", str(tmp_path),
            # dotlist overrides, reference CLI style
            "lightning.trainer.fsdp_parameter_sharding=true",
            "lightning.trainer.async_checkpointing=true",
            "lightning.trainer.limit_test_batches=3",
        ],
    )
    with pytest.raises(_Stop):
        train_mod.main()

    # passthrough knobs arrive by name
    assert recorded["fsdp_parameter_sharding"] is True
    assert recorded["async_checkpointing"] is True
    assert recorded["limit_test_batches"] == 3
    # explicitly-mapped flags still arrive exactly once (no duplicate kwarg)
    assert "max_epochs" in recorded
    assert recorded["logdir"].startswith(str(tmp_path))

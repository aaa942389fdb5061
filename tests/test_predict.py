"""Trainer.predict — Lightning ``trainer.predict`` analogue.

The reference model defines no ``predict_step``, so the contract is
Lightning's default predict loop (one forward per ``predict_dataloader``
batch; ref model forward surface src/models/autoencoder.py:208-257):
per-batch output dicts, deterministic run-to-run, params-only state when
run standalone (no optimizer materialization).
"""

import copy

import jax
import numpy as np
import pytest

from generative_detection_tpu.config import instantiate_from_config, load_yaml
from generative_detection_tpu.train.loop import Trainer
from generative_detection_tpu.train.state import create_train_state


def _setup(config_path, **data_overrides):
    cfg = copy.deepcopy(load_yaml(config_path))
    # give the datamodule a predict split (same synthetic source as validation)
    cfg["data"]["params"]["predict"] = copy.deepcopy(
        cfg["data"]["params"]["validation"]
    )
    # enough items for >= 2 predict batches
    cfg["data"]["params"]["predict"]["params"]["length"] = (
        3 * cfg["data"]["params"]["batch_size"]
    )
    cfg["data"]["params"].update(data_overrides)
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()
    return model, data


@pytest.fixture(scope="module")
def pose_setup():
    return _setup("configs/autoencoder/pose/tiny_cpu.yaml")


def test_predict_pose_standalone(pose_setup, tmp_path):
    """Standalone predict: params-only init (state stays None — no optimizer
    states), per-batch dicts with dec_obj + dec_pose, reproducible."""
    model, data = pose_setup
    t = Trainer(model, logdir=str(tmp_path / "run"), step_counting="batch")
    outs = t.predict(data, limit_batches=2)
    assert t.state is None, "standalone predict must not build optimizer state"
    assert len(outs) == 2
    n = len(data.datasets["predict"])
    b = min(data.batch_size, n)
    for batch_out in outs:
        assert set(batch_out) == {"dec_obj", "dec_pose"}
        assert batch_out["dec_obj"].shape[0] == b
        assert batch_out["dec_obj"].shape[-1] == 3
        assert batch_out["dec_pose"].shape[0] == b
        assert np.isfinite(batch_out["dec_obj"]).all()
        assert np.isfinite(batch_out["dec_pose"]).all()
    # run-to-run determinism (fixed per-batch keys, posterior modes)
    outs2 = t.predict(data, limit_batches=2)
    for a, c in zip(outs, outs2):
        np.testing.assert_array_equal(a["dec_obj"], c["dec_obj"])
        np.testing.assert_array_equal(a["dec_pose"], c["dec_pose"])


def test_predict_uses_live_training_state(pose_setup, tmp_path):
    """With a live TrainState, predict reads its params/step, not a fresh
    init: perturbing the live params changes the predictions."""
    model, data = pose_setup
    t = Trainer(model, logdir=str(tmp_path / "run"), step_counting="batch")
    t._build_fns()
    with t.mesh:
        t.state = create_train_state(
            model, jax.random.PRNGKey(0), data.batch_size,
            t._opt_ae, t._opt_disc, mesh=t.mesh,
        )
    base = t.predict(data, limit_batches=1)
    t.state = t.state.replace(
        net_params=jax.tree_util.tree_map(lambda p: p + 0.05, t.state.net_params)
    )
    bumped = t.predict(data, limit_batches=1)
    assert not np.array_equal(base[0]["dec_obj"], bumped[0]["dec_obj"])


def test_predict_plain_family(tmp_path):
    model, data = _setup("configs/autoencoder/plain_kl_tiny.yaml")
    t = Trainer(model, logdir=str(tmp_path / "run"), step_counting="batch")
    outs = t.predict(data, limit_batches=1)
    assert len(outs) == 1
    assert set(outs[0]) == {"dec_obj"}
    assert np.isfinite(outs[0]["dec_obj"]).all()

"""Split-correct eval metrics + limit_val_batches semantics.

Round-3 verdict weak-spots #2/#3: ``trainer.test()`` must log ``test/*``
keys (never ``val/*`` — the checkpoint monitor reads ``val/rec_loss``), a
test pass must never call ``save_best``, and ``limit_val_batches=0`` means
SKIP validation (Lightning semantics of the reference-named knob), not
"unlimited".
"""

import copy

import jax
import numpy as np
import pytest

from generative_detection_tpu.config import instantiate_from_config, load_yaml
from generative_detection_tpu.train.checkpoint import CheckpointManager
from generative_detection_tpu.train.loop import Trainer
from generative_detection_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    cfg = copy.deepcopy(cfg)
    # give the datamodule a test split (same synthetic source as validation)
    cfg["data"]["params"]["test"] = copy.deepcopy(cfg["data"]["params"]["validation"])
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()
    return model, data


def _trainer_with_state(model, data, tmp_path, limit_val_batches=1, **kw):
    t = Trainer(
        model, logdir=str(tmp_path / "run"), limit_val_batches=limit_val_batches,
        step_counting="batch", **kw,
    )
    t._build_fns()
    with t.mesh:
        t.state = create_train_state(
            model, jax.random.PRNGKey(0), data.batch_size,
            t._opt_ae, t._opt_disc, mesh=t.mesh,
        )
    return t


def test_test_split_keys_and_no_best_overwrite(setup, tmp_path):
    model, data = setup
    t = _trainer_with_state(model, data, tmp_path)
    t._ckpt_mgr = CheckpointManager(t.ckptdir, monitor=t.monitor)
    best_calls = []
    t._ckpt_mgr.save_best = lambda *a, **k: best_calls.append(a)

    res_test = t.test(data)
    assert res_test, "test() returned no metrics"
    assert all(k.startswith("test/") for k in res_test), sorted(res_test)
    assert "test/rec_loss" in res_test
    assert not best_calls, "test() must never feed the best-checkpoint monitor"

    res_val = t.validate(data)
    assert "val/rec_loss" in res_val
    assert best_calls, "val pass with the monitor present must save_best"
    # the two splits computed the same quantities under different labels
    assert {k.split("/", 1)[1] for k in res_test} == {
        k.split("/", 1)[1] for k in res_val
    }
    t._ckpt_mgr.close()


def test_limit_val_batches_zero_skips(setup, tmp_path):
    model, data = setup
    t = Trainer(
        model, logdir=str(tmp_path / "run0"), limit_val_batches=0,
        step_counting="batch",
    )
    assert t.validate(data) == {}
    assert not t._eval_fns  # never even built an eval step


def test_limit_val_zero_does_not_skip_test(setup, tmp_path):
    """Lightning scopes the limits per loop: limit_val_batches=0 disables the
    VAL loop only — trainer.test() must still run (capped by
    limit_test_batches)."""
    model, data = setup
    t = _trainer_with_state(
        model, data, tmp_path, limit_val_batches=0, limit_test_batches=1
    )
    res = t.test(data)
    assert res and all(k.startswith("test/") for k in res)
    # and limit_test_batches=0 skips the test loop
    t2 = _trainer_with_state(model, data, tmp_path, limit_test_batches=0)
    assert t2.test(data) == {}


def test_fractional_limit_val_batches_rejected(setup, tmp_path):
    model, _ = setup
    with pytest.raises(ValueError, match="fractional"):
        Trainer(model, logdir=str(tmp_path / "runf"), limit_val_batches=0.5)

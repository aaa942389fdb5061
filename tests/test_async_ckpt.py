"""Async checkpointing: orbax saves overlap training (opt-in).

``async_checkpointing: true`` makes save_last/save_best return after the
synchronous device->host snapshot, writing to disk on a background thread —
the step never stalls on disk. Restore/close/signal paths drain in-flight
saves, so resume semantics are identical to the synchronous path.
"""

import jax
import numpy as np

from generative_detection_tpu.config import instantiate_from_config, load_yaml
from generative_detection_tpu.train.loop import Trainer


def test_async_checkpointing_roundtrip(tmp_path):
    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()

    logdir = str(tmp_path / "run")
    t1 = Trainer(
        model, logdir=logdir, max_epochs=1, max_steps=2,
        limit_val_batches=1, step_counting="batch", async_checkpointing=True,
    )
    t1.fit(data)
    assert t1._ckpt_mgr.async_checkpointing
    w_end = jax.tree.map(np.asarray, t1.state.net_params)

    # the async save must have finalized (fit closes/drains on exit) and
    # restore must return exactly the end-of-run params
    from generative_detection_tpu.train.checkpoint import CheckpointManager
    from generative_detection_tpu.train.state import create_train_state, make_optimizers

    model2 = instantiate_from_config(cfg["model"])
    model2.learning_rate = 1e-4
    opt_ae, opt_disc = make_optimizers(1e-4)
    template = create_train_state(
        model2, jax.random.PRNGKey(0), data.batch_size, opt_ae, opt_disc
    )
    mgr = CheckpointManager(f"{logdir}/checkpoints", monitor=model2.monitor)
    restored = mgr.restore(template)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(w_end), jax.tree.leaves(restored.net_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_signal_save_drains_async_queue(tmp_path):
    """save_last_checkpoint (the SIGUSR1/SIGTERM/exception hook) must block
    until the async write lands — the process may exit right after."""
    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()

    from generative_detection_tpu.train.checkpoint import CheckpointManager
    from generative_detection_tpu.train.state import create_train_state

    t = Trainer(
        model, logdir=str(tmp_path / "run2"), step_counting="batch",
        async_checkpointing=True,
    )
    t._build_fns()
    with t.mesh:
        t.state = create_train_state(
            model, jax.random.PRNGKey(0), data.batch_size, t._opt_ae, t._opt_disc,
            mesh=t.mesh,
        )
    t._ckpt_mgr = CheckpointManager(
        t.ckptdir, monitor=t.monitor, async_checkpointing=True
    )
    t.save_last_checkpoint()
    # after the (blocking) hook returns the step is already restorable
    assert t._ckpt_mgr.latest_step() == 0
    t._ckpt_mgr.close()

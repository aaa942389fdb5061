"""Resume semantics: trainer continues from the last checkpoint."""

import jax
import numpy as np

from generative_detection_tpu.config import instantiate_from_config, load_yaml
from generative_detection_tpu.train.loop import Trainer


def test_trainer_resume_continues_step_counter(tmp_path):
    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()

    logdir = str(tmp_path / "run")
    t1 = Trainer(model, logdir=logdir, max_epochs=1, max_steps=2,
                 limit_val_batches=1, step_counting="batch")
    t1.fit(data)
    assert t1.global_batch() == 2
    w1 = np.asarray(jax.tree.leaves(t1.state.net_params)[0])

    # fresh trainer resuming from the run dir's checkpoints (CLI -r semantics)
    model2 = instantiate_from_config(cfg["model"])
    model2.learning_rate = 1e-4
    t2 = Trainer(
        model2, logdir=logdir, max_epochs=2, max_steps=4, limit_val_batches=1,
        step_counting="batch",
        resume_from_checkpoint=str(tmp_path / "run" / "checkpoints"),
    )
    t2.fit(data)
    assert t2.global_batch() == 4
    # resumed params differ from the first run's end only by further training
    w2 = np.asarray(jax.tree.leaves(t2.state.net_params)[0])
    assert w1.shape == w2.shape


def test_every_n_train_steps_checkpoint_stream(tmp_path):
    """CheckpointCallback.every_n_train_steps produces the keep-all
    trainstep_checkpoints stream (ref train.py:309-325)."""
    import os

    from generative_detection_tpu.config import load_yaml, instantiate_from_config
    from generative_detection_tpu.train.callbacks import CheckpointCallback
    from generative_detection_tpu.train.loop import Trainer

    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()

    logdir = str(tmp_path / "run")
    t = Trainer(
        model,
        logdir=logdir,
        max_epochs=3,
        max_steps=4,
        limit_val_batches=1,
        callbacks=[CheckpointCallback(every_n_train_steps=2)],
        step_counting="batch",
    )
    assert t.every_n_train_steps == 2
    t.fit(data)
    stream = os.path.join(logdir, "checkpoints", "trainstep_checkpoints")
    assert os.path.isdir(stream)
    steps = sorted(int(d) for d in os.listdir(stream) if d.isdigit())
    assert steps == [2, 4], steps


def test_every_n_train_steps_counts_optimizer_steps(tmp_path):
    """Under accumulate_grad_batches=k the stream fires per OPTIMIZER step
    (Lightning global_step), not per micro-batch, and labels dirs with the
    optimizer step — consistent with the curriculum clock."""
    import os

    from generative_detection_tpu.config import load_yaml, instantiate_from_config
    from generative_detection_tpu.train.callbacks import CheckpointCallback
    from generative_detection_tpu.train.loop import Trainer

    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()

    logdir = str(tmp_path / "run")
    t = Trainer(
        model,
        logdir=logdir,
        max_epochs=5,
        max_steps=8,  # micro-batches -> 4 optimizer steps
        limit_val_batches=1,
        accumulate_grad_batches=2,
        callbacks=[CheckpointCallback(every_n_train_steps=2)],
        step_counting="batch",
    )
    t.fit(data)
    stream = os.path.join(logdir, "checkpoints", "trainstep_checkpoints")
    assert os.path.isdir(stream)
    steps = sorted(int(d) for d in os.listdir(stream) if d.isdigit())
    assert steps == [2, 4], steps  # opt steps, saved once each


def test_restore_params_partial(tmp_path):
    """Params-only restore (orbax partial restore): net params + step load
    exactly, WITHOUT materializing optimizer states (eval.py's path)."""
    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()

    logdir = str(tmp_path / "run")
    t = Trainer(model, logdir=logdir, max_epochs=1, max_steps=2,
                limit_val_batches=1, step_counting="batch")
    t.fit(data)

    from generative_detection_tpu.train.checkpoint import CheckpointManager

    # abstract template from eval_shape — zero allocation
    abstract_net, abstract_loss = jax.eval_shape(
        lambda r: model.init_variables(r, batch_size=data.batch_size),
        jax.random.PRNGKey(0),
    )
    mgr = CheckpointManager(logdir + "/checkpoints", monitor="val/rec_loss")
    out = mgr.restore_params(abstract_net, loss_template=abstract_loss)
    assert set(out) == {"net_params", "loss_params", "step"}
    assert int(out["step"]) == t.global_batch()
    a = jax.tree.leaves(t.state.net_params)[0]
    b = jax.tree.leaves(out["net_params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # discriminator params came along via the loss template
    d1 = jax.tree.leaves(t.state.loss_params["discriminator"])[0]
    d2 = jax.tree.leaves(out["loss_params"]["discriminator"])[0]
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    mgr.close()

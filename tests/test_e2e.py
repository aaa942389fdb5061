"""End-to-end: config -> model -> datamodule -> Trainer.fit -> checkpoint."""

import json
import os

import jax
import numpy as np
import pytest

from generative_detection_tpu.config import load_yaml, instantiate_from_config


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    return cfg


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_fresh_subprocess():
    """Invoke the entry EXACTLY as the driver does: fresh interpreter, no
    conftest platform switch, no XLA_FLAGS — the entry must self-provision
    the virtual CPU mesh (round-1 driver failure mode)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"  # keep CI off the (possibly absent) TPU
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=root,
        env=env,
        capture_output=True,
        text=True,
        timeout=580,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_trainer_fit_tiny(tiny_cfg, tmp_path):
    from generative_detection_tpu.train.callbacks import ImageLogger, SetupCallback
    from generative_detection_tpu.train.loop import Trainer
    from generative_detection_tpu.train.metrics import MetricsLogger

    model = instantiate_from_config(tiny_cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(tiny_cfg["data"])
    data.setup()

    logdir = str(tmp_path / "run")
    logger = MetricsLogger(save_dir=logdir)
    trainer = Trainer(
        model,
        logdir=logdir,
        max_epochs=2,
        max_steps=4,
        limit_val_batches=1,
        callbacks=[
            SetupCallback(logdir=logdir, config=tiny_cfg),
            ImageLogger(batch_frequency=2, max_images=2),
        ],
        logger=logger,
        log_every_n_steps=1,
        step_counting="batch",
    )
    trainer.fit(data)
    assert trainer.global_batch() >= 4

    # metrics JSONL written with finite aeloss
    rows = [json.loads(l) for l in open(logger.path)]
    assert any("aeloss" in r and np.isfinite(r["aeloss"]) for r in rows)
    # val metrics logged (monitor present)
    assert any("val/rec_loss" in r for r in rows)
    # checkpoints exist (last + best)
    assert os.path.isdir(os.path.join(logdir, "checkpoints", "last"))
    # config snapshot
    assert any(f.endswith("project.yaml") for f in os.listdir(os.path.join(logdir, "configs")))
    # images written
    img_root = os.path.join(logdir, "images", "train")
    assert os.path.isdir(img_root) and len(os.listdir(img_root)) > 0
    logger.close()

    # resume restores the step counter
    from generative_detection_tpu.train import create_train_state, make_optimizers
    from generative_detection_tpu.train.checkpoint import CheckpointManager

    opt_ae, opt_disc = make_optimizers(1e-4)
    template = create_train_state(model, jax.random.PRNGKey(0), data.batch_size, opt_ae, opt_disc)
    mgr = CheckpointManager(os.path.join(logdir, "checkpoints"), monitor="val/rec_loss")
    restored = mgr.restore(template)
    assert int(restored.step) == trainer.global_batch()
    # params roundtrip exactly
    a = jax.tree.leaves(trainer.state.net_params)[0]
    b = jax.tree.leaves(restored.net_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_synthetic_dataset_contract():
    from generative_detection_tpu.data.synthetic import SyntheticPatchTrain

    ds = SyntheticPatchTrain(length=8, patch_height=32)
    item = ds[0]
    assert item["patch"].shape == (32, 32, 3)
    assert item["pose_6d"].shape == (4,)
    assert item["bbox_sizes"].shape == (3,)
    assert item["mask_2d_bbox"].shape == (32, 32, 1)
    assert 0 <= item["class_id"] <= 10
    # deterministic
    item2 = SyntheticPatchTrain(length=8, patch_height=32)[0]
    np.testing.assert_array_equal(item["patch"], item2["patch"])


def test_datamodule_loader_batching(tiny_cfg):
    data = instantiate_from_config(tiny_cfg["data"])
    data.setup()
    batch = next(iter(data.train_dataloader()))
    assert batch["patch"].shape == (8, 32, 32, 3)
    assert batch["class_id"].shape == (8,)
    assert isinstance(batch["class_name"], list)

"""Config-driven torch-checkpoint loading (``ckpt_path``).

The reference constructor loads a torch checkpoint when ``ckpt_path`` is set
(ref src/models/autoencoder.py:97-98 -> ldm ``init_from_ckpt(path,
ignore_keys)`` with strict=False overlay semantics). These tests spec-build a
torch ``PoseAutoencoder`` state_dict (same construction as
test_torch_parity), save it, point a config's ``model.params.ckpt_path`` at
it, and assert that every state-building entrypoint consumes it:

- the wrapper overlay itself (unit, incl. ``ignore_keys`` prefix skipping);
- ``Trainer.fit`` (the round-3 verdict's silent no-op: ``ckpt_path`` was
  stored but never called).
"""

import copy
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from generative_detection_tpu.config import instantiate_from_config, load_yaml  # noqa: E402

import test_torch_parity as tp  # noqa: E402  (spec-built torch modules)


def _build_state_dict(dd, embed_dim=16, num_classes=11, seed=0):
    """Spec-build the full torch PoseAutoencoder state_dict for ``dd``."""
    torch.manual_seed(seed)
    enc = tp.TEncoder(dd)
    dec = tp.TDecoder(dd)
    enc_out = 2 * dd["z_channels"] if dd["double_z"] else dd["z_channels"]
    quant_obj = tnn.Conv2d(enc_out, 2 * embed_dim, 1)
    quant_pose = tnn.Conv2d(enc_out, embed_dim, 1)
    post_quant = tnn.Conv2d(embed_dim, dd["z_channels"], 1)
    inf_dim = 2 * 8 + num_classes
    pd = tnn.Sequential(
        tnn.Linear(4096, 500), tnn.Tanh(), tnn.Linear(500, 500), tnn.Tanh(),
        tnn.Linear(500, inf_dim),
    )
    pe_coord = tnn.Linear(512, 1024)
    pe_latent = tnn.Linear(8 + num_classes, 4, bias=False)
    pe_mlp1 = tnn.Linear(1024, 500)
    pe_mlp2 = tnn.Linear(500, 4096)

    sd = {}
    for prefix, mod in [
        ("encoder", enc), ("decoder", dec), ("quant_conv_obj", quant_obj),
        ("quant_conv_pose", quant_pose), ("post_quant_conv", post_quant),
    ]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    for i, l in enumerate(pd):
        if isinstance(l, tnn.Linear):
            for p, v in l.state_dict().items():
                sd[f"pose_decoder.layers.{i}.{p}"] = v.detach().numpy()
    for name, mod in [("coord_linear", pe_coord), ("latent_linear", pe_latent),
                      ("layers.1", pe_mlp1), ("layers.3", pe_mlp2)]:
        for p, v in mod.state_dict().items():
            sd[f"pose_encoder.{name}.{p}"] = v.detach().numpy()
    sd["loss.logvar"] = np.asarray(0.125, np.float32)
    return sd


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    dd = dict(cfg["model"]["params"]["ddconfig"])
    sd = _build_state_dict(dd)
    path = str(tmp_path_factory.mktemp("ckpt") / "odvae.ckpt")
    torch.save({"state_dict": sd}, path)
    return cfg, sd, path


def test_wrapper_overlay_and_ignore_keys(ckpt):
    cfg, sd, path = ckpt
    cfg = copy.deepcopy(cfg)
    cfg["model"]["params"]["ckpt_path"] = path
    cfg["model"]["params"]["ignore_keys"] = ["pose_encoder"]
    model = instantiate_from_config(cfg["model"])
    net0, loss0 = model.init_variables(jax.random.PRNGKey(0), batch_size=2)
    net, loss = model.maybe_init_from_ckpt(net0, loss0)

    want = np.transpose(sd["encoder.conv_in.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(np.asarray(net["encoder"]["conv_in"]["kernel"]), want)
    want_pd = np.transpose(sd["pose_decoder.layers.0.weight"], (1, 0))
    np.testing.assert_array_equal(np.asarray(net["pose_decoder"]["fc_in"]["kernel"]), want_pd)
    # ignore_keys prefix skipped: pose_encoder stays at its random init
    got_pe = np.asarray(net["pose_encoder"]["coord_linear"]["kernel"])
    np.testing.assert_array_equal(got_pe, np.asarray(net0["pose_encoder"]["coord_linear"]["kernel"]))
    assert not np.allclose(got_pe, np.transpose(sd["pose_encoder.coord_linear.weight"], (1, 0)))
    # loss overlay: learned logvar
    np.testing.assert_allclose(np.asarray(loss["logvar"]), 0.125)


def test_trainer_fit_consumes_ckpt_path(ckpt, tmp_path):
    from generative_detection_tpu.train.loop import Trainer

    cfg, sd, path = ckpt
    cfg = copy.deepcopy(cfg)
    cfg["model"]["params"]["ckpt_path"] = path
    cfg["model"]["params"]["ignore_keys"] = ["pose_encoder"]
    model = instantiate_from_config(cfg["model"])
    # lr=0 -> Adam updates are exactly zero, so post-fit params must equal
    # the checkpoint conversion if (and only if) fit applied the overlay
    model.learning_rate = 0.0
    data = instantiate_from_config(cfg["data"])
    data.setup()

    trainer = Trainer(
        model, logdir=str(tmp_path / "run"), max_epochs=1, max_steps=1,
        limit_val_batches=1, step_counting="batch",
    )
    trainer.fit(data)

    got = np.asarray(trainer.state.net_params["encoder"]["conv_in"]["kernel"])
    want = np.transpose(sd["encoder.conv_in.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # ignored prefix did NOT load
    got_pe = np.asarray(trainer.state.net_params["pose_encoder"]["coord_linear"]["kernel"])
    assert not np.allclose(got_pe, np.transpose(sd["pose_encoder.coord_linear.weight"], (1, 0)))
    np.testing.assert_allclose(np.asarray(trainer.state.loss_params["logvar"]), 0.125)


def test_reference_yaml_ckpt_path_contract(ckpt):
    """A reference-style YAML with ``ckpt_path`` set behaves like the
    reference: params after construction+init match the torch weights."""
    cfg, sd, path = ckpt
    cfg = copy.deepcopy(cfg)
    cfg["model"]["params"]["ckpt_path"] = path
    model = instantiate_from_config(cfg["model"])
    assert model.ckpt_path == path
    net0, loss0 = model.init_variables(jax.random.PRNGKey(1), batch_size=2)
    net, _ = model.maybe_init_from_ckpt(net0, loss0)
    # no ignore_keys: every converted subtree loads, incl. pose_encoder
    np.testing.assert_array_equal(
        np.asarray(net["pose_encoder"]["coord_linear"]["kernel"]),
        np.transpose(sd["pose_encoder.coord_linear.weight"], (1, 0)),
    )

"""Reverse checkpoint interop: flax params -> torch state_dict.

Closes the interop loop with the forward converter (which is itself
torch-parity-tested): ``export_* -> convert_* -> overlay_params`` must
reproduce the original flax trees bit-exactly, and ``save_torch_checkpoint``
must write a file the reference-style ``init_from_ckpt`` path
(``load_torch_state_dict`` + ``ckpt_path``) reads back.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.config import instantiate_from_config, load_yaml
from generative_detection_tpu.utils.torch_compat import (
    convert_plain_autoencoder,
    convert_pose_autoencoder,
    export_plain_autoencoder,
    export_pose_autoencoder,
    load_torch_state_dict,
    overlay_params,
    save_torch_checkpoint,
)


def _model(config_path):
    cfg = copy.deepcopy(load_yaml(config_path))
    return instantiate_from_config(cfg["model"])


def _assert_trees_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_trees_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}"
            )


@pytest.fixture(scope="module")
def pose_params():
    model = _model("configs/autoencoder/pose/tiny_cpu.yaml")
    net0, loss0 = model.init_variables(jax.random.PRNGKey(0), batch_size=1)
    net1, loss1 = model.init_variables(jax.random.PRNGKey(1), batch_size=1)
    return model, (net0, loss0), (net1, loss1)


def test_pose_roundtrip_bit_exact(pose_params):
    model, (net0, loss0), (net1, loss1) = pose_params
    sd = export_pose_autoencoder(net0, loss0)
    net_overlay, loss_overlay = convert_pose_autoencoder(sd, model.ddconfig)
    back = overlay_params(net1, net_overlay)
    _assert_trees_equal(net0, back)  # every net param covered + bit-exact
    # loss side: logvar + full discriminator round-trip
    assert np.asarray(loss_overlay["logvar"]) == np.asarray(loss0["logvar"])
    back_disc = overlay_params(loss1["discriminator"], loss_overlay["discriminator"])
    _assert_trees_equal(loss0["discriminator"], back_disc)


def test_exported_bn_buffers(pose_params):
    _, (net0, loss0), _ = pose_params
    sd = export_pose_autoencoder(net0, loss0)
    for name in ("3", "6", "9"):
        key = f"loss.discriminator.main.{name}"
        c = sd[f"{key}.weight"].shape[0]
        np.testing.assert_array_equal(sd[f"{key}.running_mean"], np.zeros(c))
        np.testing.assert_array_equal(sd[f"{key}.running_var"], np.ones(c))
        assert int(sd[f"{key}.num_batches_tracked"]) == 0


def test_plain_roundtrip_bit_exact():
    model = _model("configs/autoencoder/plain_kl_tiny.yaml")
    net0, loss0 = model.init_variables(jax.random.PRNGKey(0), batch_size=1)
    net1, _ = model.init_variables(jax.random.PRNGKey(1), batch_size=1)
    sd = export_plain_autoencoder(net0, loss0)
    net_overlay, _ = convert_plain_autoencoder(sd, model.ddconfig)
    _assert_trees_equal(net0, overlay_params(net1, net_overlay))


def test_save_and_reload_via_ckpt_path(pose_params, tmp_path):
    """The exported file feeds the same config-driven ``ckpt_path`` loading
    the reference uses (ref src/models/autoencoder.py:97-98)."""
    model, (net0, loss0), (net1, loss1) = pose_params
    path = str(tmp_path / "exported.ckpt")
    save_torch_checkpoint(path, export_pose_autoencoder(net0, loss0), global_step=7)
    sd = load_torch_state_dict(path)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    net_b, loss_b = model.init_from_ckpt(net1, loss1, path)
    _assert_trees_equal(net0, net_b)
    assert jnp.asarray(loss_b["logvar"]) == jnp.asarray(loss0["logvar"])

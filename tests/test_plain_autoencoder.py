import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.models.autoencoder import Autoencoder
from generative_detection_tpu.train import (
    create_train_state,
    make_optimizers,
    make_plain_train_step,
)

SMALL_DD = {
    "double_z": True,
    "z_channels": 16,
    "resolution": 32,
    "in_channels": 3,
    "out_ch": 3,
    "ch": 32,
    "ch_mult": [1, 2],
    "num_res_blocks": 1,
    "attn_resolutions": [16],
    "dropout": 0.0,
}

LOSSCFG = {
    "target": "generative_detection_tpu.losses.contperceptual.LPIPSWithDiscriminator",
    "params": {"disc_start": 2, "kl_weight": 1e-6, "disc_weight": 0.5},
}


@pytest.fixture(scope="module")
def setup():
    m = Autoencoder(ddconfig=SMALL_DD, lossconfig=LOSSCFG, embed_dim=16)
    m.learning_rate = 1e-4
    opt_ae, opt_disc = make_optimizers(m.learning_rate)
    state = create_train_state(m, jax.random.PRNGKey(0), 2, opt_ae, opt_disc)
    fn = jax.jit(make_plain_train_step(m, opt_ae, opt_disc, step_counting="batch"))
    return m, state, fn


def test_plain_autoencoder_forward(setup, key, rng):
    m, state, _ = setup
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    outs = m.net.apply({"params": state.net_params}, x, rngs={"sample": key})
    assert outs["dec_obj"].shape == (2, 32, 32, 3)
    assert outs["posterior_obj"].mean.shape == (2, 16, 16, 16)


def test_plain_train_step(setup, rng):
    m, state, fn = setup
    batch = {"image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))}
    new_state, metrics = fn(state, batch)
    assert np.isfinite(float(metrics["aeloss"]))
    assert np.isfinite(float(metrics["discloss"]))
    assert "train/kl_loss" in metrics
    # past disc_start the adaptive weight kicks in
    state10 = state.replace(step=jnp.asarray(10, jnp.int32))
    _, m10 = fn(state10, batch)
    assert float(m10["train/d_weight"]) > 0.0

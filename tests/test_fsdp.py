"""FSDP / ZeRO-3 full parameter sharding over the data mesh axis.

``create_train_state(..., fsdp=True)`` partitions the parameters themselves
(net, loss — including the frozen perceptual weights) in addition to both
Adam states, each leaf on its largest mesh-divisible axis. ALL per-parameter
memory then divides by the mesh size; XLA's sharding propagation inserts
just-in-time all-gathers at each weight's use site (the GSPMD formulation
of FSDP — annotate shardings, let XLA place collectives). The update math
is unchanged; as with ZeRO-1, only reduction order differs by layout.
"""

import jax
import numpy as np

from generative_detection_tpu.parallel import create_mesh, shard_batch
from generative_detection_tpu.train.state import create_train_state, make_optimizers
from generative_detection_tpu.train.steps import make_train_step

from tests.test_models import small_model
from tests.test_train_step import _batch
from tests.test_zero1 import _sharded_leaf_count


def test_fsdp_state_sharded_and_step_equivalent():
    rng = np.random.default_rng(0)
    m = small_model()
    m.learning_rate = 1e-4
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    opt_ae, opt_disc = make_optimizers(1e-4)

    s_repl = create_train_state(
        m, jax.random.PRNGKey(0), 8, opt_ae, opt_disc, mesh=mesh
    )
    s_fsdp = create_train_state(
        m, jax.random.PRNGKey(0), 8, opt_ae, opt_disc, mesh=mesh, fsdp=True
    )
    # params AND moments actually sharded (leaves with no divisible axis
    # stay replicated — scalars, tiny vectors)
    assert _sharded_leaf_count(s_fsdp.net_params) > 0
    assert _sharded_leaf_count(s_fsdp.loss_params) > 0
    assert _sharded_leaf_count(s_fsdp.opt_ae_state) > 0
    assert _sharded_leaf_count(s_repl.net_params) == 0

    # --- the real "FSDP doesn't change the math" pin: forward + gradients
    # agree between layouts to reduction-order noise. (One-step PARAM
    # equivalence is NOT a valid pin here, unlike ZeRO-1: FSDP re-partitions
    # the forward/backward matmuls, so grads drift ~1e-9, and Adam's
    # first-step update lr*g/(|g|+eps) is sign-like — on near-zero-grad
    # coordinates that drift flips a full +-lr update.)
    import jax.numpy as jnp

    batch = shard_batch(_batch(m, rng, bs=8), mesh)
    x = batch["rgb_gt"]  # prepared-batch image key
    rngs = {
        "sample": jax.random.PRNGKey(7),
        "dropout": jax.random.PRNGKey(8),
        "noise": jax.random.PRNGKey(9),
    }

    def readout(params, x):
        outs = m.net.apply(
            {"params": params}, x, jnp.asarray(40000, jnp.int32), rngs=rngs
        )
        return jnp.mean(outs["dec_obj"] ** 2) + jnp.mean(outs["dec_pose"] ** 2)

    vg = jax.jit(jax.value_and_grad(readout))
    v_repl, g_repl = vg(s_repl.net_params, x)
    v_fsdp, g_fsdp = vg(s_fsdp.net_params, x)
    np.testing.assert_allclose(float(v_repl), float(v_fsdp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_repl), jax.tree.leaves(g_fsdp)):
        a, b = np.asarray(a), np.asarray(b)
        # atol floors at 1e-8: leaves with no real influence on the readout
        # carry pure reduction-noise grads (~1e-10) either way
        atol = max(1e-6 * np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=atol)

    # --- one full train step on both layouts
    step = make_train_step(m, opt_ae, opt_disc, step_counting="batch")
    step_fn = jax.jit(step)
    # pin the output layout to the FSDP state (Trainer._build_fns does the
    # same) so updated params exit the step in the sharded param layout
    fsdp_shardings = jax.tree.map(lambda x: x.sharding, s_fsdp)
    fsdp_fn = jax.jit(step, out_shardings=(fsdp_shardings, None))
    s_repl, m_repl = step_fn(s_repl, batch)
    s_fsdp, m_fsdp = fsdp_fn(s_fsdp, batch)
    # layout contract: params stay in the FSDP sharding after the step
    assert _sharded_leaf_count(s_fsdp.net_params) > 0
    # losses computed on identical pre-step params agree tightly; params
    # agree to the Adam sign-amplification bound: |update| <= lr per
    # coordinate, so layouts can differ by at most 2*lr anywhere
    np.testing.assert_allclose(
        float(m_repl["aeloss"]), float(m_fsdp["aeloss"]), rtol=1e-5
    )
    lr = 1e-4
    for a, b in zip(
        jax.tree.leaves(s_repl.net_params), jax.tree.leaves(s_fsdp.net_params)
    ):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() <= 2.05 * lr, d.max()
    # a second step still runs and preserves the layout
    s_fsdp, m_fsdp = fsdp_fn(s_fsdp, batch)
    assert np.isfinite(float(m_fsdp["aeloss"]))
    assert _sharded_leaf_count(s_fsdp.net_params) > 0
    assert _sharded_leaf_count(s_fsdp.opt_ae_state) > 0


def test_fsdp_trainer_fit(tmp_path):
    """Trainer(fsdp_parameter_sharding=True) trains end-to-end; params and
    moments come out sharded, validation runs on the sharded state, and
    image logging all-gathers the channel-sharded params first."""
    from generative_detection_tpu.config import instantiate_from_config, load_yaml
    from generative_detection_tpu.train.callbacks import ImageLogger
    from generative_detection_tpu.train.loop import Trainer

    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-4
    data = instantiate_from_config(cfg["data"])
    data.setup()
    t = Trainer(
        model, logdir=str(tmp_path / "run"), max_epochs=1, max_steps=2,
        limit_val_batches=1, step_counting="batch",
        fsdp_parameter_sharding=True,
        callbacks=[ImageLogger(batch_frequency=1, max_images=2)],
    )
    t.fit(data)
    assert t.global_batch() == 2
    assert _sharded_leaf_count(t.state.net_params) > 0
    assert _sharded_leaf_count(t.state.opt_ae_state) > 0


def test_fsdp_checkpoint_roundtrip(tmp_path):
    from generative_detection_tpu.train.checkpoint import CheckpointManager

    m = small_model()
    m.learning_rate = 1e-4
    mesh = create_mesh()
    opt_ae, opt_disc = make_optimizers(1e-4)
    state = create_train_state(
        m, jax.random.PRNGKey(1), 8, opt_ae, opt_disc, mesh=mesh, fsdp=True
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor=None)
    mgr.save_last(0, state)
    template = create_train_state(
        m, jax.random.PRNGKey(2), 8, opt_ae, opt_disc, mesh=mesh, fsdp=True
    )
    restored = mgr.restore(template)
    for a, b in zip(
        jax.tree.leaves(state.net_params), jax.tree.leaves(restored.net_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restore re-establishes the FSDP shardings from the template
    assert _sharded_leaf_count(restored.net_params) > 0
    assert _sharded_leaf_count(restored.opt_ae_state) > 0
    mgr.close()

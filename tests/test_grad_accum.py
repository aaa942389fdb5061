"""Gradient accumulation (optax.MultiSteps) semantics.

Ref: accumulate_grad_batches (ref train.py:376-381) under Lightning 1.9,
where ``global_step`` counts optimizer steps — the curriculum clock advances
once per accumulation window, not per micro-batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.config import load_yaml, instantiate_from_config
from generative_detection_tpu.train import (
    create_train_state,
    make_optimizers,
    make_train_step,
)

MAX_EXAMPLES = 4


@pytest.fixture(scope="module")
def tiny_model():
    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 1e-3
    return model


def _batch(model, bs, seed=0):
    rng = np.random.default_rng(seed)
    b = model.example_batch(bs)
    b["patch"] = rng.normal(size=(bs, 32, 32, 3)).astype(np.float32)
    cls = np.resize(np.asarray([0, 2], np.int32), bs)
    b["class_id"] = cls
    b["original_class_id"] = cls
    return model.prepare_batch(b)


def _leaf0(tree):
    return np.asarray(jax.tree_util.tree_leaves(tree)[0])


def test_params_update_only_at_window_end(tiny_model):
    """With k=2, micro-batch 1 accumulates (params frozen), micro-batch 2
    applies the update."""
    m = tiny_model
    opt_ae, opt_disc = make_optimizers(1e-3, grad_clip=1.0, accumulate_grad_batches=2)
    step_fn = jax.jit(
        make_train_step(m, opt_ae, opt_disc, phase="full", accumulate_grad_batches=2)
    )
    state = create_train_state(m, jax.random.PRNGKey(0), MAX_EXAMPLES, opt_ae, opt_disc)
    state = state.replace(step=jnp.asarray(50, jnp.int32))  # past every phase gate
    p0 = jax.tree.map(np.asarray, state.net_params)
    batch = _batch(m, MAX_EXAMPLES)

    def same(a, b):
        return all(
            np.array_equal(x, y)
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    state1, _ = step_fn(state, batch)
    assert same(state1.net_params, p0), "mid-window micro-step must not update"

    state2, _ = step_fn(state1, batch)
    assert not same(state2.net_params, p0), "window-end micro-step must update"


def test_accumulated_window_equals_single_step(tiny_model):
    """k=2 over the SAME micro-batch twice == one k=1 step on that batch at
    the matched optimizer step: window-keyed forward PRNGs make the two
    micro-grads identical, MultiSteps averages them, and both optimizers land
    on exactly the single-step params. (A bs-2N duplicated-batch comparison
    cannot be exact: per-SAMPLE stochastic draws — z-noise, posterior
    sampling — differ between batch shapes by construction.)"""
    import optax

    m = tiny_model
    micro = _batch(m, MAX_EXAMPLES, seed=1)

    # SGD keeps the update LINEAR in the gradient, so the comparison tests
    # the accumulation wiring itself (Adam's first step is ~lr*sign(g),
    # which amplifies fp noise on near-zero grads into sign flips).
    def sgd_pair(k):
        def build():
            tx = optax.sgd(1e-2)
            return optax.MultiSteps(tx, every_k_schedule=k) if k > 1 else tx

        return build(), build()

    # accumulated: two identical micro-steps, k=2
    opt_ae, opt_disc = sgd_pair(2)
    step_k2 = jax.jit(
        make_train_step(m, opt_ae, opt_disc, phase="full", accumulate_grad_batches=2)
    )
    s = create_train_state(m, jax.random.PRNGKey(0), MAX_EXAMPLES, opt_ae, opt_disc)
    # start past every phase gate; micro-steps 50,51 -> optimizer step 25
    s = s.replace(step=jnp.asarray(50, jnp.int32))
    s, _ = step_k2(s, micro)
    s, _ = step_k2(s, micro)

    # one big step, k=1, at the SAME optimizer step (25 -> global_step 50)
    # so curriculum gates and the window-keyed forward PRNGs line up exactly
    opt_ae1, opt_disc1 = sgd_pair(1)
    step_k1 = jax.jit(make_train_step(m, opt_ae1, opt_disc1, phase="full"))
    s1 = create_train_state(m, jax.random.PRNGKey(0), MAX_EXAMPLES, opt_ae1, opt_disc1)
    s1 = s1.replace(step=jnp.asarray(25, jnp.int32))
    s1, _ = step_k1(s1, micro)

    for a, b in zip(
        jax.tree_util.tree_leaves(s.net_params),
        jax.tree_util.tree_leaves(s1.net_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s.loss_params["discriminator"]),
        jax.tree_util.tree_leaves(s1.loss_params["discriminator"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_curriculum_clock_counts_optimizer_steps(tiny_model):
    """disc_factor flips at disc_start in OPTIMIZER steps: with k=2 the
    micro-step at state.step=s sees global_step 2*(s//2) (the Lightning-1.9
    semantics the shipped config's phase lengths assume)."""
    m = tiny_model
    disc_start = m.loss.disc_start
    assert disc_start >= 2, "tiny config must have disc_start >= 2 for this test"

    opt_ae, opt_disc = make_optimizers(1e-3, accumulate_grad_batches=2)
    step_fn = jax.jit(
        make_train_step(m, opt_ae, opt_disc, phase="full", accumulate_grad_batches=2)
    )
    state = create_train_state(m, jax.random.PRNGKey(0), MAX_EXAMPLES, opt_ae, opt_disc)
    batch = _batch(m, MAX_EXAMPLES)

    # micro-step at state.step = disc_start - 1: optimizer step = 2*((ds-1)//2)
    s = state.replace(step=jnp.asarray(disc_start - 1, jnp.int32))
    _, metrics = step_fn(s, batch)
    want_on = 2 * ((disc_start - 1) // 2) >= disc_start
    assert (float(metrics["train/disc_factor"]) > 0) == want_on

    # far past the boundary the discriminator must be active
    s = state.replace(step=jnp.asarray(2 * disc_start + 2, jnp.int32))
    _, metrics = step_fn(s, batch)
    assert float(metrics["train/disc_factor"]) > 0

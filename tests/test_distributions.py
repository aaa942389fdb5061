import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.utils.distributions import (
    DiagonalGaussianDistribution,
    kl_vs_prior_table,
)


def _np_kl_standard(mean, logvar):
    var = np.exp(logvar)
    return 0.5 * np.sum(
        mean**2 + var - 1.0 - logvar, axis=tuple(range(1, mean.ndim))
    )


def _np_kl_prior(mean, logvar, pmean, plogvar):
    # ref: src/util/distributions.py:38-41 (incl. the 1e-5 variance eps)
    var, pvar = np.exp(logvar), np.exp(plogvar)
    return 0.5 * np.sum(
        (mean - pmean) ** 2 / (pvar + 1e-5) + var / (pvar + 1e-5) - 1.0 - logvar + plogvar,
        axis=1,
    )


def test_from_parameters_split_and_clamp(rng):
    params = jnp.asarray(rng.normal(size=(4, 32, 16, 16)).astype(np.float32))
    d = DiagonalGaussianDistribution.from_parameters(params, axis=1)
    assert d.mean.shape == (4, 16, 16, 16)
    assert d.logvar.shape == (4, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(d.mean), np.asarray(params[:, :16]))
    # clamp [-30, 20]
    extreme = jnp.concatenate([jnp.zeros((1, 2)), jnp.asarray([[50.0, -50.0]])], axis=1)
    d2 = DiagonalGaussianDistribution.from_parameters(extreme, axis=1)
    assert float(d2.logvar.max()) <= 20.0
    assert float(d2.logvar.min()) >= -30.0


def test_kl_standard_normal_matches_closed_form(rng):
    mean = rng.normal(size=(4, 16, 16, 16)).astype(np.float32)
    logvar = rng.normal(size=(4, 16, 16, 16)).astype(np.float32)
    d = DiagonalGaussianDistribution(jnp.asarray(mean), jnp.asarray(logvar))
    np.testing.assert_allclose(
        np.asarray(d.kl()), _np_kl_standard(mean, logvar), rtol=2e-5
    )


def test_kl_vs_prior_matches_reference_semantics(rng):
    mean = rng.normal(size=(4, 8)).astype(np.float32)
    logvar = rng.normal(size=(4, 8)).astype(np.float32)
    pmean = rng.normal(size=(8,)).astype(np.float32)
    plogvar = rng.normal(size=(8,)).astype(np.float32)
    d = DiagonalGaussianDistribution(jnp.asarray(mean), jnp.asarray(logvar))
    # prior built like _create_distribution_from_dataset_stats: (8, 1) moments
    prior = DiagonalGaussianDistribution(
        jnp.asarray(pmean)[:, None], jnp.asarray(plogvar)[:, None]
    )
    got = np.asarray(d.kl(prior))
    want = _np_kl_prior(mean, logvar, pmean[None], plogvar[None])
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_kl_vs_prior_table_vectorization_matches_loop(rng):
    B, C, D = 6, 3, 8
    mean = rng.normal(size=(B, D)).astype(np.float32)
    logvar = rng.normal(size=(B, D)).astype(np.float32)
    pmean = rng.normal(size=(C, D)).astype(np.float32)
    plogvar = rng.normal(size=(C, D)).astype(np.float32)
    cls = rng.integers(0, C, size=(B,))
    got = np.asarray(
        kl_vs_prior_table(
            jnp.asarray(mean),
            jnp.asarray(logvar),
            jnp.asarray(pmean[cls]),
            jnp.asarray(plogvar[cls]),
        )
    )
    want = np.stack(
        [
            _np_kl_prior(mean[i : i + 1], logvar[i : i + 1], pmean[cls[i]][None], plogvar[cls[i]][None])[0]
            for i in range(B)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_sample_statistics(key):
    mean = jnp.full((2, 4096), 1.5)
    logvar = jnp.full((2, 4096), np.log(0.25).astype(np.float32))
    d = DiagonalGaussianDistribution(mean, logvar)
    s = d.sample(key)
    assert s.shape == (2, 4096)
    assert abs(float(s.mean()) - 1.5) < 0.05
    assert abs(float(s.std()) - 0.5) < 0.05
    np.testing.assert_allclose(np.asarray(d.mode()), np.asarray(mean))


def test_deterministic_distribution():
    d = DiagonalGaussianDistribution(
        jnp.ones((3, 4)), jnp.zeros((3, 4)), deterministic=True
    )
    assert np.all(np.asarray(d.kl()) == 0.0)
    assert np.all(np.asarray(d.var) == 0.0)


def test_distribution_is_a_pytree(key):
    d = DiagonalGaussianDistribution(jnp.ones((2, 4)), jnp.zeros((2, 4)))

    @jax.jit
    def f(dist):
        return dist.kl().sum()

    assert np.isfinite(float(f(d)))

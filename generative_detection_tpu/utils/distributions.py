"""Diagonal Gaussian distribution as a JAX pytree.

TPU-native rebuild of the reference's distribution stack:

- ``ldm.modules.distributions.DiagonalGaussianDistribution`` [EXTERNAL
  submodule]: parameters chunked in 2 along ``axis`` -> (mean, logvar), logvar
  clamped to [-30, 20]; ``sample``/``mode``/``kl``/``nll`` members
  (consumed at ref src/models/autoencoder.py:134,181 and
  src/modules/losses/contperceptual.py:107,161,202).
- ``src/util/distributions.py:10-41``: KL against a *prior* distribution with
  broadcasting over the batch dim and a ``1e-5`` variance epsilon.

Design notes (TPU-first):
- a frozen ``flax.struct`` dataclass => a pytree: passes through ``jit``,
  ``vmap``, ``lax.cond`` and shardings with zero host sync;
- sampling takes an explicit PRNG key (the torch reference used the global
  RNG, ref autoencoder.py:227).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

LOGVAR_MIN = -30.0
LOGVAR_MAX = 20.0


@struct.dataclass
class DiagonalGaussianDistribution:
    mean: jnp.ndarray
    logvar: jnp.ndarray
    deterministic: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def from_parameters(
        cls,
        parameters: jnp.ndarray,
        axis: int = 1,
        deterministic: bool = False,
    ) -> "DiagonalGaussianDistribution":
        """Split ``parameters`` into (mean, logvar) halves along ``axis``.

        Matches torch ``torch.chunk(parameters, 2, dim=1)`` semantics for the
        two call sites in the reference:
        - conv moments, NCHW axis 1 / NHWC axis -1 (ref autoencoder.py:181)
        - bbox moments (B, 2*BBOX_DIM), axis 1 == axis -1 (ref autoencoder.py:134)
        """
        mean, logvar = jnp.split(parameters, 2, axis=axis)
        logvar = jnp.clip(logvar, LOGVAR_MIN, LOGVAR_MAX)
        return cls(mean=mean, logvar=logvar, deterministic=deterministic)

    @property
    def std(self) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        noise = jax.random.normal(rng, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jnp.ndarray:
        return self.mean

    def _reduce_axes(self) -> tuple:
        # Reference sums over dims [1,2,3] for 4D posteriors
        # (ldm distributions; src/util/distributions.py:15-17) and over all
        # non-batch dims for the bbox posterior (src/util/distributions.py:34-41).
        return tuple(range(1, self.mean.ndim))

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None) -> jnp.ndarray:
        """KL(self || N(0, I)) or KL(self || other) per batch element.

        ``other`` semantics follow src/util/distributions.py:10-41: the prior
        is squeezed then broadcast over the batch dim, and its variance gets a
        ``1e-5`` epsilon.
        """
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), dtype=self.mean.dtype)
        axes = self._reduce_axes()
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
            )
        other_mean = jnp.reshape(jnp.squeeze(other.mean), (1, -1))
        other_var = jnp.reshape(jnp.squeeze(other.var), (1, -1))
        other_logvar = jnp.reshape(jnp.squeeze(other.logvar), (1, -1))
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other_mean) / (other_var + 1e-5)
            + self.var / (other_var + 1e-5)
            - 1.0
            - self.logvar
            + other_logvar,
            axis=tuple(range(1, max(self.mean.ndim, 2))),
        )

    def nll(self, sample: jnp.ndarray, axes: Optional[tuple] = None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), dtype=self.mean.dtype)
        if axes is None:
            axes = self._reduce_axes()
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )


def kl_vs_prior_table(
    mean: jnp.ndarray,
    logvar: jnp.ndarray,
    prior_mean: jnp.ndarray,
    prior_logvar: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorized per-sample KL against per-sample priors.

    ``mean``/``logvar``: (B, D) posterior moments. ``prior_mean``/
    ``prior_logvar``: (B, D) priors already gathered per sample (e.g. by class
    id via ``jnp.take``). Replaces the per-sample Python loop at ref
    contperceptual.py:196-203 with one fused elementwise pass; numerics match
    ``DiagonalGaussianDistribution.kl(other)`` incl. the 1e-5 epsilon.
    """
    prior_var = jnp.exp(prior_logvar)
    var = jnp.exp(logvar)
    return 0.5 * jnp.sum(
        jnp.square(mean - prior_mean) / (prior_var + 1e-5)
        + var / (prior_var + 1e-5)
        - 1.0
        - logvar
        + prior_logvar,
        axis=-1,
    )

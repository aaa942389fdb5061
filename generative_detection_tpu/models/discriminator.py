"""PatchGAN discriminator (flax, NHWC).

Rebuild of taming-transformers' ``NLayerDiscriminator`` as consumed by the
reference loss base (ref contperceptual.py:285,355-356; separately optimized
at src/models/autoencoder.py:375-376): n_layers=3, ndf=64, BatchNorm,
LeakyReLU(0.2); 256x256x3 -> 30x30x1 logit map. Weights initialized
normal(0, 0.02) (convs) / normal(1, 0.02) (BN scale), matching taming's
``weights_init``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _conv_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * 0.02


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


class BatchStatsNorm(nn.Module):
    """BatchNorm that always normalizes by the current batch statistics.

    torch BN in *train* mode — which is what the reference discriminator sees
    during optimization (and, via the fresh-module quirk, effectively always).
    Keeping it stateless removes mutable-collection plumbing from the jitted
    train step; running-average eval stats are deliberately not tracked.
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", _bn_scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        kw, padw = 4, 1
        pad = ((padw, padw), (padw, padw))
        h = nn.Conv(
            self.ndf,
            (kw, kw),
            strides=(2, 2),
            padding=pad,
            dtype=self.dtype,
            kernel_init=_conv_init,
            name="conv_0",
        )(x.astype(self.dtype))
        h = nn.leaky_relu(h, negative_slope=0.2)

        nf_mult = 1
        for n in range(1, self.n_layers + 1):
            nf_mult = min(2**n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(
                self.ndf * nf_mult,
                (kw, kw),
                strides=(stride, stride),
                padding=pad,
                use_bias=False,
                dtype=self.dtype,
                kernel_init=_conv_init,
                name=f"conv_{n}",
            )(h)
            h = BatchStatsNorm(dtype=self.dtype, name=f"bn_{n}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)

        h = nn.Conv(
            1,
            (kw, kw),
            strides=(1, 1),
            padding=pad,
            dtype=self.dtype,
            kernel_init=_conv_init,
            name="conv_out",
        )(h)
        return h.astype(jnp.float32)

"""Spatial-VAE-style pose encoder / decoder MLPs (flax).

Faithful re-architecture of the reference pose modules:

- ``PoseDecoderSpatialVAE`` (ref src/modules/autoencodermodules/
  pose_decoder.py:60-98): flattened 16x16x16 feature map (4096) ->
  hidden(500, tanh) x num_layers -> 27 = (4+3+1)*2 Gaussian moments +
  num_classes logits.
- ``PoseEncoderSpatialVAE`` (ref src/modules/autoencodermodules/
  pose_encoder.py:59-131): a fixed [-1,1]^2 meshgrid of 16x16 coordinates is
  linearly lifted to (256, 4) features, a 19-d pose vector is lifted (no
  bias) to 4 features broadcast over all 256 coordinates, summed, then an
  MLP (SiLU, 1024 -> 500 -> 4096) emits the flattened pose feature map.

These MLPs are tiny next to the conv backbone; plain XLA matmuls hit the MXU.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

POSE_DIM = 4
LHW_DIM = 3
FILL_FACTOR_DIM = 1


def _activation(name: str):
    name = name if isinstance(name, str) else "relu"
    return {
        "swish": nn.silu,
        "silu": nn.silu,
        "tanh": nn.tanh,
        "relu": nn.relu,
        "softplus": nn.softplus,
    }.get(name, nn.relu)


class PoseDecoderSpatialVAE(nn.Module):
    num_classes: int = 11
    num_channels: int = 16
    n: int = 16
    m: int = 16
    hidden_dim: int = 500
    num_layers: int = 2
    activation: str = "tanh"
    resid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, num_channels * n * m) = (B, 4096)
        act = _activation(self.activation)
        inf_dim = (POSE_DIM + LHW_DIM + FILL_FACTOR_DIM) * 2 + self.num_classes
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc_in")(x.astype(self.dtype))
        h = act(h)
        for i in range(1, self.num_layers):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc_{i}")(h)
            h = act(h)
        return nn.Dense(inf_dim, dtype=self.dtype, name="fc_out")(h).astype(jnp.float32)


class PoseEncoderSpatialVAE(nn.Module):
    num_classes: int = 11
    num_channels: int = 16
    n: int = 16
    m: int = 16
    hidden_dim: int = 500
    num_layers: int = 2
    activation: str = "swish"
    dtype: Any = jnp.float32
    feat_size: int = 4

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        # z: (B, 19) decoded pose vector -> (B, num_channels * n * m)
        act = _activation(self.activation)
        b = z.shape[0]
        num_coords = self.n * self.m
        n_out = self.num_channels * num_coords

        # fixed coordinate grid: x in [-1,1] left->right, y in [1,-1] top->down
        xgrid = np.linspace(-1, 1, self.m)
        ygrid = np.linspace(1, -1, self.n)
        x0, x1 = np.meshgrid(xgrid, ygrid)
        coords = np.stack([x0.ravel(), x1.ravel()], axis=1).astype(np.float32)  # (256, 2)
        coords_flat = jnp.asarray(coords.reshape(1, num_coords * 2))

        h_x = nn.Dense(num_coords * self.feat_size, dtype=self.dtype, name="coord_linear")(
            jnp.broadcast_to(coords_flat, (b, num_coords * 2)).astype(self.dtype)
        )  # (B, 1024)
        h_z = nn.Dense(
            self.feat_size, use_bias=False, dtype=self.dtype, name="latent_linear"
        )(z.astype(self.dtype))  # (B, 4)
        # broadcast-add over all coordinates: tile (B, 4) -> (B, 256*4)
        h_z = jnp.tile(h_z, (1, num_coords))
        h = act(h_x + h_z)

        for i in range(1, self.num_layers):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc_{i}")(h)
            h = act(h)
        return nn.Dense(n_out, dtype=self.dtype, name="fc_out")(h).astype(jnp.float32)

"""Fused GroupNorm(+SiLU) for NHWC feature maps.

The conv backbone (ref: ldm.modules.diffusionmodules.model Encoder/Decoder,
consumed via src/modules/autoencodermodules/feat_{encoder,decoder}.py) applies
``GroupNorm(32, eps=1e-6) -> SiLU`` before every conv. GroupNorm is
memory-bound: a naive lowering reads the feature map twice (stats pass +
normalize pass). The Pallas kernel below keeps one batch row's full feature
map resident in VMEM and does stats + normalize + activation in a single HBM
round trip. Falls back to a pure-jnp implementation when the slab would not
fit in VMEM or when not running on TPU.

Layout: NHWC (TPU-native; channels on the 128-lane minor dimension).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode as _interpret
from .dispatch import pallas_enabled

# Max elements (H*W*C) of one batch row for the single-shot kernel. The block
# lives in VMEM double-buffered on both ends plus fp32 working copies; blocks
# over ~2 MB fp32 (l*c > 512K elements, e.g. 64x64x256) overflow VMEM and the
# Mosaic compile fails. Empirically 64x64x128 and 32x32x512 (512K) compile,
# 64x64x256 (1M) does not. Larger shapes take the one-pass XLA path, which is
# already HBM-optimal (2R+1W) for an unfused GN.
_MAX_BLOCK_ELEMENTS = 512 * 1024


def _gn_reference(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    eps: float,
    act: Optional[str],
) -> jnp.ndarray:
    b, h, w, c = x.shape
    cg = c // num_groups
    xg = x.reshape(b, h * w, num_groups, cg).astype(jnp.float32)
    # One-pass stats (E[x^2] - E[x]^2): both reductions are siblings, so XLA
    # fuses them into a single read of x. The two-pass formulation
    # mean((x - mean)^2) forces an extra full HBM pass.
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    meansq = jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c)
    y = y * gamma.reshape(1, 1, 1, c) + beta.reshape(1, 1, 1, c)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, num_groups, eps, act):
    # x_ref: (1, H*W, C) one batch row fully resident in VMEM.
    #
    # Mosaic cannot shape-cast the lane (channel) dim into (G, Cg), so group
    # statistics are computed with a (C, G) one-hot group-membership matrix:
    # two tiny MXU matmuls replace the reshape entirely.
    x = x_ref[0].astype(jnp.float32)  # (L, C)
    l, c = x.shape
    cg = c // num_groups
    chan = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (chan // cg == grp).astype(jnp.float32)  # (C, G)

    colsum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    colsumsq = jnp.sum(x * x, axis=0, keepdims=True)  # (1, C)
    denom = float(l * cg)
    # HIGHEST precision: the MXU's default fp32 path truncates inputs to
    # bf16, which wrecks the E[x^2]-E[x]^2 cancellation (observed 3e-2 error).
    hi = jax.lax.Precision.HIGHEST
    mean_g = jax.lax.dot_general(
        colsum, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    ) / denom  # (1, G)
    meansq_g = jax.lax.dot_general(
        colsumsq, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    ) / denom
    var_g = meansq_g - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)  # (1, G)
    # Scatter group stats back to channels: (1, G) @ (G, C).
    mean_c = jax.lax.dot_general(
        mean_g, onehot.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )  # (1, C)
    rstd_c = jax.lax.dot_general(
        rstd_g, onehot.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )
    y = (x - mean_c) * rstd_c
    y = y * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "act", "interpret"))
def _gn_pallas(x, gamma, beta, num_groups, eps, act, interpret=False):
    b, h, w, c = x.shape
    l = h * w
    x2 = x.reshape(b, l, c)
    gamma2 = gamma.reshape(1, c)
    beta2 = beta.reshape(1, c)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, num_groups=num_groups, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, gamma2, beta2)
    return out.reshape(b, h, w, c)


def _gn_stats(x32, num_groups):
    b, h, w, c = x32.shape
    cg = c // num_groups
    xg = x32.reshape(b, h * w, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 3))  # (B, G)
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
    return mean, var


@functools.lru_cache(maxsize=None)
def _make_gn_custom_vjp(num_groups: int, eps: float, act: Optional[str], interpret: bool):
    """Pallas forward + closed-form XLA backward (a Pallas call is not
    differentiable by itself; the backward is bandwidth-bound elementwise
    math that XLA fuses into two passes)."""

    @jax.custom_vjp
    def fn(x, gamma, beta):
        return _gn_pallas(x, gamma, beta, num_groups, eps, act, interpret=interpret)

    def fwd(x, gamma, beta):
        return fn(x, gamma, beta), (x, gamma, beta)

    def bwd(res, dy):
        x, gamma, beta = res
        b, h, w, c = x.shape
        cg = c // num_groups
        x32 = x.astype(jnp.float32)
        dy32 = dy.astype(jnp.float32)
        mean, var = _gn_stats(x32, num_groups)
        rstd = jax.lax.rsqrt(var + eps)  # (B, G)
        mean_c = jnp.repeat(mean, cg, axis=-1).reshape(b, 1, 1, c)
        rstd_c = jnp.repeat(rstd, cg, axis=-1).reshape(b, 1, 1, c)
        xhat = (x32 - mean_c) * rstd_c
        if act == "silu":
            z = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
            sig = jax.nn.sigmoid(z)
            dz = dy32 * sig * (1.0 + z * (1.0 - sig))
        else:
            dz = dy32
        dgamma = jnp.sum(dz * xhat, axis=(0, 1, 2)).astype(gamma.dtype)
        dbeta = jnp.sum(dz, axis=(0, 1, 2)).astype(beta.dtype)
        dxhat = dz * gamma.astype(jnp.float32)
        # per-(batch, group) means over the normalization set
        dxg = dxhat.reshape(b, h * w, num_groups, cg)
        xg = xhat.reshape(b, h * w, num_groups, cg)
        m1 = jnp.mean(dxg, axis=(1, 3), keepdims=True)
        m2 = jnp.mean(dxg * xg, axis=(1, 3), keepdims=True)
        dx = ((dxg - m1 - xg * m2).reshape(b, h, w, c) * rstd_c).astype(x.dtype)
        return dx, dgamma, dbeta

    fn.defvjp(fwd, bwd)
    return fn


def group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    act: Optional[str] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """GroupNorm over NHWC with optional fused activation (``act='silu'``)."""
    b, h, w, c = x.shape
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    interpret = _interpret()
    if use_pallas is None:
        use_pallas = pallas_enabled()
    if (
        use_pallas
        and h * w * c <= _MAX_BLOCK_ELEMENTS
        and (h * w) % 8 == 0
        and c % 128 == 0
    ):
        return _make_gn_custom_vjp(num_groups, eps, act, interpret)(x, gamma, beta)
    return _gn_reference(x, gamma, beta, num_groups, eps, act)

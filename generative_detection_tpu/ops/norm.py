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
import os
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


# ---------------------------------------------------------------------------
# Custom-vjp XLA GroupNorm — opt-in (GDT_GN_XLA_VJP=1); measured even with
# plain autodiff in the full flagship step (see dispatch note in group_norm).
#
# Two hypothesized problems with plain autodiff over ``_gn_reference`` on TPU
# (round-3 xplane profile, docs/BENCH.md):
#   1. the (B, L, G, Cg) group reshape splits the 128-lane channel dimension
#      into G runs of Cg lanes, so every stats reduction lane-mangles and XLA
#      emits layout-change copies around the ``convert_reduce`` fusions;
#   2. the backward RECOMPUTES the forward statistics (mean/rstd) — one full
#      extra HBM read of x per GN, sequenced before the m1/m2 reductions
#      (the dependency chain prevents fusing the two passes).
# This formulation fixes both: all big reductions run over the spatial axis
# of (B, L, C) — channels stay on lanes, no relayout — with the group fold
# done on tiny (B, C) tensors; and the vjp carries (mean_c, rstd_c) as
# residuals so the backward is exactly two passes over (x, dy).
# ---------------------------------------------------------------------------


def _gn_colstats(x2, num_groups, eps):
    """(B, L, C) f32 -> per-channel-broadcast (mean_c, rstd_c), each (B, 1, C).

    Sibling per-channel sums (one fused read of x); the channel->group fold
    happens on (B, C) scalars-per-lane, which is noise."""
    b, l, c = x2.shape
    cg = c // num_groups
    colsum = jnp.sum(x2, axis=1)  # (B, C): lane-preserving
    colsumsq = jnp.sum(jnp.square(x2), axis=1)
    denom = float(l * cg)
    s_g = jnp.sum(colsum.reshape(b, num_groups, cg), axis=-1)  # (B, G)
    ss_g = jnp.sum(colsumsq.reshape(b, num_groups, cg), axis=-1)
    mean_g = s_g / denom
    var_g = jnp.maximum(ss_g / denom - jnp.square(mean_g), 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=-1).reshape(b, 1, c)
    rstd_c = jnp.repeat(rstd_g, cg, axis=-1).reshape(b, 1, c)
    return mean_c, rstd_c


@functools.lru_cache(maxsize=None)
def _make_gn_xla_custom_vjp(num_groups: int, eps: float, act: Optional[str]):
    def _apply(x2, mean_c, rstd_c, gamma, beta):
        xhat = (x2.astype(jnp.float32) - mean_c) * rstd_c
        z = xhat * gamma.astype(jnp.float32).reshape(1, 1, -1) + beta.astype(
            jnp.float32
        ).reshape(1, 1, -1)
        if act == "silu":
            z = z * jax.nn.sigmoid(z)
        return z.astype(x2.dtype)

    @jax.custom_vjp
    def fn(x, gamma, beta):
        b, h, w, c = x.shape
        x2 = x.reshape(b, h * w, c)
        mean_c, rstd_c = _gn_colstats(x2.astype(jnp.float32), num_groups, eps)
        return _apply(x2, mean_c, rstd_c, gamma, beta).reshape(b, h, w, c)

    def fwd(x, gamma, beta):
        b, h, w, c = x.shape
        x2 = x.reshape(b, h * w, c)
        mean_c, rstd_c = _gn_colstats(x2.astype(jnp.float32), num_groups, eps)
        y = _apply(x2, mean_c, rstd_c, gamma, beta).reshape(b, h, w, c)
        return y, (x, gamma, beta, mean_c, rstd_c)

    def bwd(res, dy):
        x, gamma, beta, mean_c, rstd_c = res
        b, h, w, c = x.shape
        l = h * w
        cg = c // num_groups
        x2 = x.reshape(b, l, c).astype(jnp.float32)
        dy2 = dy.reshape(b, l, c).astype(jnp.float32)
        g32 = gamma.astype(jnp.float32).reshape(1, 1, c)
        xhat = (x2 - mean_c) * rstd_c  # recomputed in-register both passes

        if act == "silu":
            z = xhat * g32 + beta.astype(jnp.float32).reshape(1, 1, c)
            sig = jax.nn.sigmoid(z)
            dz = dy2 * sig * (1.0 + z * (1.0 - sig))
        else:
            dz = dy2
        dxhat = dz * g32

        # pass 1: four sibling per-channel reductions — ONE fused read of
        # (x, dy); channel lanes intact
        r_dgamma = jnp.sum(dz * xhat, axis=(0, 1))  # (C,)
        r_dbeta = jnp.sum(dz, axis=(0, 1))
        r_m1 = jnp.sum(dxhat, axis=1)  # (B, C)
        r_m2 = jnp.sum(dxhat * xhat, axis=1)
        denom = float(l * cg)
        m1_g = jnp.sum(r_m1.reshape(b, num_groups, cg), axis=-1) / denom
        m2_g = jnp.sum(r_m2.reshape(b, num_groups, cg), axis=-1) / denom
        m1_c = jnp.repeat(m1_g, cg, axis=-1).reshape(b, 1, c)
        m2_c = jnp.repeat(m2_g, cg, axis=-1).reshape(b, 1, c)

        # pass 2: dx — second read of (x, dy), one write
        dx2 = (dxhat - m1_c - xhat * m2_c) * rstd_c
        dx = dx2.reshape(b, h, w, c).astype(x.dtype)
        return dx, r_dgamma.astype(gamma.dtype), r_dbeta.astype(beta.dtype)

    fn.defvjp(fwd, bwd)
    return fn


# ---------------------------------------------------------------------------
# Chunked kernels for feature maps whose batch row exceeds VMEM (e.g.
# 256x256x128 = 8.4M elements). The single-shot kernel above needs the whole
# row resident; these stream row tiles of ``lt`` spatial positions and
# accumulate per-CHANNEL partial sums across the chunk axis of the grid (the
# output block index is constant in the chunk dimension, so Mosaic keeps the
# accumulator resident). Channel-group reduction of the (B, C) partials to
# (B, G) stats is a tiny XLA epilogue. Profiling round 3 on v5e: the XLA
# fallback's stats fusions alone cost ~35 ms/step on the flagship 256^2
# model (layout-change writes included); the streamed kernels bring each GN
# to the 2-read+1-write bandwidth bound and save the backward's stats
# recompute by stashing (mean, rstd) as residuals.
# ---------------------------------------------------------------------------


def _gn_stats_chunk_kernel(x_ref, out_ref):
    """Accumulate per-channel [sum; sumsq] (rows 0/1 of an (8, C) slab)."""
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (lt, C)
    part = jnp.concatenate(
        [
            jnp.sum(x, axis=0, keepdims=True),
            jnp.sum(x * x, axis=0, keepdims=True),
            jnp.zeros((6, x.shape[1]), jnp.float32),
        ],
        axis=0,
    )  # (8, C)

    @pl.when(j == 0)
    def _first():
        out_ref[0] = part

    @pl.when(j != 0)
    def _rest():
        out_ref[0] += part


def _gn_apply_chunk_kernel(x_ref, mc_ref, rc_ref, g_ref, b_ref, out_ref, *, act):
    x = x_ref[0].astype(jnp.float32)  # (lt, C)
    y = (x - mc_ref[0]) * rc_ref[0]
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


def _gn_bwd_reduce_chunk_kernel(
    x_ref, dy_ref, mc_ref, rc_ref, g_ref, b_ref, out_ref, *, act
):
    """Per-channel backward partials, accumulated over (b, chunk):
    rows: 0 dgamma=sum(dz*xhat), 1 dbeta=sum(dz), then per-b rows handled
    by a per-b output block: 2 sum(dxhat), 3 sum(dxhat*xhat)."""
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    xhat = (x - mc_ref[0]) * rc_ref[0]
    gamma = g_ref[0].astype(jnp.float32)
    if act == "silu":
        z = xhat * gamma + b_ref[0].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        dz = dy * sig * (1.0 + z * (1.0 - sig))
    else:
        dz = dy
    dxhat = dz * gamma
    part = jnp.concatenate(
        [
            jnp.sum(dz * xhat, axis=0, keepdims=True),
            jnp.sum(dz, axis=0, keepdims=True),
            jnp.sum(dxhat, axis=0, keepdims=True),
            jnp.sum(dxhat * xhat, axis=0, keepdims=True),
            jnp.zeros((4, x.shape[1]), jnp.float32),
        ],
        axis=0,
    )

    @pl.when(j == 0)
    def _first():
        out_ref[0] = part

    @pl.when(j != 0)
    def _rest():
        out_ref[0] += part


def _gn_bwd_dx_chunk_kernel(
    x_ref, dy_ref, mc_ref, rc_ref, g_ref, b_ref, m1_ref, m2_ref, out_ref, *, act
):
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    xhat = (x - mc_ref[0]) * rc_ref[0]
    gamma = g_ref[0].astype(jnp.float32)
    if act == "silu":
        z = xhat * gamma + b_ref[0].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        dz = dy * sig * (1.0 + z * (1.0 - sig))
    else:
        dz = dy
    dxhat = dz * gamma
    dx = (dxhat - m1_ref[0] - xhat * m2_ref[0]) * rc_ref[0]
    out_ref[0] = dx.astype(out_ref.dtype)


def _chunk_len(l: int, c: int) -> int:
    """Largest row-tile length: divides l, multiple of 8, tile fits VMEM."""
    lt = max(_MAX_BLOCK_ELEMENTS // c // 8 * 8, 8)
    while lt >= 8 and l % lt != 0:
        lt -= 8
    return lt


def _group_expand(stat_g, c):
    """(B, G) -> (B, 1, C) by repeating each group's value over its channels."""
    b, g = stat_g.shape
    return jnp.repeat(stat_g, c // g, axis=-1).reshape(b, 1, c)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "interpret")
)
def _gn_chunked_stats(x2, num_groups, eps, interpret=False):
    """(B, L, C) -> per-batch (mean_c, rstd_c) as (B, 1, C) f32."""
    b, l, c = x2.shape
    lt = _chunk_len(l, c)
    sums = pl.pallas_call(
        _gn_stats_chunk_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
        grid=(b, l // lt),
        in_specs=[
            pl.BlockSpec((1, lt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2)
    cg = c // num_groups
    denom = float(l * cg)
    s_g = jnp.sum(sums[:, 0].reshape(b, num_groups, cg), axis=-1)  # (B, G)
    ss_g = jnp.sum(sums[:, 1].reshape(b, num_groups, cg), axis=-1)
    mean_g = s_g / denom
    var_g = jnp.maximum(ss_g / denom - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    return _group_expand(mean_g, c), _group_expand(rstd_g, c)


@functools.partial(
    jax.jit, static_argnames=("act", "interpret")
)
def _gn_chunked_apply(x2, mean_c, rstd_c, gamma2, beta2, act, interpret=False):
    b, l, c = x2.shape
    lt = _chunk_len(l, c)
    return pl.pallas_call(
        functools.partial(_gn_apply_chunk_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x2.dtype),
        grid=(b, l // lt),
        in_specs=[
            pl.BlockSpec((1, lt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, mean_c, rstd_c, gamma2, beta2)


@functools.lru_cache(maxsize=None)
def _make_gn_chunked_custom_vjp(
    num_groups: int, eps: float, act: Optional[str], interpret: bool
):
    """Streamed Pallas forward AND backward for VMEM-overflow shapes.

    Residuals carry the forward's (mean_c, rstd_c), so the backward never
    recomputes statistics (the XLA-autodiff fallback pays a full extra
    stats pass). Backward = one reduction sweep (x, dy -> per-channel
    partials) + one dx sweep."""

    @jax.custom_vjp
    def fn(x, gamma, beta):
        b, h, w, c = x.shape
        x2 = x.reshape(b, h * w, c)
        mean_c, rstd_c = _gn_chunked_stats(x2, num_groups, eps, interpret=interpret)
        y = _gn_chunked_apply(
            x2, mean_c, rstd_c, gamma.reshape(1, c), beta.reshape(1, c), act,
            interpret=interpret,
        )
        return y.reshape(b, h, w, c)

    def fwd(x, gamma, beta):
        b, h, w, c = x.shape
        x2 = x.reshape(b, h * w, c)
        mean_c, rstd_c = _gn_chunked_stats(x2, num_groups, eps, interpret=interpret)
        y = _gn_chunked_apply(
            x2, mean_c, rstd_c, gamma.reshape(1, c), beta.reshape(1, c), act,
            interpret=interpret,
        )
        return y.reshape(b, h, w, c), (x, gamma, beta, mean_c, rstd_c)

    def bwd(res, dy):
        x, gamma, beta, mean_c, rstd_c = res
        b, h, w, c = x.shape
        l = h * w
        lt = _chunk_len(l, c)
        x2 = x.reshape(b, l, c)
        dy2 = dy.reshape(b, l, c)
        gamma2 = gamma.reshape(1, c)
        beta2 = beta.reshape(1, c)
        partials = pl.pallas_call(
            functools.partial(_gn_bwd_reduce_chunk_kernel, act=act),
            out_shape=jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
            grid=(b, l // lt),
            in_specs=[
                pl.BlockSpec((1, lt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(x2, dy2, mean_c, rstd_c, gamma2, beta2)
        dgamma = jnp.sum(partials[:, 0], axis=0).astype(gamma.dtype)  # (C,)
        dbeta = jnp.sum(partials[:, 1], axis=0).astype(beta.dtype)
        cg = c // num_groups
        denom = float(l * cg)
        m1_g = jnp.sum(partials[:, 2].reshape(b, num_groups, cg), axis=-1) / denom
        m2_g = jnp.sum(partials[:, 3].reshape(b, num_groups, cg), axis=-1) / denom
        m1_c = _group_expand(m1_g, c)
        m2_c = _group_expand(m2_g, c)
        dx2 = pl.pallas_call(
            functools.partial(_gn_bwd_dx_chunk_kernel, act=act),
            out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
            grid=(b, l // lt),
            in_specs=[
                pl.BlockSpec((1, lt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, lt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(x2, dy2, mean_c, rstd_c, gamma2, beta2, m1_c, m2_c)
        return dx2.reshape(b, h, w, c), dgamma, dbeta

    fn.defvjp(fwd, bwd)
    return fn


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
    if use_pallas and (h * w) % 8 == 0 and c % 128 == 0:
        if h * w * c <= _MAX_BLOCK_ELEMENTS:
            return _make_gn_custom_vjp(num_groups, eps, act, interpret)(x, gamma, beta)
        if (
            os.environ.get("GDT_GN_CHUNKED", "0") == "1"
            and (h * w) % _chunk_len(h * w, c) == 0
        ):
            # VMEM-overflow shapes: streamed Pallas kernels, OPT-IN after an
            # honest A/B (v5e, 16x256x256x128 f+b: chunked 6.1 ms vs XLA
            # 3.9 ms — XLA's one-pass stats + autodiff are already at the
            # measured ~670 GB/s bandwidth bound, and its fwd+bwd fuses
            # passes the split kernels cannot). Kept for backends where the
            # XLA GN lowering is worse and as the 256^2 numerics vehicle.
            return _make_gn_chunked_custom_vjp(num_groups, eps, act, interpret)(
                x, gamma, beta
            )
    if os.environ.get("GDT_GN_XLA_VJP", "0") == "1" and c % num_groups == 0:
        # Custom-vjp XLA path (saved stats + lane-preserving reductions).
        # Measured DEAD EVEN with plain autodiff inside the full flagship
        # step (224.3 vs 224.1 ms/step, bs16 bf16, 30-step A/B via
        # tools/ab_step.py): XLA already co-fuses the stats recompute with
        # the backward reductions, so saving the residuals buys nothing
        # in-graph. Kept opt-in for shapes/graphs where autodiff fails to
        # fuse; GDT_GN_XLA_VJP=1 enables it.
        return _make_gn_xla_custom_vjp(num_groups, eps, act)(x, gamma, beta)
    return _gn_reference(x, gamma, beta, num_groups, eps, act)

"""Fused GroupNorm(+SiLU) -> 3x3 SAME conv as a single Pallas kernel.

The backbone's ResnetBlocks (ref ldm.modules.diffusionmodules.model
[EXTERNAL], consumed via src/modules/autoencodermodules/feat_*.py) apply
``GroupNorm(32, eps=1e-6) -> SiLU -> Conv3x3`` twice per block. Lowered
separately that costs three HBM round trips of the full feature map per
norm+conv pair (stats read, normalize read+write, conv read+write). This
kernel removes the intermediate entirely:

1. group statistics are computed in XLA with one fused read (sum + sum^2 are
   sibling reductions) and folded with gamma/beta into per-(batch, channel)
   affine coefficients ``a, b`` so the kernel's normalize step is one fma;
2. a Pallas kernel tiles the image over rows, DMAs each tile plus its 1-row
   halo from HBM, applies ``silu(x*a + b)`` in VMEM, and performs the 3x3
   conv as 9 TILE-WIDE (tr*W, C) @ (C, CO) MXU matmuls, applying the +-1
   column shifts to the matmul results via masked ``pltpu.roll`` (Mosaic
   rejects sublane-misaligned DMA/reads), writing only the conv output back.

Forward HBM traffic: 2 reads + 1 write of the feature map. Backward comes in
two vjp variants: remat (vjp of the XLA composite) and saved-activation (the
kernel also emits z; standard XLA backward).

MEASURED VERDICT (v5e, bs16, docs/BENCH.md): the kernel wins isolated
per-shape A/B forwards (1.3-2x at 256^2/128^2) but LOSES composed into the
full backbone — XLA's conv operand-fusion already absorbs the normalize, so
the unfused lowering has no extra HBM pass to save, while this kernel adds a
separate stats reduction per conv and launch overhead. It is therefore
OPT-IN (blocks' ``fuse`` flag / ``GDT_FUSE_INFERENCE=1``); the value kept
here is the op itself, its tests, and the documented Mosaic constraints.

Used for C % 128 == 0 shapes with row tiles that fit VMEM; everything else
falls back to the unfused ops (``ops.group_norm`` + XLA conv).
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

# Per-program VMEM budget for scratch + blocks (bytes); conservative.
_VMEM_BUDGET = 9 * 1024 * 1024


def _gn_affine(x, gamma, beta, num_groups, eps):
    """Per-(batch, channel) affine (a, b) with y = x * a + b == GN(x)*gamma+beta.

    One fused HBM read: mean and mean-of-squares are sibling reductions.
    """
    bsz, h, w, c = x.shape
    cg = c // num_groups
    xg = x.reshape(bsz, h * w, num_groups, cg).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3))  # (B, G)
    meansq = jnp.mean(jnp.square(xg), axis=(1, 3))
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)  # (B, G)
    mean_c = jnp.repeat(mean, cg, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    g32 = gamma.astype(jnp.float32)[None, :]
    a = rstd_c * g32
    b = beta.astype(jnp.float32)[None, :] - mean_c * a
    return a, b


def gn_silu_conv_reference(
    x, gamma, beta, w, bias, num_groups: int = 32, eps: float = 1e-6
):
    """XLA composite: GN -> SiLU -> 3x3 SAME conv (NHWC, HWIO weights)."""
    a, b = _gn_affine(x, gamma, beta, num_groups, eps)
    z = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    z = (z * jax.nn.sigmoid(z)).astype(x.dtype)
    # Same-dtype conv (XLA's TPU bf16 conv accumulates fp32 internally); an
    # explicit preferred_element_type=f32 here breaks the conv TRANSPOSE rule
    # under vjp (fp32 cotangent vs bf16 operand dtype mismatch).
    out = jax.lax.conv_general_dilated(
        z,
        w.astype(x.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (out.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _pick_tile(h: int, w: int, c: int, co: int, itemsize: int) -> Optional[int]:
    """Largest row-tile TR dividing h whose scratch fits the VMEM budget."""
    for tr in (32, 16, 8, 4, 2, 1):
        if h % tr:
            continue
        zs = (tr + 2) * w * c * itemsize
        qbuf = 4 * tr * w * co * 4  # three tile-wide q accumulators + temp (fp32)
        wts = 9 * c * co * itemsize
        out = 2 * tr * w * co * itemsize  # double-buffered out block
        zout = 2 * tr * w * c * itemsize  # double-buffered z block (emit_z)
        if zs + qbuf + wts + out + zout <= _VMEM_BUDGET:
            return tr
    return None


def _fused_kernel(
    x_hbm, a_ref, b_ref, w_ref, bias_ref, *outs_and_scratch, tr, h, w, c, co, emit_z
):
    if emit_z:
        out_ref, z_ref, zs, sem = outs_and_scratch
    else:
        out_ref, zs, sem = outs_and_scratch
        z_ref = None
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * tr
    n_t = pl.num_programs(1)

    # ---- DMA body rows + row halos (all column-0-aligned: Mosaic rejects
    # DMAs into sublane-misaligned VMEM destinations) ---------------------------
    body = pltpu.make_async_copy(
        x_hbm.at[bidx, pl.ds(r0, tr)], zs.at[pl.ds(1, tr)], sem.at[0]
    )
    body.start()

    @pl.when(t > 0)
    def _top():
        cp = pltpu.make_async_copy(
            x_hbm.at[bidx, pl.ds(r0 - 1, 1)], zs.at[pl.ds(0, 1)], sem.at[1]
        )
        cp.start()
        cp.wait()

    @pl.when(t < n_t - 1)
    def _bot():
        cp = pltpu.make_async_copy(
            x_hbm.at[bidx, pl.ds(r0 + tr, 1)], zs.at[pl.ds(tr + 1, 1)], sem.at[2]
        )
        cp.start()
        cp.wait()

    body.wait()

    # ---- normalize + SiLU in VMEM (fp32 math, stored back in x dtype) ---------
    # Halo rows are raw x rows of the same image, so the affine covers all
    # tr+2 rows. Border rows are zeroed AFTER (the affine of a zero row would
    # otherwise yield silu(b) != 0; uninitialized scratch in border rows is
    # overwritten here too).
    a = a_ref[0, 0].astype(jnp.float32)  # (C,)
    b = b_ref[0, 0].astype(jnp.float32)
    zf = zs[:].astype(jnp.float32) * a + b
    zs[:] = (zf * jax.nn.sigmoid(zf)).astype(zs.dtype)

    @pl.when(t == 0)
    def _zt():
        zs[pl.ds(0, 1)] = jnp.zeros((1, w, c), zs.dtype)

    @pl.when(t == n_t - 1)
    def _zb():
        zs[pl.ds(tr + 1, 1)] = jnp.zeros((1, w, c), zs.dtype)

    if z_ref is not None:  # training variant: save the activation for bwd
        z_ref[0] = zs[pl.ds(1, tr)]

    # ---- 3x3 conv: 9 TILE-WIDE matmuls (M = tr*w rows — MXU-saturating).
    # For each dy, rows [dy, dy+tr) of zs flatten contiguously to (tr*w, C)
    # (w is the sublane dim, so the collapse is a layout no-op). The +-1
    # column shifts are applied to the matmul RESULTS via masked rolls on the
    # flattened row dim: adjacent flat indices are adjacent columns, and the
    # per-image left/right borders are exactly flat positions f % w == 0 /
    # w-1 (shifted VMEM reads would be sublane-misaligned; Mosaic rejects
    # misaligned DMA and relayouts strided reads).
    bias = bias_ref[0].astype(jnp.float32)  # (CO,)
    m = tr * w
    qs = []
    for dx in range(3):
        q = jnp.zeros((m, co), jnp.float32)
        for dy in range(3):
            q = q + jax.lax.dot_general(
                zs[pl.ds(dy, tr)].reshape(m, c),
                w_ref[3 * dy + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        qs.append(q)
    fidx = jax.lax.broadcasted_iota(jnp.int32, (m, co), 0)
    col = jax.lax.rem(fidx, w)
    left = jnp.where(col > 0, pltpu.roll(qs[0], shift=1, axis=0), 0.0)
    right = jnp.where(col < w - 1, pltpu.roll(qs[2], shift=m - 1, axis=0), 0.0)
    out = (left + qs[1] + right + bias[None, :]).astype(out_ref.dtype)
    out_ref[0] = out.reshape(tr, w, co)


@functools.partial(jax.jit, static_argnames=("tr", "emit_z", "interpret"))
def _fused_pallas(x, a, b, w9, bias, tr, emit_z=False, interpret=False):
    bsz, h, wd, c = x.shape
    co = w9.shape[-1]
    kernel = functools.partial(
        _fused_kernel, tr=tr, h=h, w=wd, c=c, co=co, emit_z=emit_z
    )
    out_shape = [jax.ShapeDtypeStruct((bsz, h, wd, co), x.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, tr, wd, co), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    if emit_z:
        out_shape.append(jax.ShapeDtypeStruct((bsz, h, wd, c), x.dtype))
        out_specs.append(
            pl.BlockSpec(
                (1, tr, wd, c), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
            )
        )
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(bsz, h // tr),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (9, C, CO)
            pl.BlockSpec((1, co), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((tr + 2, wd, c), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x, a.reshape(-1, 1, a.shape[-1]), b.reshape(-1, 1, b.shape[-1]), w9, bias)
    return res if emit_z else res[0]


def _gn_silu_only(x, gamma, beta, num_groups, eps):
    a, b = _gn_affine(x, gamma, beta, num_groups, eps)
    z = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    return (z * jax.nn.sigmoid(z)).astype(x.dtype)


def _conv_bias(z, w, bias):
    out = jax.lax.conv_general_dilated(
        z,
        w.astype(z.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (out.astype(jnp.float32) + bias.astype(jnp.float32)).astype(z.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused_vjp(num_groups: int, eps: float, tr: int, interpret: bool):
    """Inference variant: minimal forward traffic (2R+1W), remat backward."""

    @jax.custom_vjp
    def fn(x, gamma, beta, w, bias):
        a, b = _gn_affine(x, gamma, beta, num_groups, eps)
        w9 = w.reshape(9, w.shape[2], w.shape[3]).astype(x.dtype)
        return _fused_pallas(
            x, a, b, w9, bias.reshape(1, -1), tr, interpret=interpret
        )

    def fwd(x, gamma, beta, w, bias):
        return fn(x, gamma, beta, w, bias), (x, gamma, beta, w, bias)

    def bwd(res, dy):
        x, gamma, beta, w, bias = res
        # Backward = vjp of the XLA composite: XLA rematerializes the
        # activation from x (one elementwise pass) instead of the forward
        # storing it (a write + a read). The unused primal conv forward is
        # dead-code-eliminated by XLA.
        _, pull = jax.vjp(
            lambda *args: gn_silu_conv_reference(
                *args, num_groups=num_groups, eps=eps
            ),
            x, gamma, beta, w, bias,
        )
        return pull(dy)

    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=None)
def _make_fused_vjp_train(num_groups: int, eps: float, tr: int, interpret: bool):
    """Training variant: the kernel ALSO writes the activation z, so the
    backward is the standard saved-activation XLA backward — the forward
    still saves one full HBM read vs the unfused lowering (2R+2W vs 3R+2W),
    and the backward pays no rematerialization."""

    @jax.custom_vjp
    def fn(x, gamma, beta, w, bias):
        a, b = _gn_affine(x, gamma, beta, num_groups, eps)
        w9 = w.reshape(9, w.shape[2], w.shape[3]).astype(x.dtype)
        out, _ = _fused_pallas(
            x, a, b, w9, bias.reshape(1, -1), tr, emit_z=True, interpret=interpret
        )
        return out

    def fwd(x, gamma, beta, w, bias):
        a, b = _gn_affine(x, gamma, beta, num_groups, eps)
        w9 = w.reshape(9, w.shape[2], w.shape[3]).astype(x.dtype)
        out, z = _fused_pallas(
            x, a, b, w9, bias.reshape(1, -1), tr, emit_z=True, interpret=interpret
        )
        return out, (x, gamma, beta, w, bias, z)

    def bwd(res, dy):
        x, gamma, beta, w, bias, z = res
        _, conv_pull = jax.vjp(_conv_bias, z, w, bias)
        dz, dw, dbias = conv_pull(dy)
        _, gn_pull = jax.vjp(
            lambda x_, g_, b_: _gn_silu_only(x_, g_, b_, num_groups, eps),
            x, gamma, beta,
        )
        dx, dgamma, dbeta = gn_pull(dz)
        return dx, dgamma, dbeta, dw, dbias

    fn.defvjp(fwd, bwd)
    return fn


def gn_silu_conv(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    use_pallas: Optional[bool] = None,
    save_activation: bool = False,
) -> jnp.ndarray:
    """GroupNorm(num_groups, eps) -> SiLU -> Conv3x3(SAME) over NHWC.

    ``w``: (3, 3, C, CO) HWIO; ``bias``: (CO,). Dispatches to the fused
    Pallas kernel when shapes allow, else the XLA composite.

    save_activation=True (training): the kernel emits the activation so the
    backward is the standard saved-z XLA backward (no rematerialization);
    False (inference / forward-only): minimal 2R+1W forward, remat backward.
    """
    bsz, h, wd, c = x.shape
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3) and ci == c, (w.shape, x.shape)
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    interpret = _interpret()
    if use_pallas is None:
        use_pallas = pallas_enabled()
    tr = _pick_tile(h, wd, c, co, 2 if x.dtype == jnp.bfloat16 else 4)
    if (
        use_pallas
        and tr is not None
        and c % 128 == 0
        and co % 128 == 0
        and wd % 8 == 0
    ):
        make = _make_fused_vjp_train if save_activation else _make_fused_vjp
        return make(num_groups, eps, tr, interpret)(x, gamma, beta, w, bias)
    return gn_silu_conv_reference(x, gamma, beta, w, bias, num_groups, eps)


def fused_eligible(x_shape, co: int, dtype, num_groups: int = 32) -> bool:
    """Whether ``gn_silu_conv`` would take the Pallas kernel path."""
    _, h, wd, c = x_shape
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    return (
        pallas_enabled()
        and c % num_groups == 0
        and c % 128 == 0
        and co % 128 == 0
        and wd % 8 == 0
        and _pick_tile(h, wd, c, co, itemsize) is not None
    )

"""Conv VAE backbone blocks (NHWC, flax) configured by ``ddconfig``.

TPU-native rebuild of the latent-diffusion ``Encoder``/``Decoder`` consumed by
the reference via trivial subclasses (ref: src/modules/autoencodermodules/
feat_encoder.py:1-6, feat_decoder.py:1-6; ddconfig at
configs/autoencoder/pose/autoencoder_kl_16x16x16.yaml:55-65):

- ResnetBlock: GroupNorm(32, eps=1e-6) + SiLU + 3x3 conv, twice, with a 1x1
  nin-shortcut when channel counts change;
- AttnBlock: single-head self-attention over flattened spatial tokens
  (GroupNorm -> 1x1 q/k/v -> softmax(qk/sqrt(C))v -> 1x1 proj, residual);
- Downsample: stride-2 3x3 conv with asymmetric (0,1)x(0,1) padding;
- Upsample: nearest 2x + 3x3 conv;
- attention placement tracks ``curr_res`` starting from the *configured*
  ``resolution`` (64 in the shipped config), faithfully reproducing the
  reference behavior where attn blocks land at level 2 (actual 64x64 for
  256x256 inputs) plus the 16x16 mid-block.

TPU-first choices: NHWC layout (channels on the 128-lane minor dim), fused
GroupNorm+SiLU via ``ops.group_norm``, flash-attention via
``ops.single_head_attention``, and an optional bf16 compute dtype with fp32
params.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import group_norm, single_head_attention
from ..ops.fused_conv import fused_eligible, gn_silu_conv
from ..ops.upsample import reference_upsample_conv, subpixel_upsample_conv
from ..ops.winograd import winograd_conv3x3
from ..ops.winograd_pallas import (
    gn_silu_wino_conv3x3,
    gn_silu_wino_eligible,
    wino_rows_conv3x3,
    wino_rows_eligible,
)


def _wino_band(shape) -> bool:
    """The mid-resolution band where the Pallas F(4,3) kernels beat XLA's
    direct conv in isolated A/Bs (docs/BENCH.md "Winograd conv family"):
    direct wins at 256² (transform overhead > MAC cut at the bandwidth-heavy
    edge) and at 16² (tile too small to amortize the transforms)."""
    return 32 <= min(shape[1], shape[2]) and max(shape[1], shape[2]) <= 128


def _fused_wino_ok(shape, cout, dtype) -> bool:
    """GDT_WINOGRAD=fused: route in-band GN+SiLU->conv pairs through the
    fused GroupNorm+SiLU+Winograd kernel (keeps the producer fusion the
    plain Winograd path broke — see ops/winograd_pallas.py)."""
    return (
        os.environ.get("GDT_WINOGRAD", "0") == "fused"
        and _wino_band(shape)
        and gn_silu_wino_eligible(shape, cout, dtype, 4)
    )


class GroupNormSiLU(nn.Module):
    """GroupNorm(32) with optional fused SiLU (params in fp32)."""

    num_groups: int = 32
    eps: float = 1e-6
    act: str | None = "silu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, return_params: bool = False):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if return_params:  # fused gn+conv path consumes the affine directly
            return gamma, beta
        return group_norm(
            x, gamma, beta, num_groups=self.num_groups, eps=self.eps, act=self.act
        )


class Conv3x3(nn.Module):
    """3x3 SAME conv with the exact ``nn.Conv`` parameter layout/init, plus an
    optional fused-GroupNorm-SiLU input path (``ops.gn_silu_conv``)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, gn_affine=None) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if gn_affine is not None:
            gamma, beta = gn_affine
            if _fused_wino_ok(x.shape, self.features, self.dtype):
                return gn_silu_wino_conv3x3(x, gamma, beta, kernel, bias, self.dtype, 4)
            return gn_silu_conv(x, gamma, beta, kernel, bias)
        wino = os.environ.get("GDT_WINOGRAD", "0")
        if wino == "auto":
            # Shape-gated F(4,3): the on-chip A/B (docs/BENCH.md "Winograd
            # conv family") shows wino4 beating XLA's direct conv only in the
            # mid-resolution band — 64²/128² f+b −12..20% — while direct wins
            # at 256² (transform overhead > MAC cut at the bandwidth-heavy
            # edge) and 16² (tile too small to amortize). Gate to the band.
            if _wino_band(x.shape) and wino_rows_eligible(
                x.shape, self.features, self.dtype, 4
            ):
                return wino_rows_conv3x3(x, kernel, bias, self.dtype, 4)
        elif wino in ("pallas", "pallas4"):
            m_out = 4 if wino == "pallas4" else 2
            if wino_rows_eligible(x.shape, self.features, self.dtype, m_out):
                return wino_rows_conv3x3(x, kernel, bias, self.dtype, m_out)
        if wino in ("1", "xla") and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            return winograd_conv3x3(x, kernel, bias, dtype=self.dtype)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(out.dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    # fuse=True routes norm+conv pairs through the fused Pallas kernel — the
    # forward-only/inference configuration (its backward rematerializes; the
    # training path keeps the XLA composite, whose conv operand-fusion is
    # already near-optimal with a saved activation).
    fuse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        norm1 = GroupNormSiLU(name="norm1")
        conv1 = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")
        norm2 = GroupNormSiLU(name="norm2")
        conv2 = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")

        fuse1 = (
            self.fuse and fused_eligible(x.shape, self.out_channels, self.dtype)
        ) or _fused_wino_ok(x.shape, self.out_channels, self.dtype)
        if fuse1:
            h = conv1(x, gn_affine=norm1(x, return_params=True))
        else:
            h = conv1(norm1(x))

        can_fuse2 = self.dropout == 0.0 or deterministic  # dropout sits between
        fuse2 = can_fuse2 and (
            (self.fuse and fused_eligible(h.shape, self.out_channels, self.dtype))
            or _fused_wino_ok(h.shape, self.out_channels, self.dtype)
        )
        if fuse2:
            h = conv2(h, gn_affine=norm2(h, return_params=True))
        else:
            h = norm2(h)
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = conv2(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class Conv1x1(nn.Module):
    """1x1 conv with the exact ``nn.Conv`` parameter layout/init; can expose
    its params so callers fuse several projections into one matmul."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, params_only: bool = False):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if params_only:
            return kernel, bias
        out = jnp.einsum(
            "...c,cd->...d", x.astype(self.dtype), kernel[0, 0].astype(self.dtype)
        )
        return out + bias.astype(out.dtype)


class AttnBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = GroupNormSiLU(act=None, name="norm")(x)
        # fused QKV: one (C, 3C) matmul reads the normalized map ONCE instead
        # of three 1x1 convs reading it three times (param tree unchanged:
        # q/k/v keep their own kernel/bias leaves)
        wq, bq = Conv1x1(c, dtype=self.dtype, name="q")(y, params_only=True)
        wk, bk = Conv1x1(c, dtype=self.dtype, name="k")(y, params_only=True)
        wv, bv = Conv1x1(c, dtype=self.dtype, name="v")(y, params_only=True)
        w3 = jnp.concatenate([wq[0, 0], wk[0, 0], wv[0, 0]], axis=-1)  # (C, 3C)
        b3 = jnp.concatenate([bq, bk, bv])
        yt = y.reshape(b, h * w, c).astype(self.dtype)
        qkv = jnp.einsum("blc,cd->bld", yt, w3.astype(self.dtype)) + b3.astype(
            self.dtype
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = single_head_attention(q, k, v).reshape(b, h, w, c)
        o = Conv1x1(c, dtype=self.dtype, name="proj_out")(o)
        return x + o


class Downsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Asymmetric (0,1)x(0,1) pad then stride-2 valid conv (ldm semantics).
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            c, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class _ConvParams(nn.Module):
    """Bare 3x3 conv parameters with ``nn.Conv``'s exact tree/init (kernel,
    bias) — lets the owner pick the compute formulation."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class Upsample(nn.Module):
    """Nearest-2x + 3x3 SAME conv. Default: the direct repeat+conv
    formulation (XLA operand-fuses the repeat into the conv; composed-step
    tie, docs/BENCH.md round 4). ``GDT_SUBPIXEL_UP=1`` opts into the
    phase-decomposed 2x2 conv at the LOW resolution (``ops.upsample`` —
    identical op, 4/9 the MACs, the right default for inference-only
    decoder deployments)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel, bias = _ConvParams(c, c, name="conv")()
        if os.environ.get("GDT_SUBPIXEL_UP", "0") == "1":
            return subpixel_upsample_conv(x, kernel, bias, dtype=self.dtype)
        return reference_upsample_conv(x, kernel, bias, dtype=self.dtype)


def _parse_ddconfig(ddconfig: Dict[str, Any]) -> Dict[str, Any]:
    return dict(
        ch=ddconfig["ch"],
        out_ch=ddconfig["out_ch"],
        ch_mult=tuple(ddconfig["ch_mult"]),
        num_res_blocks=ddconfig["num_res_blocks"],
        attn_resolutions=tuple(ddconfig["attn_resolutions"]),
        dropout=ddconfig.get("dropout", 0.0),
        in_channels=ddconfig["in_channels"],
        resolution=ddconfig["resolution"],
        z_channels=ddconfig["z_channels"],
        double_z=ddconfig.get("double_z", True),
    )


class Encoder(nn.Module):
    """256x256x3 -> 16x16x(2*z_channels) conv encoder (ref shape comments at
    src/models/autoencoder.py:176-182)."""

    ddconfig: Dict[str, Any]
    dtype: Any = jnp.float32
    fuse: bool = False  # fused gn+conv kernels (forward-only paths)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = _parse_ddconfig(self.ddconfig)
        ch, ch_mult = cfg["ch"], cfg["ch_mult"]
        num_levels = len(ch_mult)
        in_ch_mult = (1,) + ch_mult
        curr_res = cfg["resolution"]

        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        for i_level in range(num_levels):
            block_out = ch * ch_mult[i_level]
            for i_block in range(cfg["num_res_blocks"]):
                h = ResnetBlock(
                    block_out,
                    dropout=cfg["dropout"],
                    dtype=self.dtype,
                    fuse=self.fuse,
                    name=f"down_{i_level}_block_{i_block}",
                )(h, deterministic=deterministic)
                if curr_res in cfg["attn_resolutions"]:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_levels - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock(h.shape[-1], dropout=cfg["dropout"], dtype=self.dtype, fuse=self.fuse, name="mid_block_1")(
            h, deterministic=deterministic
        )
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dropout=cfg["dropout"], dtype=self.dtype, fuse=self.fuse, name="mid_block_2")(
            h, deterministic=deterministic
        )

        h = GroupNormSiLU(name="norm_out")(h)
        out_c = 2 * cfg["z_channels"] if cfg["double_z"] else cfg["z_channels"]
        return nn.Conv(out_c, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """16x16xz_channels -> 256x256xout_ch conv decoder; can return the
    pre-``conv_out`` activations for the adaptive GAN weight
    (ref contperceptual.py:294-304 uses grads wrt ``decoder.conv_out.weight``).
    """

    ddconfig: Dict[str, Any]
    dtype: Any = jnp.float32
    fuse: bool = False  # fused gn+conv kernels (forward-only paths)

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        *,
        deterministic: bool = True,
        return_pre_out: bool = False,
    ):
        cfg = _parse_ddconfig(self.ddconfig)
        ch, ch_mult = cfg["ch"], cfg["ch_mult"]
        num_levels = len(ch_mult)
        curr_res = cfg["resolution"] // 2 ** (num_levels - 1)
        block_in = ch * ch_mult[-1]

        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype)
        )
        h = ResnetBlock(block_in, dropout=cfg["dropout"], dtype=self.dtype, fuse=self.fuse, name="mid_block_1")(
            h, deterministic=deterministic
        )
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dropout=cfg["dropout"], dtype=self.dtype, fuse=self.fuse, name="mid_block_2")(
            h, deterministic=deterministic
        )

        for i_level in reversed(range(num_levels)):
            block_out = ch * ch_mult[i_level]
            for i_block in range(cfg["num_res_blocks"] + 1):
                h = ResnetBlock(
                    block_out,
                    dropout=cfg["dropout"],
                    dtype=self.dtype,
                    fuse=self.fuse,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, deterministic=deterministic)
                if curr_res in cfg["attn_resolutions"]:
                    h = AttnBlock(dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        a = GroupNormSiLU(name="norm_out")(h)
        out = nn.Conv(
            cfg["out_ch"], (3, 3), padding="SAME", dtype=self.dtype, name="conv_out"
        )(a)
        out = out.astype(jnp.float32)
        if return_pre_out:
            return out, a
        return out

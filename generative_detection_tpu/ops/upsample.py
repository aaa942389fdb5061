"""Subpixel (phase-decomposed) nearest-upsample + 3x3 conv.

The ldm decoder upsamples by nearest-2x and then runs a 3x3 SAME conv
(ref: /root/reference/src/modules/diffusionmodules/model.py Upsample —
``interpolate(scale_factor=2, mode="nearest")`` then ``conv2d(3x3)``).
Computing the conv on the duplicated pixels does 9 MACs per output pixel
even though each output only sees a 2x2 window of *distinct* input
pixels. Algebraically the op factors exactly into four phase kernels:

  out[2i+a, 2j+b] = sum_{u,v in {0,1}} P[a,b][u,v] . x[i-1+a+u... ]

where each 2x2 ``P[a,b]`` is a tap-sum of the 3x3 kernel K. Derivation
(rows; columns identical). With u[r] = x[floor(r/2)] and
o[r] = K0.u[r-1] + K1.u[r] + K2.u[r+1]:

  r = 2i:   u rows {2i-1, 2i, 2i+1} -> x rows {i-1, i, i}
            o[2i]   = K0 . x[i-1] + (K1 + K2) . x[i]
  r = 2i+1: u rows {2i, 2i+1, 2i+2} -> x rows {i, i, i+1}
            o[2i+1] = (K0 + K1) . x[i] + K2 . x[i+1]

SAME zero-padding at the upsampled size corresponds exactly to zero-
padding x by one row/column on every side. All four phases share one
2x2 VALID conv window over the padded input: phase a reads padded rows
(i + a, i + a + 1), so phase (a, b) is the (i + a, j + b) slice of a
single 2x2 conv with 4C output channels.

FLOPs: (H+1)(W+1) . 4 . Cin . Cout . 4  vs  (2H)(2W) . 9 . Cin . Cout
— a 2.23x reduction, paid for with one depth-to-space interleave that
XLA fuses into the conv epilogue. Numerics: identical math up to float
associativity (tap sums happen in the fp32 param dtype BEFORE the bf16
cast, so the phase kernels are at least as accurate as casting each tap
separately); exact-equivalence tested in fp32 against the reference
formulation (tests/test_subpixel_upsample.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (2, 2, Cin, 4*Cout) phase-decomposed kernel.

    Output-channel groups are ordered [P00, P01, P10, P11] where Pab is
    the kernel producing output phase (row parity a, col parity b). Tap
    sums are computed in the kernel's own dtype (fp32 params) before any
    downstream cast.
    """
    k0, k1, k2 = kernel[0], kernel[1], kernel[2]  # rows: (3, Cin, Cout)
    r0 = jnp.stack([k0, k1 + k2], axis=0)  # phase a=0: x rows (i-1, i)
    r1 = jnp.stack([k0 + k1, k2], axis=0)  # phase a=1: x rows (i, i+1)

    def cols(m):
        c0 = jnp.stack([m[:, 0], m[:, 1] + m[:, 2]], axis=1)
        c1 = jnp.stack([m[:, 0] + m[:, 1], m[:, 2]], axis=1)
        return c0, c1

    p00, p01 = cols(r0)
    p10, p11 = cols(r1)
    return jnp.concatenate([p00, p01, p10, p11], axis=-1)  # (2,2,Cin,4Cout)


def subpixel_upsample_conv(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """nearest-2x upsample + 3x3 SAME conv, computed at the LOW resolution.

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout) (the stored 3x3 conv
    parameter — unchanged checkpoint layout); bias: (Cout,).
    Returns (B, 2H, 2W, Cout).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    w4 = phase_kernel(kernel).astype(dtype)
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp,
        w4,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+1, W+1, 4*Cout)
    p00 = y[:, :-1, :-1, 0 * cout : 1 * cout]
    p01 = y[:, :-1, 1:, 1 * cout : 2 * cout]
    p10 = y[:, 1:, :-1, 2 * cout : 3 * cout]
    p11 = y[:, 1:, 1:, 3 * cout : 4 * cout]
    # depth-to-space: out[2i+a, 2j+b] = phase(a, b)[i, j]
    arr = jnp.stack([p00, p01, p10, p11], axis=-2)  # (B, H, W, 4, Cout)
    arr = arr.reshape(b, h, w, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    out = arr.reshape(b, 2 * h, 2 * w, cout)
    return out + bias.astype(dtype)


def reference_upsample_conv(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """The direct formulation: nearest-2x repeat then 3x3 SAME conv."""
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2).astype(dtype)
    y = lax.conv_general_dilated(
        up,
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)

"""Winograd F(2x2, 3x3) convolution — 4/9 the MACs of direct 3x3 conv.

The step profile (docs/BENCH.md round 4) is conv-bound: the 3x3 stride-1
SAME convs of the backbone run at ~84% MXU and dominate the 212 ms step.
Winograd's minimal filtering algorithm computes each 2x2 output tile from
a 4x4 input tile with 16 elementwise multiplies instead of 36:

    Y = A^T [ (G g G^T) (.) (B^T d B) ] A

per tile, which batched over (tiles x channels) becomes sixteen
independent (M, Cin) x (Cin, Cout) GEMMs on the MXU plus cheap VPU
add/sub transforms. FLOP count per output pixel: 16/4 . Cin . Cout MACs
vs 9 . Cin . Cout direct — a 2.25x reduction. The transform matrices are
exact in exact arithmetic (entries in {0, +-1, +-0.5}); fp32 equivalence
vs ``lax.conv_general_dilated`` is pinned in tests/test_winograd.py.

This is the PURE-XLA formulation: tile extraction via four strided
slices per axis, transforms as unrolled adds, the batched GEMM as one
einsum. It round-trips the transformed activations through HBM, so its
measured verdict vs XLA's direct conv (at the bandwidth/MXU ratio of
this chip) decides whether a Pallas kernel that keeps V/M in VMEM is
worth building. Opt-in via ``GDT_WINOGRAD=1`` on the backbone's
``Conv3x3`` (stride-1 SAME shapes only); bf16 note: products accumulate
in fp32 via ``preferred_element_type``, transform adds run in the
compute dtype.

Reference workload anchor: the flagship ddconfig
(/root/reference/configs/autoencoder/pose/autoencoder_kl_16x16x16.yaml:55-65)
whose 256^2/128^2 ResnetBlock convs are the hot shapes.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
from jax import lax

# B^T (4x4): input transform; G (4x3): kernel transform; A^T (2x4): output.
_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def transform_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (4, 4, Cin, Cout): U = G g G^T, in fp32."""
    return jnp.einsum(
        "au,bv,uvio->abio", _G, _G, kernel.astype(jnp.float32), precision="highest"
    )


def winograd_conv3x3(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None, dtype=jnp.float32
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv via Winograd F(2x2, 3x3). H and W must be even
    (true for every backbone feature map). Returns (N, H, W, Cout)."""
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % 2 == 0 and w % 2 == 0, "Winograd tiling needs even H, W"
    th, tw = h // 2, w // 2

    u = transform_kernel(kernel).astype(dtype)  # (4,4,Cin,Cout)
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))

    # d[a][b]: (N, th, tw, C) — the (a, b) element of every 4x4 tile.
    d = [
        [xp[:, a : a + 2 * th : 2, b : b + 2 * tw : 2, :] for b in range(4)]
        for a in range(4)
    ]

    # V = B^T d B, unrolled (entries of B^T are 0/+-1: pure adds).
    def bt_rows(col):
        return (
            col[0] - col[2],
            col[1] + col[2],
            col[2] - col[1],
            col[1] - col[3],
        )

    cols = [bt_rows([d[u_][b] for u_ in range(4)]) for b in range(4)]  # [b][a]
    v = [[None] * 4 for _ in range(4)]
    for a in range(4):
        row = [cols[b][a] for b in range(4)]
        r0, r1, r2, r3 = bt_rows(row)
        v[a][0], v[a][1], v[a][2], v[a][3] = r0, r1, r2, r3

    # M[a][b] = V[a][b] @ U[a][b] over Cin — sixteen MXU GEMMs.
    vs = jnp.stack([jnp.stack(v[a], axis=0) for a in range(4)], axis=0)
    m = jnp.einsum(
        "abnhwc,abco->abnhwo", vs, u, preferred_element_type=jnp.float32
    )  # (4,4,N,th,tw,Cout) fp32
    # GDT_WINOGRAD_CAST=1 runs the output transform in the compute dtype —
    # 4x fewer transform bytes if XLA materializes M, slightly more rounding
    # (the MXU accumulation above stays fp32 either way).
    if os.environ.get("GDT_WINOGRAD_CAST", "0") == "1":
        m = m.astype(dtype)

    # Y = A^T M A, unrolled (entries 0/+-1).
    def at_rows(col):
        return (col[0] + col[1] + col[2], col[1] - col[2] - col[3])

    ycols = [at_rows([m[u_, b] for u_ in range(4)]) for b in range(4)]  # [b][i]
    yout = [[None] * 2 for _ in range(2)]
    for i in range(2):
        row = [ycols[b][i] for b in range(4)]
        yout[i][0], yout[i][1] = at_rows(row)

    # Interleave 2x2 output phases: out[2t+i, 2s+j] = Y[i][j][t, s].
    arr = jnp.stack(
        [yout[0][0], yout[0][1], yout[1][0], yout[1][1]], axis=-2
    )  # (N,th,tw,4,Cout)
    arr = arr.reshape(n, th, tw, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    out = arr.reshape(n, h, w, cout).astype(dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def direct_conv3x3(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None, dtype=jnp.float32
) -> jnp.ndarray:
    """Reference: XLA's native 3x3 stride-1 SAME conv."""
    y = lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y

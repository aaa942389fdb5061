"""Pallas row-Winograd 3x3 conv: F(2,3) along H, direct along W — 2/3 the MACs.

Why this shape of kernel:

- The full 2-D Winograd F(2x2,3x3) (``ops.winograd`` — 4/9 MACs) needs a
  stride-2 de-interleave of image COLUMNS. Columns live on the sublane axis
  in VMEM, and Mosaic lowers sublane-strided reads as relayout copies (see
  ops/fused_conv.py's misalignment notes) — measured on this chip, the extra
  traffic cancels the FLOP saving (docs/BENCH.md round 4). The pure-XLA 2-D
  formulation round-trips a 4x-size transformed tensor through HBM instead.
- Applying Winograd along ROWS only requires picking alternating (W, C)
  row planes — a free major-dim slice of a register value — and keeps the
  column direction on the proven masked-``pltpu.roll`` result-shift scheme
  from ops/fused_conv.py. MAC count: 4 row-points x 3 column taps of
  half-height matmuls = 12 x (H/2 . W) vs direct 9 x (H . W): a 1.5x
  multiply reduction with zero layout hazards.

Math (rows; columns stay a direct 3-tap conv):

  V_a[t]   = sum_u BT[a, u] . z[2t + u - 1]          (4 adds: BT rows have
  U[a, dx] = sum_ky G[a, ky] . K[ky, dx]              two +-1 entries each)
  G_a      = sum_dx shift_dx(V_a @ U[a, dx])          (MXU, fp32 accum)
  out[2t]   = G_0 + G_1 + G_2
  out[2t+1] = G_1 - G_2 - G_3

with BT/G/AT the F(2,3) matrices (entries {0, +-1, +-0.5}; exact in exact
arithmetic). The backward reuses the SAME kernel for dz (a stride-1 SAME
3x3 dgrad is a 3x3 conv with the spatially-rotated, io-swapped kernel) and
XLA's native weight-grad conv via ``jax.linear_transpose`` (conv is linear
in the kernel), so every pass gets either the MAC cut or XLA's tuned path.

Grid/data movement: one program per (batch, row-tile); body rows plus one
halo row DMA'd HBM->VMEM per tile (column-0-aligned); the only HBM write is
the output tile. Equivalence + grad tests (interpret mode on CPU) in
tests/test_winograd.py; on-device A/B recorded in docs/BENCH.md.

Reference workload anchor: the flagship ddconfig convs
(/root/reference/configs/autoencoder/pose/autoencoder_kl_16x16x16.yaml:55-65).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode as _interpret

# F(2,3) 1-D transform matrices.
_G_ROWS = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)

_VMEM_BUDGET = 10 * 1024 * 1024


def transform_kernel_rows(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (4, 3, Cin, Cout): U[a, dx] = sum_ky G[a,ky] K[ky,dx]."""
    return jnp.einsum(
        "ak,kxio->axio", _G_ROWS, kernel.astype(jnp.float32), precision="highest"
    )


def _pick_tile(h: int, w: int, c: int, co: int, itemsize: int):
    """Largest even row-tile TR dividing h with VMEM-provable scratch."""
    for tr in (32, 16, 8, 4, 2):
        if h % tr:
            continue
        zs = (tr + 2) * w * c * itemsize
        u = 12 * c * co * itemsize
        acc = 4 * (tr // 2) * w * co * 4  # four fp32 G_a accumulators
        out = 2 * tr * w * co * itemsize  # double-buffered out block
        if zs + u + acc + out <= _VMEM_BUDGET:
            return tr
    return None


def _rows(val, phase, t2):
    """Alternating rows {start + 2t + phase | t < t2} of a loaded (tr, W, C)
    value — a major-dim slice of its (t2, 2, W, C) view (layout no-op)."""
    return val.reshape(t2, 2, *val.shape[1:])[:, phase]


def _wino_rows_kernel(z_hbm, u_ref, bias_ref, out_ref, zs, sem, *, tr, w, c, co):
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * tr
    n_t = pl.num_programs(1)
    t2 = tr // 2

    body = pltpu.make_async_copy(
        z_hbm.at[bidx, pl.ds(r0, tr)], zs.at[pl.ds(1, tr)], sem.at[0]
    )
    body.start()

    @pl.when(t > 0)
    def _top():
        cp = pltpu.make_async_copy(
            z_hbm.at[bidx, pl.ds(r0 - 1, 1)], zs.at[pl.ds(0, 1)], sem.at[1]
        )
        cp.start()
        cp.wait()

    @pl.when(t == 0)
    def _zt():
        zs[pl.ds(0, 1)] = jnp.zeros((1, w, c), zs.dtype)

    @pl.when(t < n_t - 1)
    def _bot():
        cp = pltpu.make_async_copy(
            z_hbm.at[bidx, pl.ds(r0 + tr, 1)], zs.at[pl.ds(tr + 1, 1)], sem.at[2]
        )
        cp.start()
        cp.wait()

    @pl.when(t == n_t - 1)
    def _zb():
        zs[pl.ds(tr + 1, 1)] = jnp.zeros((1, w, c), zs.dtype)

    body.wait()

    # Row transform: each BT row has exactly two +-1 entries.
    # V_0 = r0 - r2, V_1 = r1 + r2, V_2 = r2 - r1, V_3 = r1 - r3, where
    # r_u = zs rows {2t + u}. Output row (2t + i) of this tile needs zs rows
    # 2t .. 2t+3 (zs row g-r0+1 holds global row g; +1 is the halo offset,
    # and the tile's first output needs global rows r0-1 .. — i.e. zs[0..]).
    # Two aligned tr-row loads (offsets 0 and 2) each yield two of the four
    # row sets r_u = zs rows {2t + u}: u = load_offset + phase.
    m = t2 * w
    lo = zs[pl.ds(0, tr)]
    hi = zs[pl.ds(2, tr)]
    r = [
        _rows(lo, 0, t2).reshape(m, c),
        _rows(lo, 1, t2).reshape(m, c),
        _rows(hi, 0, t2).reshape(m, c),
        _rows(hi, 1, t2).reshape(m, c),
    ]
    v = [r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3]]

    # Column direction: direct 3 taps as tile-wide MXU matmuls; +-1 column
    # shifts applied to the RESULTS via masked rolls (flat index f: adjacent
    # entries are adjacent columns; borders are f % w == 0 / w-1).
    fidx = jax.lax.broadcasted_iota(jnp.int32, (m, co), 0)
    col = jax.lax.rem(fidx, w)
    g = []
    for a in range(4):
        qs = [
            jax.lax.dot_general(
                v[a],
                u_ref[3 * a + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for dx in range(3)
        ]
        left = jnp.where(col > 0, pltpu.roll(qs[0], shift=1, axis=0), 0.0)
        right = jnp.where(col < w - 1, pltpu.roll(qs[2], shift=m - 1, axis=0), 0.0)
        g.append(left + qs[1] + right)

    bias = bias_ref[0].astype(jnp.float32)
    o0 = (g[0] + g[1] + g[2] + bias[None, :]).reshape(t2, 1, w, co)
    o1 = (g[1] - g[2] - g[3] + bias[None, :]).reshape(t2, 1, w, co)
    out = jnp.concatenate([o0, o1], axis=1).reshape(tr, w, co)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tr", "interpret"))
def _wino_rows_pallas(z, u12, bias, tr, interpret=False):
    bsz, h, wd, c = z.shape
    co = u12.shape[-1]
    kernel = functools.partial(_wino_rows_kernel, tr=tr, w=wd, c=c, co=co)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, co), z.dtype),
        grid=(bsz, h // tr),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # z in HBM; manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U (12, C, CO)
            pl.BlockSpec((1, co), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, wd, co), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + 2, wd, c), z.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(z, u12, bias)


def _direct(z, kernel, dtype):
    return lax.conv_general_dilated(
        z.astype(dtype),
        kernel.astype(dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def wino_rows_eligible(shape, cout, dtype) -> bool:
    n, h, w, c = shape
    if h % 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if not _interpret() and (c % 128 or cout % 128):
        return False
    return _pick_tile(h, w, c, cout, itemsize) is not None


def _fwd_impl(z, kernel, bias, dtype):
    n, h, w, c = z.shape
    co = kernel.shape[-1]
    tr = _pick_tile(h, w, c, co, jnp.dtype(dtype).itemsize)
    u12 = transform_kernel_rows(kernel).astype(dtype).reshape(12, c, co)
    b = (jnp.zeros((co,), jnp.float32) if bias is None else bias).astype(jnp.float32)
    return _wino_rows_pallas(
        z.astype(dtype), u12, b.reshape(1, co), tr, interpret=_interpret()
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def wino_rows_conv3x3(z, kernel, bias, dtype=jnp.float32):
    """3x3 stride-1 SAME conv via the row-Winograd Pallas kernel.

    z: (N, H, W, Cin) with H even; kernel: (3, 3, Cin, Cout); bias: (Cout,)
    or None. Gradients: dz through the same kernel (rotated weights), dW via
    XLA's native weight-grad conv, db by reduction.
    """
    return _fwd_impl(z, kernel, bias, dtype)


def _wino_fwd(z, kernel, bias, dtype):
    return _fwd_impl(z, kernel, bias, dtype), (z, kernel, bias is None)


def _wino_bwd(dtype, res, dy):
    z, kernel, no_bias = res
    # dgrad: SAME 3x3 dz = conv(dy, rot180(K) with in/out channels swapped).
    k_rot = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
    dz = _fwd_impl(dy, k_rot, None, dtype).astype(z.dtype)
    # wgrad: conv is linear in K — transpose XLA's native conv (no forward
    # evaluation; this IS the tuned weight-grad convolution).
    dk = jax.linear_transpose(lambda kk: _direct(z, kk, dtype), kernel)(
        dy.astype(dtype)
    )[0].astype(kernel.dtype)
    db = None if no_bias else jnp.sum(dy, axis=(0, 1, 2)).astype(jnp.float32)
    return dz, dk, db


wino_rows_conv3x3.defvjp(_wino_fwd, _wino_bwd)

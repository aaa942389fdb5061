"""Pallas row-Winograd 3x3 conv: F(m,3) along H, direct along W.

Why this shape of kernel:

- The full 2-D Winograd F(2x2,3x3) (``ops.winograd`` — 4/9 MACs) needs a
  stride-2 de-interleave of image COLUMNS. Columns live on the sublane axis
  in VMEM, and Mosaic lowers sublane-strided reads as relayout copies (see
  ops/fused_conv.py's misalignment notes) — and the pure-XLA 2-D
  formulation round-trips a 4x-size transformed tensor through HBM instead.
- Applying Winograd along ROWS only requires picking alternating (W, C)
  row planes — a free major-dim slice of a register value — and keeps the
  column direction on the proven masked-``pltpu.roll`` result-shift scheme
  from ops/fused_conv.py.

Two variants, selected by ``m_out`` (output rows per tile-row):

- F(2,3): 4 row-points x 3 column taps of (H/2)-height matmuls vs direct's
  9 x H — a 1.5x multiply reduction; transform coefficients {0, ±1, ±0.5}.
- F(4,3): 6 row-points x 3 taps of (H/4)-height matmuls — a 2x reduction;
  Lavin-Gray points {0, ±1, ±2, ∞}, coefficients up to ±8 and 1/24 (the
  row transforms accumulate in fp32 before the bf16 MXU cast).

Math (rows; columns stay a direct 3-tap conv):

  V_a[t]   = sum_u BT[a, u] . z[m t + u - 1]
  U[a, dx] = sum_ky G[a, ky] . K[ky, dx]
  G_a      = sum_dx shift_dx(V_a @ U[a, dx])     (MXU, fp32 accumulate)
  out[m t + i] = sum_a AT[i, a] . G_a[t]

The backward reuses the SAME kernel for dz (a stride-1 SAME 3x3 dgrad is a
3x3 conv with the spatially-rotated, io-swapped kernel) and XLA's native
weight-grad conv via ``jax.linear_transpose`` (conv is linear in the
kernel), so every pass gets either the MAC cut or XLA's tuned path.

Grid/data movement: one program per (batch, row-tile); body rows plus one
halo row DMA'd HBM->VMEM per tile (column-0-aligned); the only HBM write is
the output tile. Equivalence + grad tests (interpret mode on CPU) in
tests/test_winograd.py; on-device A/B recorded in docs/BENCH.md.

Reference workload anchor: the flagship ddconfig convs
(/root/reference/configs/autoencoder/pose/autoencoder_kl_16x16x16.yaml:55-65).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode as _interpret

# F(2,3) 1-D transforms.
_BT2 = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G2 = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
_AT2 = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

# F(4,3) 1-D transforms (Lavin & Gray points {0, ±1, ±2, ∞}).
_BT4 = np.array(
    [
        [4, 0, -5, 0, 1, 0],
        [0, -4, -4, 1, 1, 0],
        [0, 4, -4, -1, 1, 0],
        [0, -2, -1, 2, 1, 0],
        [0, 2, -1, -2, 1, 0],
        [0, 4, 0, -5, 0, 1],
    ],
    np.float32,
)
_G4 = np.array(
    [
        [1 / 4, 0, 0],
        [-1 / 6, -1 / 6, -1 / 6],
        [-1 / 6, 1 / 6, -1 / 6],
        [1 / 24, 1 / 12, 1 / 6],
        [1 / 24, -1 / 12, 1 / 6],
        [0, 0, 1],
    ],
    np.float32,
)
_AT4 = np.array(
    [
        [1, 1, 1, 1, 1, 0],
        [0, 1, -1, 2, -2, 0],
        [0, 1, 1, 4, 4, 0],
        [0, 1, -1, 8, -8, 1],
    ],
    np.float32,
)

_MATS = {2: (_BT2, _G2, _AT2), 4: (_BT4, _G4, _AT4)}

_VMEM_BUDGET = 10 * 1024 * 1024


def transform_kernel_rows(kernel: jnp.ndarray, m_out: int = 2) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (m_out+2, 3, Cin, Cout): U[a,dx] = sum G[a,ky] K[ky,dx]."""
    g = _MATS[m_out][1]
    return jnp.einsum("ak,kxio->axio", g, kernel.astype(jnp.float32), precision="highest")


def _pick_tile(h: int, w: int, c: int, co: int, itemsize: int, m_out: int):
    """Largest row-tile TR (multiple of m_out) dividing h that fits VMEM."""
    n_pts = m_out + 2
    for tr in (32, 16, 8, 4, 2):
        if tr % m_out or h % tr:
            continue
        zs = (tr + 2) * w * c * itemsize
        u = 3 * n_pts * c * co * itemsize
        acc = n_pts * (tr // m_out) * w * co * 4  # fp32 G_a accumulators
        out = 2 * tr * w * co * itemsize  # double-buffered out block
        if zs + u + acc + out <= _VMEM_BUDGET:
            return tr
    return None


def _wino_rows_kernel(
    z_hbm, u_ref, bias_ref, a_ref, b_ref, out_ref, zs, sem, *, tr, w, c, co,
    m_out, fuse_gn
):
    bt, _, at = _MATS[m_out]
    n_pts = m_out + 2
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * tr
    n_t = pl.num_programs(1)
    tm = tr // m_out

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

    @pl.when(t < n_t - 1)
    def _bot():
        cp = pltpu.make_async_copy(
            z_hbm.at[bidx, pl.ds(r0 + tr, 1)], zs.at[pl.ds(tr + 1, 1)], sem.at[2]
        )
        cp.start()
        cp.wait()

    body.wait()

    if fuse_gn:
        # GroupNorm+SiLU applied in VMEM right after the DMA: the halo rows
        # are raw-x rows of the SAME image, so the per-(batch, channel)
        # affine covers all tr+2(+pad) rows. Border/pad rows are zeroed
        # AFTER the activation (the affine of a zero row is silu(b) != 0;
        # never-DMA'd rows hold garbage until this overwrite).
        a = a_ref[0, 0].astype(jnp.float32)
        b = b_ref[0, 0].astype(jnp.float32)
        zf = zs[:].astype(jnp.float32) * a + b
        zs[:] = (zf * jax.nn.sigmoid(zf)).astype(zs.dtype)

    @pl.when(t == 0)
    def _zt():
        zs[pl.ds(0, 1)] = jnp.zeros((1, w, c), zs.dtype)

    @pl.when(t == n_t - 1)
    def _zb():
        zs[pl.ds(tr + 1, 1)] = jnp.zeros((1, w, c), zs.dtype)

    # The hi load below reads tr rows from offset m_out; for m_out > 2 the
    # scratch carries (m_out - 2) pad rows past the bottom halo that are
    # never DMA'd — zero them so the over-read stays defined (their values
    # are sliced away: only phases 0..1 of hi are consumed).
    if m_out > 2:
        zs[pl.ds(tr + 2, m_out - 2)] = jnp.zeros((m_out - 2, w, c), zs.dtype)

    # Row sets r_u = zs rows {m_out t + u | t < tm}, u = 0 .. m_out+1.
    # Output row (m_out t + i) of this tile needs zs rows m_out t .. +m_out+1
    # (zs row g - r0 + 1 holds global row g). Two aligned tr-row loads
    # (offsets 0 and m_out) each expose m_out phases as free major-dim
    # slices of their (tm, m_out, W, C) views.
    m = tm * w
    lo = zs[pl.ds(0, tr)].reshape(tm, m_out, w, c)
    hi = zs[pl.ds(m_out, tr)].reshape(tm, m_out, w, c)
    r = [
        (lo[:, u] if u < m_out else hi[:, u - m_out]).reshape(m, c)
        for u in range(n_pts)
    ]

    # V_a = sum_u BT[a, u] r_u — F(2,3) coefficients are ±1 (dtype adds);
    # F(4,3) reaches ±5, so accumulate in fp32 before the MXU cast.
    if m_out == 2:
        v = [r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3]]
    else:
        rf = [x.astype(jnp.float32) for x in r]
        v = []
        for a in range(n_pts):
            acc = None
            for u in range(n_pts):
                cf = float(bt[a, u])
                if cf == 0.0:
                    continue
                term = rf[u] if cf == 1.0 else rf[u] * cf
                acc = term if acc is None else acc + term
            v.append(acc.astype(zs.dtype))

    # Column direction: direct 3 taps as tile-wide MXU matmuls; ±1 column
    # shifts applied to the RESULTS via masked rolls (flat index f: adjacent
    # entries are adjacent columns; borders are f % w == 0 / w-1).
    fidx = jax.lax.broadcasted_iota(jnp.int32, (m, co), 0)
    col = jax.lax.rem(fidx, w)
    g = []
    for a in range(n_pts):
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

    # out[m_out t + i] = sum_a AT[i, a] G_a[t]  (integer coefficients, fp32).
    bias = bias_ref[0].astype(jnp.float32)
    phases = []
    for i in range(m_out):
        acc = None
        for a in range(n_pts):
            cf = float(at[i, a])
            if cf == 0.0:
                continue
            term = g[a] if cf == 1.0 else g[a] * cf
            acc = term if acc is None else acc + term
        phases.append((acc + bias[None, :]).reshape(tm, 1, w, co))
    out = jnp.concatenate(phases, axis=1).reshape(tr, w, co)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tr", "m_out", "fuse_gn", "interpret"))
def _wino_rows_pallas(z, u3n, bias, a, b, tr, m_out, fuse_gn=False, interpret=False):
    bsz, h, wd, c = z.shape
    co = u3n.shape[-1]
    kernel = functools.partial(
        _wino_rows_kernel, tr=tr, w=wd, c=c, co=co, m_out=m_out, fuse_gn=fuse_gn
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, co), z.dtype),
        grid=(bsz, h // tr),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # z in HBM; manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U (3*(m_out+2), C, CO)
            pl.BlockSpec((1, co), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            # per-(batch, channel) GN affine (fp32); (1, 1) dummies unfused
            pl.BlockSpec(
                (1, 1, a.shape[-1]), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, b.shape[-1]), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, wd, co), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + max(2, m_out), wd, c), z.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(z, u3n, bias, a, b)


def _wino_wgrad_kernel(
    z_hbm, dy_hbm, a_ref, b_ref, du_ref, zs, ds, sem, *, tr, w, c, co, m_out,
    fuse_gn
):
    """dU[a, dx] = sum_tiles shift_{dx-1}(V_a(z))^T @ dM_a(dy), accumulated
    across the (sequential) TPU grid into the VMEM-resident output block.

    The forward computes out[f] = sum_dx (V_a @ U[a,dx])[f - (dx-1)], so the
    cotangent of U is the masked (dx-1)-shifted V against the AT-transposed
    dy phases dM_a = sum_i AT[i, a] dy[m_out t + i]. With fuse_gn the z
    input is the RAW pre-norm x and the GroupNorm+SiLU activation is
    recomputed in VMEM from the per-(batch, channel) affine — the fused
    forward never materialized z, and this avoids an XLA recompute pass."""
    bt, _, at = _MATS[m_out]
    n_pts = m_out + 2
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * tr
    n_t = pl.num_programs(1)
    tm = tr // m_out

    body = pltpu.make_async_copy(
        z_hbm.at[bidx, pl.ds(r0, tr)], zs.at[pl.ds(1, tr)], sem.at[0]
    )
    body.start()
    dyc = pltpu.make_async_copy(dy_hbm.at[bidx, pl.ds(r0, tr)], ds, sem.at[3])
    dyc.start()

    @pl.when(t > 0)
    def _top():
        cp = pltpu.make_async_copy(
            z_hbm.at[bidx, pl.ds(r0 - 1, 1)], zs.at[pl.ds(0, 1)], sem.at[1]
        )
        cp.start()
        cp.wait()

    @pl.when(t < n_t - 1)
    def _bot():
        cp = pltpu.make_async_copy(
            z_hbm.at[bidx, pl.ds(r0 + tr, 1)], zs.at[pl.ds(tr + 1, 1)], sem.at[2]
        )
        cp.start()
        cp.wait()

    body.wait()

    if fuse_gn:
        # Same ordering rule as the fused forward: activation first (halo
        # rows are same-image raw-x rows), borders zeroed after.
        a = a_ref[0, 0].astype(jnp.float32)
        b = b_ref[0, 0].astype(jnp.float32)
        zf = zs[:].astype(jnp.float32) * a + b
        zs[:] = (zf * jax.nn.sigmoid(zf)).astype(zs.dtype)

    @pl.when(t == 0)
    def _zt():
        zs[pl.ds(0, 1)] = jnp.zeros((1, w, c), zs.dtype)

    @pl.when(t == n_t - 1)
    def _zb():
        zs[pl.ds(tr + 1, 1)] = jnp.zeros((1, w, c), zs.dtype)

    if m_out > 2:
        zs[pl.ds(tr + 2, m_out - 2)] = jnp.zeros((m_out - 2, w, c), zs.dtype)

    dyc.wait()

    m = tm * w
    lo = zs[pl.ds(0, tr)].reshape(tm, m_out, w, c)
    hi = zs[pl.ds(m_out, tr)].reshape(tm, m_out, w, c)
    r = [
        (lo[:, u] if u < m_out else hi[:, u - m_out]).reshape(m, c)
        for u in range(n_pts)
    ]
    if m_out == 2:
        v = [r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3]]
    else:
        rf = [x.astype(jnp.float32) for x in r]
        v = []
        for a in range(n_pts):
            acc = None
            for u in range(n_pts):
                cf = float(bt[a, u])
                if cf == 0.0:
                    continue
                term = rf[u] if cf == 1.0 else rf[u] * cf
                acc = term if acc is None else acc + term
            v.append(acc.astype(zs.dtype))

    # dM_a = sum_i AT[i, a] dy_phase_i (integer coefficients).
    dphase = [ds[:].reshape(tm, m_out, w, co)[:, i].reshape(m, co) for i in range(m_out)]
    dm = []
    for a in range(n_pts):
        acc = None
        for i in range(m_out):
            cf = float(at[i, a])
            if cf == 0.0:
                continue
            term = dphase[i] if cf == 1.0 else dphase[i] * cf
            acc = term if acc is None else acc + term
        dm.append(acc)

    fcol = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (m, c), 0), w)
    zero = jnp.zeros((), zs.dtype)
    upd = []
    for a in range(n_pts):
        # Mosaic only lowers rotates on 32-bit lanes ("Rotate with non-32-bit
        # data" is unimplemented), so roll in f32 and cast back for the MXU.
        vf = v[a].astype(jnp.float32)
        shifted = [
            jnp.where(
                fcol > 0, pltpu.roll(vf, shift=1, axis=0).astype(zs.dtype), zero
            ),
            v[a],
            jnp.where(
                fcol < w - 1,
                pltpu.roll(vf, shift=m - 1, axis=0).astype(zs.dtype),
                zero,
            ),
        ]
        for dx in range(3):
            upd.append(
                jax.lax.dot_general(
                    shifted[dx],
                    dm[a].astype(zs.dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    du = jnp.stack(upd, axis=0)  # (3 * n_pts, C, CO) fp32

    first = jnp.logical_and(bidx == 0, t == 0)

    @pl.when(first)
    def _init():
        du_ref[...] = du

    @pl.when(jnp.logical_not(first))
    def _acc():
        du_ref[...] += du


@functools.partial(jax.jit, static_argnames=("tr", "m_out", "fuse_gn", "interpret"))
def _wino_wgrad_pallas(z, dy, a, b, tr, m_out, fuse_gn=False, interpret=False):
    bsz, h, wd, c = z.shape
    co = dy.shape[-1]
    n_pts = m_out + 2
    kernel = functools.partial(
        _wino_wgrad_kernel, tr=tr, w=wd, c=c, co=co, m_out=m_out, fuse_gn=fuse_gn
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3 * n_pts, c, co), jnp.float32),
        grid=(bsz, h // tr),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, a.shape[-1]), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, b.shape[-1]), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3 * n_pts, c, co), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + max(2, m_out), wd, c), z.dtype),
            pltpu.VMEM((tr, wd, co), dy.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(z, dy, a, b)


def _wgrad_tile(h, w, c, co, itemsize, m_out):
    """Row tile for the wgrad kernel (adds the dy block + fp32 dU to VMEM)."""
    n_pts = m_out + 2
    for tr in (32, 16, 8, 4, 2):
        if tr % m_out or h % tr:
            continue
        zs = (tr + max(2, m_out)) * w * c * itemsize
        dsz = tr * w * co * itemsize
        du = 3 * n_pts * c * co * 4
        work = n_pts * (tr // m_out) * w * max(c, co) * 4 * 2  # V/dM temps
        if zs + dsz + du + work <= _VMEM_BUDGET:
            return tr
    return None


def wino_wgrad(z, dy, dtype, m_out: int = 2, gn_ab=None):
    """Winograd weight gradient: dK[ky,kx] = sum_a G[a,ky] dU[a,kx].

    With ``gn_ab=(a, b)`` (per-(batch, channel) fp32 GN affines), ``z`` is the
    raw pre-norm input and the kernel recomputes silu(z*a+b) in VMEM."""
    n, h, w, c = z.shape
    co = dy.shape[-1]
    tr = _wgrad_tile(h, w, c, co, jnp.dtype(dtype).itemsize, m_out)
    if tr is None:
        raise ValueError(
            f"no VMEM-provable wgrad tile for {z.shape}x{dy.shape} m_out={m_out}"
        )
    fuse_gn = gn_ab is not None
    if fuse_gn:
        a, b = (v.astype(jnp.float32).reshape(n, 1, c) for v in gn_ab)
    else:
        a = b = jnp.zeros((n, 1, 1), jnp.float32)
    du = _wino_wgrad_pallas(
        z.astype(dtype), dy.astype(dtype), a, b, tr, m_out,
        fuse_gn=fuse_gn, interpret=_interpret(),
    )
    n_pts = m_out + 2
    g = _MATS[m_out][1]
    return jnp.einsum(
        "ak,axio->kxio",
        g,
        du.reshape(n_pts, 3, c, co),
        precision="highest",
    )


def _direct(z, kernel, dtype):
    return lax.conv_general_dilated(
        z.astype(dtype),
        kernel.astype(dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def wino_rows_eligible(shape, cout, dtype, m_out: int = 2) -> bool:
    from .dispatch import pallas_enabled

    n, h, w, c = shape
    if h % m_out:
        return False
    if not _interpret():
        if c % 128 or cout % 128:
            return False
        if not pallas_enabled():  # probe/backend gate with XLA fallback
            return False
    return _pick_tile(h, w, c, cout, jnp.dtype(dtype).itemsize, m_out) is not None


def _fwd_impl(z, kernel, bias, dtype, m_out, gn_ab=None):
    n, h, w, c = z.shape
    co = kernel.shape[-1]
    tr = _pick_tile(h, w, c, co, jnp.dtype(dtype).itemsize, m_out)
    if tr is None:
        raise ValueError(
            f"no VMEM-provable row tile for shape {z.shape}->{co} with "
            f"m_out={m_out}; gate calls on wino_rows_eligible()"
        )
    n_pts = m_out + 2
    u = transform_kernel_rows(kernel, m_out).astype(dtype).reshape(3 * n_pts, c, co)
    b = (jnp.zeros((co,), jnp.float32) if bias is None else bias).astype(jnp.float32)
    fuse_gn = gn_ab is not None
    if fuse_gn:
        ga, gb = (v.astype(jnp.float32).reshape(n, 1, c) for v in gn_ab)
    else:
        ga = gb = jnp.zeros((n, 1, 1), jnp.float32)
    return _wino_rows_pallas(
        z.astype(dtype), u, b.reshape(1, co), ga, gb, tr, m_out,
        fuse_gn=fuse_gn, interpret=_interpret(),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def wino_rows_conv3x3(z, kernel, bias, dtype=jnp.float32, m_out: int = 2):
    """3x3 stride-1 SAME conv via the row-Winograd Pallas kernel.

    z: (N, H, W, Cin) with H % m_out == 0; kernel: (3, 3, Cin, Cout); bias:
    (Cout,) or None; m_out: 2 (F(2,3), 1.5x MAC cut) or 4 (F(4,3), 2x).
    Gradients: dz through the same kernel (rotated weights), dW via XLA's
    native weight-grad conv, db by reduction.
    """
    return _fwd_impl(z, kernel, bias, dtype, m_out)


def _wino_fwd(z, kernel, bias, dtype, m_out):
    return _fwd_impl(z, kernel, bias, dtype, m_out), (z, kernel, bias is None)


def _wino_bwd(dtype, m_out, res, dy):
    z, kernel, no_bias = res
    # dgrad: SAME 3x3 dz = conv(dy, rot180(K) with in/out channels swapped).
    # The swapped channel order means the dgrad tile is _pick_tile(h, w,
    # cout, cin) — NOT the forward tile wino_rows_eligible() proved. For
    # asymmetric convs whose swapped tile doesn't fit VMEM, fall back to
    # XLA's direct dgrad instead of raising mid-backward (the forward keeps
    # its Winograd win either way).
    k_rot = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
    if _pick_tile(
        dy.shape[1], dy.shape[2], dy.shape[3], k_rot.shape[-1],
        jnp.dtype(dtype).itemsize, m_out,
    ) is not None:
        dz = _fwd_impl(dy, k_rot, None, dtype, m_out).astype(z.dtype)
    else:
        dz = _direct(dy, k_rot, dtype).astype(z.dtype)
    # wgrad: the in-kernel Winograd accumulation when a tile fits, else
    # XLA's native weight-grad conv (transpose of the conv, which is linear
    # in K — no forward evaluation).
    use_kernel = os.environ.get("GDT_WINOGRAD_WGRAD", "pallas") == "pallas" and (
        _wgrad_tile(
            z.shape[1], z.shape[2], z.shape[3], dy.shape[-1],
            jnp.dtype(dtype).itemsize, m_out,
        )
        is not None
    )
    if use_kernel:
        dk = wino_wgrad(z, dy, dtype, m_out).astype(kernel.dtype)
    else:
        dk = jax.linear_transpose(lambda kk: _direct(z, kk, dtype), kernel)(
            dy.astype(dtype)
        )[0].astype(kernel.dtype)
    db = None if no_bias else jnp.sum(dy, axis=(0, 1, 2)).astype(jnp.float32)
    return dz, dk, db


wino_rows_conv3x3.defvjp(_wino_fwd, _wino_bwd)


# ---------------------------------------------------------------------------
# Fused GroupNorm+SiLU -> row-Winograd conv.
#
# Why: the composed full-step A/B (docs/BENCH.md "Winograd conv family")
# showed the plain Winograd kernel LOSING despite isolated mid-band wins,
# because routing the conv through a pallas_call forces the GN+SiLU producer
# chain (which XLA fuses into the direct conv's prologue) to materialize its
# output to HBM. This variant keeps that fusion: the group statistics stay
# one XLA reduction over raw x (free to fuse into the PRODUCING conv's
# epilogue, exactly as the unfused lowering's stats do), and the normalize +
# SiLU runs in VMEM inside the Winograd kernel — forward traffic matches the
# unfused lowering (read x, write out) while the MXU work takes the F(m,3)
# MAC cut. The backward keeps the cut too: dz via the plain Winograd dgrad,
# dW via the fused wgrad kernel (recomputes the activation from x in VMEM),
# and the GN+SiLU pullback of dz in XLA.
# ---------------------------------------------------------------------------


def gn_silu_wino_eligible(shape, cout, dtype, m_out: int = 4, num_groups: int = 32):
    """Whether ``gn_silu_wino_conv3x3`` can take the fused Pallas path."""
    return shape[-1] % num_groups == 0 and wino_rows_eligible(
        shape, cout, dtype, m_out
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def gn_silu_wino_conv3x3(
    x,
    gamma,
    beta,
    kernel,
    bias,
    dtype=jnp.float32,
    m_out: int = 4,
    num_groups: int = 32,
    eps: float = 1e-6,
):
    """GroupNorm(num_groups, eps) -> SiLU -> 3x3 SAME conv, with the conv on
    the row-Winograd Pallas kernel and the normalize fused into its VMEM
    tiles. Semantics match ``ops.fused_conv.gn_silu_conv_reference``.

    Gate calls on ``gn_silu_wino_eligible``; reference anchor: the backbone
    ResnetBlock norm+conv pairs (ldm Encoder/Decoder [EXTERNAL], consumed at
    /root/reference/src/modules/autoencodermodules/feat_encoder.py:1-6).
    """
    from .fused_conv import _gn_affine

    a, b = _gn_affine(x, gamma, beta, num_groups, eps)
    return _fwd_impl(x, kernel, bias, dtype, m_out, gn_ab=(a, b))


def _gn_wino_fwd(x, gamma, beta, kernel, bias, dtype, m_out, num_groups, eps):
    from .fused_conv import _gn_affine

    a, b = _gn_affine(x, gamma, beta, num_groups, eps)
    out = _fwd_impl(x, kernel, bias, dtype, m_out, gn_ab=(a, b))
    return out, (x, gamma, beta, kernel, bias is None, a, b)


def _gn_wino_bwd(dtype, m_out, num_groups, eps, res, dy):
    from .fused_conv import _gn_silu_only, gn_silu_conv_reference

    x, gamma, beta, kernel, no_bias, a, b = res
    bwd_mode = os.environ.get("GDT_WINOGRAD_BWD", "kernel")
    if bwd_mode == "remat":
        # Full-remat backward: vjp of the unfused XLA composite. Keeps only
        # the fused forward; lets composed A/Bs isolate fwd vs bwd costs.
        bias_arg = None if no_bias else jnp.zeros((dy.shape[-1],), jnp.float32)
        _, pull = jax.vjp(
            lambda x_, g_, bt_, k_: gn_silu_conv_reference(
                x_, g_, bt_, k_, bias_arg, num_groups=num_groups, eps=eps
            ),
            x, gamma, beta, kernel,
        )
        dx, dgamma, dbeta, dk = pull(dy)
        db = None if no_bias else jnp.sum(dy, axis=(0, 1, 2)).astype(jnp.float32)
        return dx, dgamma, dbeta, dk, db
    # Cotangent wrt the ACTIVATION z: plain Winograd dgrad (rotated,
    # io-swapped kernel), XLA direct dgrad when the swapped tile doesn't fit
    # VMEM or GDT_WINOGRAD_BWD=xladz routes it off the Pallas kernel.
    k_rot = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
    if bwd_mode != "xladz" and _pick_tile(
        dy.shape[1], dy.shape[2], dy.shape[3], k_rot.shape[-1],
        jnp.dtype(dtype).itemsize, m_out,
    ) is not None:
        dz = _fwd_impl(dy, k_rot, None, dtype, m_out).astype(x.dtype)
    else:
        dz = _direct(dy, k_rot, dtype).astype(x.dtype)
    # Weight grad: the fused wgrad kernel reads RAW x and recomputes the
    # activation in VMEM (no saved z anywhere), else recompute z in XLA.
    use_kernel = os.environ.get("GDT_WINOGRAD_WGRAD", "pallas") == "pallas" and (
        _wgrad_tile(
            x.shape[1], x.shape[2], x.shape[3], dy.shape[-1],
            jnp.dtype(dtype).itemsize, m_out,
        )
        is not None
    )
    if use_kernel:
        dk = wino_wgrad(x, dy, dtype, m_out, gn_ab=(a, b)).astype(kernel.dtype)
    else:
        z = _gn_silu_only(x, gamma, beta, num_groups, eps)
        dk = jax.linear_transpose(lambda kk: _direct(z, kk, dtype), kernel)(
            dy.astype(dtype)
        )[0].astype(kernel.dtype)
    db = None if no_bias else jnp.sum(dy, axis=(0, 1, 2)).astype(jnp.float32)
    # GN+SiLU pullback of dz -> (dx, dgamma, dbeta); XLA fuses the activation
    # recompute into this elementwise+reduction pass.
    _, gn_pull = jax.vjp(
        lambda x_, g_, b_: _gn_silu_only(x_, g_, b_, num_groups, eps),
        x, gamma, beta,
    )
    dx, dgamma, dbeta = gn_pull(dz)
    return dx, dgamma, dbeta, dk, db


gn_silu_wino_conv3x3.defvjp(_gn_wino_fwd, _gn_wino_bwd)

"""Single-head spatial self-attention as a flash-style Pallas kernel.

The backbone's AttnBlocks (ref ddconfig ``attn_resolutions: [16]`` +
mid-blocks; ldm.modules.diffusionmodules.model.AttnBlock [EXTERNAL]) run
single-head attention over flattened spatial tokens: 4096 tokens @ C=256 at
the attn level and 256 tokens @ C=512 in the mid blocks (for 256x256 inputs
under the shipped config). A naive XLA lowering materializes the (L, L)
softmax matrix in HBM (4096^2 fp32 = 64 MB per image per block); the blocked
online-softmax kernel below keeps everything in VMEM.

Semantics (must match torch ``AttnBlock``):
    w = softmax(q @ k^T * C^-0.5); out = w @ v
with q, k, v of shape (B, L, C) and no output scaling.
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

_NEG_INF = -1e30


def _snap_block(l: int, target: int) -> int:
    """Largest multiple of 128 that divides ``l`` and is <= ``target``.

    Every Pallas path here tiles L with ``grid = l // block``; a block that
    does not divide L would silently truncate the grid and leave the tail
    rows of the output UNWRITTEN (uninitialized memory, no error). Callers
    guarantee ``l % 128 == 0`` via the dispatch gate, so 128 always divides;
    targets below 128 (e.g. a GDT_ATTN_BQ=64 sweep value) clamp UP to 128 —
    sub-128 blocks underfill the lane dimension anyway.
    """
    b = max(128, min(target, l) - min(target, l) % 128)
    while l % b:
        b -= 128
    return b


def _attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    c = q.shape[-1]
    scale = jnp.asarray(c, jnp.float32) ** -0.5
    logits = jnp.einsum("blc,bmc->blm", q, k, preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("blm,bmc->blc", w.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, kv_steps):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # (BQ, C)
    k = k_ref[0].astype(jnp.float32)  # (BK, C)
    v = v_ref[0].astype(jnp.float32)  # (BK, C)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK)

    m_prev = m_scr[:]  # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (BQ, BK)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kv_idx == kv_steps - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _attention_pallas(q, k, v, block_q=256, block_k=512, interpret=False):
    b, l, c = q.shape
    block_q = _snap_block(l, block_q)
    block_k = _snap_block(l, block_k)
    scale = float(c) ** -0.5
    grid = (b, l // block_q, l // block_k)
    kernel = functools.partial(_flash_kernel, scale=scale, kv_steps=grid[2])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, c), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b_, i, j: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda b_, i, j: (b_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda b_, i, j: (b_, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, c), lambda b_, i, j: (b_, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, c), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _attention_chunked(q, k, v, chunk: int = 512):
    """Flash-semantics attention in pure XLA: scan over query chunks with
    per-chunk rematerialization, so neither forward nor backward ever holds
    the full (L, L) logits in HBM. The Pallas-free fallback for long token
    counts (the 64x64-resolution blocks) when the Pallas toolchain is
    unavailable. ~1.3x FLOPs of the naive path, far less memory traffic."""
    b, l, c = q.shape
    scale = jnp.asarray(c, jnp.float32) ** -0.5
    nq = l // chunk
    qs = q.reshape(b, nq, chunk, c).transpose(1, 0, 2, 3)  # (nq, B, chunk, C)

    @jax.checkpoint
    def body(q_blk):
        s = jnp.einsum("blc,bmc->blm", q_blk, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(s * scale, axis=-1)
        return jnp.einsum(
            "blm,bmc->blc", w.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(q_blk.dtype)

    out = jax.lax.map(body, qs)  # (nq, B, chunk, C)
    return out.transpose(1, 0, 2, 3).reshape(b, l, c)


# ---------------------------------------------------------------------------
# Custom fwd+bwd flash attention (the round-4 training path).
#
# Why not the library flash_attention kernel (kept below as GDT_ATTN_IMPL=lib):
# two measured costs on the flagship workload (docs/BENCH.md round-4):
#   1. its backward runs TWO passes (dkv then dq), each recomputing the
#      (bq, bk) logits and p — 7 big matmuls per block where 5 suffice;
#   2. its interface replicates logsumexp/di row-statistics across a
#      128-lane minor dim, materializing ~1.8 GB/step of broadcast scratch
#      in HBM (the `broadcast_in_dim` tail in the round-3 profile).
# At this model's shapes (L <= 4096, C <= 512) the whole K/V fits VMEM, so
# the backward can run ONE k-major pass with full-length K/V blocks:
# zero recompute passes, zero in-kernel transposes (everything is phrased in
# (L_k, bq) "transposed" space where the (1, bq) row-stats broadcast along
# sublanes for free), and lse/di stay packed as (B, L).
# ---------------------------------------------------------------------------


def _mha_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    q = q_ref[0]  # (bq, C)
    k = k_ref[0]  # (L, C)
    v = v_ref[0]  # (L, C)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, L)
    m = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)  # (bq, 1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l  # (bq, C)
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = jnp.transpose(m + jnp.log(l))  # (1, bq)


def _mha_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale, q_steps
):
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]    # (bq, C)
    k = k_ref[0]    # (L, C)
    v = v_ref[0]    # (L, C)
    do = do_ref[0]  # (bq, C)
    lse = lse_ref[0]  # (1, bq) — broadcasts over the L_k sublane axis below
    di = di_ref[0]    # (1, bq)

    # (L_k, bq) transposed space: all row-stats broadcasts are free.
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (L, bq)
    p_t = jnp.exp(s_t - lse)
    dv_scr[:] += jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (L, C)
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (L, bq)
    ds_t = (p_t * (dp_t - di) * scale).astype(q.dtype)
    dk_scr[:] += jax.lax.dot_general(
        ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (L, C)
    # dq for this q block: contract ds_t over L_k (MXU handles the
    # transpose). Single kv pass => no accumulation, emit in input dtype.
    dq_ref[0] = jax.lax.dot_general(
        ds_t, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)  # (bq, C)

    @pl.when(qi == q_steps - 1)
    def _emit():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _mha_fwd_call(q, k, v, block_q, interpret):
    b, l, c = q.shape
    bq = min(block_q, l)
    scale = float(c) ** -0.5
    grid = (b, l // bq)
    return pl.pallas_call(
        functools.partial(_mha_fwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, c), q.dtype),
            jax.ShapeDtypeStruct((b, 1, l), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q, k, v)


def _mha_bwd_call(q, k, v, do, lse, di, block_q, interpret):
    b, l, c = q.shape
    bq = min(block_q, l)
    scale = float(c) ** -0.5
    grid = (b, l // bq)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, scale=scale, q_steps=grid[1]),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, c), q.dtype),
            jax.ShapeDtypeStruct((b, l, c), q.dtype),
            jax.ShapeDtypeStruct((b, l, c), q.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((l, c), jnp.float32),
            pltpu.VMEM((l, c), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, di)
    return dq, dk, dv


@functools.lru_cache(maxsize=None)
def _make_attention_custom(block_q: int, interpret: bool):
    @jax.custom_vjp
    def attn(q, k, v):
        o, _ = _mha_fwd_call(q, k, v, block_q, interpret)
        return o

    def fwd(q, k, v):
        o, lse = _mha_fwd_call(q, k, v, block_q, interpret)
        return o, (q, k, v, o, lse)

    def bwd(res, do):
        q, k, v, o, lse = res
        # di = rowsum(do * o): one fused elementwise+reduce in XLA; packed
        # (B, L) — never replicated across lanes in HBM.
        di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[
            :, None, :
        ]
        return _mha_bwd_call(q, k, v, do, lse, di, block_q, interpret)

    attn.defvjp(fwd, bwd)
    return attn


def _attention_custom(q, k, v, interpret=False):
    """Custom-vjp flash attention with full-length K/V blocks (see note
    above). Valid when L*C fits VMEM comfortably — true for every attention
    site in this model family (4096x256 and 256x512). The backward's live
    VMEM holds the full-length K/V blocks plus two (L, C) f32 accumulators
    (~16 MiB fixed at 4096x256) before any (L, bq) intermediates, so the
    kernel needs the scoped-VMEM cap raised to 32 MiB — every entrypoint
    jits the step with ``utils.runtime.step_compiler_options()``, which
    does exactly that on TPU. Block-size sweep at the L=4096 site under the
    32 MiB cap: bq=256 212.2 ms/step vs bq=128 213.2 (bq=512 needs >32 MiB);
    short sequences take the whole length in one block. GDT_ATTN_BQ
    overrides for A/B sweeps."""
    l = q.shape[1]
    env_bq = os.environ.get("GDT_ATTN_BQ")
    if env_bq:
        bq = int(env_bq)
    elif l <= 512:
        bq = l
    elif l <= 4096:
        bq = 256
    else:
        bq = 128
    # snap to a divisor of L: a non-divisor block truncates the grid and
    # leaves tail rows uninitialized (silent corruption)
    bq = _snap_block(l, bq)
    return _make_attention_custom(bq, interpret)(q, k, v)


def _attention_flash_lib(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """jax's production TPU flash-attention kernel (fwd + custom-VJP bwd),
    wrapped for the single-head (B, L, C) case. This is the training path:
    no (L, L) logits ever hit HBM in either direction."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, l, c = q.shape
    # tuned on v5e for the 4096x256 blocks (docs/BENCH.md): block_q beyond
    # 512 fails to compile at d=256 (VMEM); block_k=1024 is ~5% faster than
    # 512 in fwd+bwd. Snapped to divisors of L (non-divisors truncate tiles).
    bq = _snap_block(l, 512)
    bk = _snap_block(l, 1024)
    sizes = BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk,
        block_k_dq=bk,
        block_q_dq=bq,
    )
    out = flash_attention(
        q[:, None], k[:, None], v[:, None],
        sm_scale=float(c) ** -0.5,
        block_sizes=sizes,
    )
    return out[:, 0]


def single_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(C)) v over (B, L, C) single-head tensors."""
    b, l, c = q.shape
    interpret = _interpret()
    if use_pallas is None:
        use_pallas = pallas_enabled()
    if use_pallas and l % 128 == 0 and c % 128 == 0:
        impl = os.environ.get("GDT_ATTN_IMPL", "custom")
        if interpret:  # unit tests exercise the local kernels on CPU
            if impl == "custom":
                return _attention_custom(q, k, v, interpret=True)
            return _attention_pallas(q, k, v, interpret=True)
        # "custom" (default): the one-pass-backward kernel above — measured
        # faster than the library two-pass backward on the flagship step
        # (docs/BENCH.md round 4). "lib": jax's flash_attention.
        if impl == "custom" and l * c * 4 <= 8_388_608:
            return _attention_custom(q, k, v)
        return _attention_flash_lib(q, k, v)
    # Chunked+remat XLA fallback: measured slower than materialized logits up
    # to bs~32 (docs/BENCH.md), so it only engages when the logits would be
    # genuinely large, or when forced via GDT_ATTN_CHUNKED=1.
    force_chunked = os.environ.get("GDT_ATTN_CHUNKED", "0") == "1"
    logits_bytes = b * l * l * 2
    if l >= 2048 and l % 512 == 0 and (force_chunked or logits_bytes > 1_500_000_000):
        return _attention_chunked(q, k, v)
    return _attention_reference(q, k, v)

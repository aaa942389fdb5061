"""Device-side image resize kernels (jit-compiled preprocessing stage).

The reference resizes crops on the host with PIL bilinear/nearest
(ref nuscenes.py:176,189,540). The TPU-native pipeline crops on host (cheap,
bytes-bound) and runs resize/normalize/mask on device inside ``jit`` so the
HBM-resident batch is produced without a host round trip (BASELINE.json "jit
preprocessing" requirement).

Implemented as gather + weighted sums (align_corners=False, PIL/torch
``bilinear`` convention: source coordinate = (i + 0.5) * scale - 0.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) images."""
    h, w = img.shape[-3], img.shape[-2]
    dtype = img.dtype
    x = img.astype(jnp.float32)

    def axis_weights(in_size, out_size):
        scale = in_size / out_size
        coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        coords = jnp.clip(coords, 0.0, in_size - 1.0)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = coords - lo.astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, out_h)
    xlo, xhi, xf = axis_weights(w, out_w)

    top = x[..., ylo, :, :]
    bot = x[..., yhi, :, :]
    rows = top + (bot - top) * yf[:, None, None]
    left = rows[..., :, xlo, :]
    right = rows[..., :, xhi, :]
    out = left + (right - left) * xf[None, :, None]
    return out.astype(dtype)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize of (..., H, W, C) images (PIL NEAREST)."""
    h, w = img.shape[-3], img.shape[-2]
    ys = jnp.clip(
        jnp.floor((jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h)).astype(jnp.int32),
        0,
        h - 1,
    )
    xs = jnp.clip(
        jnp.floor((jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w)).astype(jnp.int32),
        0,
        w - 1,
    )
    return img[..., ys, :, :][..., :, xs, :]

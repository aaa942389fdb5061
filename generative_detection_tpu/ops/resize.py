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


@functools.partial(jax.jit, static_argnames=("out_size",))
def batched_crop_resize(
    frames: jnp.ndarray,  # (B, H, W, C) full camera frames (uint8 or float)
    centers: jnp.ndarray,  # (B, 2) crop centers (x, y) in pixels
    sizes: jnp.ndarray,  # (B,) square crop sizes in pixels (dynamic per sample)
    out_size: int = 256,
) -> jnp.ndarray:
    """Batched square crop + bilinear resize with *per-sample dynamic* crop
    sizes and static output shapes — the jit preprocessing stage feeding the
    encoder (device-side analogue of ref nuscenes.py:90-194's PIL path).

    Out-of-frame source pixels read as 0 (PIL crop semantics). Sampling is
    point-sampled bilinear (align_corners=False); the host/PIL path uses a
    triangle filter on downscale, so values differ slightly on strong
    downscales — both are supported pipelines.
    Returns (B, out_size, out_size, C) float32 in [0, 1] for uint8 inputs.
    """
    h, w = frames.shape[1], frames.shape[2]
    scale = 1.0 / 255.0 if frames.dtype == jnp.uint8 else 1.0
    frames_f = frames.astype(jnp.float32) * scale

    def one(frame, center, size):
        x0 = center[0] - size / 2.0
        y0 = center[1] - size / 2.0
        idx = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (size / out_size) - 0.5
        sx = x0 + idx  # (out,)
        sy = y0 + idx
        x_lo = jnp.floor(sx).astype(jnp.int32)
        y_lo = jnp.floor(sy).astype(jnp.int32)
        fx = sx - x_lo
        fy = sy - y_lo

        # gather the 4 neighbors with explicit OOB masking
        def gather(yi, xi):
            vy = (yi >= 0) & (yi < h)
            vx = (xi >= 0) & (xi < w)
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            vals = frame[yc[:, None], xc[None, :], :]
            mask = (vy[:, None] & vx[None, :]).astype(jnp.float32)[..., None]
            return vals * mask

        tl = gather(y_lo, x_lo)
        tr = gather(y_lo, x_lo + 1)
        bl = gather(y_lo + 1, x_lo)
        br = gather(y_lo + 1, x_lo + 1)
        top = tl + (tr - tl) * fx[None, :, None]
        bot = bl + (br - bl) * fx[None, :, None]
        return top + (bot - top) * fy[:, None, None]

    return jax.vmap(one)(frames_f, centers.astype(jnp.float32), sizes.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("out_size",))
def bbox_mask(
    bbox_in_crop: jnp.ndarray,  # (B, 4) x1,y1,x2,y2 in source-crop pixels
    sizes: jnp.ndarray,  # (B,) square source-crop sizes in pixels
    out_size: int = 256,
) -> jnp.ndarray:
    """Batched 2D-bbox mask rasterization at the output resolution — the
    device twin of ``native/patchops.cpp::bbox_mask_resize`` (rect drawn at
    crop resolution, NEAREST-resampled: out pixel i samples source pixel
    floor((i+0.5)*size/out); negative rect coords clamp to 0). Returns
    (B, out_size, out_size, 1) float32 in {0, 1}."""
    scale = sizes.astype(jnp.float32) / out_size  # (B,)
    coords = jnp.arange(out_size, dtype=jnp.float32) + 0.5  # (out,)
    s = jnp.floor(coords[None, :] * scale[:, None]).astype(jnp.int32)  # (B, out)
    b = jnp.maximum(bbox_in_crop, 0.0).astype(jnp.int32)  # trunc == C++ (int) cast
    in_x = (s >= b[:, 0:1]) & (s < b[:, 2:3])  # (B, out)
    in_y = (s >= b[:, 1:2]) & (s < b[:, 3:4])
    return (in_y[:, :, None] & in_x[:, None, :]).astype(jnp.float32)[..., None]


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

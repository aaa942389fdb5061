"""Sigmoid focal loss, numerics-compatible with mmcv/mmdet.

The reference's class head uses ``mmdet.models.losses.focal_loss.FocalLoss()``
with defaults (use_sigmoid=True, gamma=2.0, alpha=0.25, reduction='mean',
loss_weight=1.0) — the only C++/CUDA kernel (mmcv.ops.sigmoid_focal_loss) the
reference loss path actually exercises (ref contperceptual.py:11,70,176-181).

On TPU this is a handful of elementwise ops that XLA fuses into one VPU pass;
no hand-written kernel is needed for speed-of-light here. Semantics match
mmcv's ``py_sigmoid_focal_loss``: integer targets are one-hot encoded with
``num_classes + 1`` columns and the last column dropped, so a label equal to
``num_classes`` becomes an all-zero (pure-negative) row; the elementwise focal
BCE is then mean-reduced over all N*C entries.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
    weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss on raw logits (N, C) with integer targets (N,)."""
    n, c = logits.shape
    onehot = jax.nn.one_hot(targets, c + 1, dtype=logits.dtype)[:, :c]
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * onehot + p * (1.0 - onehot)
    focal_weight = (alpha * onehot + (1.0 - alpha) * (1.0 - onehot)) * jnp.power(pt, gamma)
    # BCE-with-logits, numerically stable form.
    bce = jnp.maximum(logits, 0.0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_weight
    if weight is not None:
        loss = loss * weight.reshape(-1, 1)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / avg_factor

"""Row-vector 4x4 transforms (pytorch3d ``Transform3d`` semantics) in JAX.

Points transform as ``p' = [p, 1] @ M`` followed by division by the resulting
homogeneous coordinate (with an epsilon guard). Composition is left-to-right:
``a.compose(b)`` applies ``a`` first. Consumed by the camera / patch-NDC math
(ref: src/util/cameras.py:2-4,81-131) and its inverse eval path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Transform:
    matrix: jnp.ndarray  # (..., 4, 4), row-vector convention

    def compose(self, *others: "Transform") -> "Transform":
        m = self.matrix
        for o in others:
            m = m @ o.matrix
        return Transform(matrix=m)

    def inverse(self) -> "Transform":
        return Transform(matrix=jnp.linalg.inv(self.matrix))

    def get_matrix(self) -> jnp.ndarray:
        return self.matrix

    def transform_points(
        self, points: jnp.ndarray, eps: Optional[float] = None
    ) -> jnp.ndarray:
        """Apply to points (..., P, 3) or (P, 3); w-divide like pytorch3d."""
        pts = jnp.asarray(points)
        ones = jnp.ones(pts.shape[:-1] + (1,), dtype=pts.dtype)
        homo = jnp.concatenate([pts, ones], axis=-1)
        out = homo @ self.matrix
        w = out[..., 3:4]
        if eps is not None:
            sign = jnp.where(w >= 0.0, 1.0, -1.0)
            w = sign * jnp.maximum(jnp.abs(w), eps)
        return out[..., :3] / w


def robust_inverse(transform: Transform, eps: float = 1e-6) -> Transform:
    """Inverse with a diagonal-epsilon fallback for singular matrices
    (ref: src/util/cameras.py:9-19). Branch-free: if the matrix is
    non-finite after plain inversion, retry with ``eps`` on the diagonal."""
    m = transform.matrix
    plain = jnp.linalg.inv(m)
    bumped = jnp.linalg.inv(m + jnp.eye(m.shape[-1], dtype=m.dtype) * eps)
    ok = jnp.all(jnp.isfinite(plain), axis=(-2, -1), keepdims=True)
    return Transform(matrix=jnp.where(ok, plain, bumped))

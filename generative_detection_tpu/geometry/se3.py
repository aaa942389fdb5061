"""SE(3) exp/log maps in pure JAX (pytorch3d row-vector convention).

Replaces pytorch3d ``se3_log_map``/``se3_exp_map`` as consumed by the
reference dataset (ref: src/data/datasets/nuscenes.py:11,222-242,302-318):
transforms are 4x4 matrices of row-vector form ``[[R, 0], [T, 1]]`` (points
transform as ``p' = [p, 1] @ M``); the log is ``(u, omega)`` with
``omega = so3_log(R)`` and ``u = V(omega)^{-1} T``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .so3 import hat, so3_exp_map, so3_log_map

_EPS = 1e-8


def _se3_V(log_rot: jnp.ndarray) -> jnp.ndarray:
    """The SE(3) left-Jacobian V(omega) (..., 3, 3)."""
    theta2 = jnp.sum(jnp.square(log_rot), axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    safe = theta2 > _EPS
    fac1 = jnp.where(safe, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS), 0.5 - theta2 / 24.0)
    fac2 = jnp.where(
        safe,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS),
        1.0 / 6.0 - theta2 / 120.0,
    )
    K = hat(log_rot)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), K.shape)
    return eye + fac1[..., None, None] * K + fac2[..., None, None] * K2


def se3_exp_map(log_transform: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [u, omega] -> (..., 4, 4) row-vector transforms."""
    u, omega = log_transform[..., :3], log_transform[..., 3:]
    R = so3_exp_map(omega)
    V = _se3_V(omega)
    T = jnp.einsum("...ij,...j->...i", V, u)
    batch = log_transform.shape[:-1]
    M = jnp.zeros(batch + (4, 4), dtype=log_transform.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., 3, :3].set(T)
    M = M.at[..., 3, 3].set(1.0)
    return M


def se3_log_map(transform: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) row-vector transforms -> (..., 6) [u, omega]."""
    R = transform[..., :3, :3]
    T = transform[..., 3, :3]
    omega = so3_log_map(R)
    V = _se3_V(omega)
    u = jnp.linalg.solve(V, T[..., :, None])[..., 0]
    return jnp.concatenate([u, omega], axis=-1)

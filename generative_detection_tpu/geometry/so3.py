"""SO(3) maps in pure JAX (closed form, vmappable).

TPU-native replacement for the pytorch3d rotation utilities consumed by the
reference data pipeline (ref: src/data/datasets/nuscenes.py:11,219-221,297-299).
Conventions match pytorch3d:

- ``euler_angles_to_matrix(angles, "XYZ")`` = R_X(a0) @ R_Y(a1) @ R_Z(a2),
  each primitive being the standard column-vector rotation matrix.
- ``so3_exp_map``/``so3_log_map`` use the standard Rodrigues form with
  ``hat`` the standard skew operator, so ``so3_exp_map(so3_log_map(R)) == R``.

All functions accept batched inputs with any number of leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"Invalid axis {axis!r}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Euler angles (..., 3) -> rotation matrices (..., 3, 3)."""
    euler_angles = jnp.asarray(euler_angles)
    if euler_angles.shape[-1] != 3:
        raise ValueError("euler_angles must have last dim 3")
    if len(convention) != 3 or any(a not in "XYZ" for a in convention):
        raise ValueError(f"Invalid convention {convention!r}")
    mats = [
        _axis_rotation(axis, euler_angles[..., i])
        for i, axis in enumerate(convention)
    ]
    return mats[0] @ mats[1] @ mats[2]


def _index_from_letter(letter: str) -> int:
    return "XYZ".index(letter)


def _angle_from_tan(axis, other_axis, data, horizontal, tait_bryan):
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> Euler angles (..., 3) (pytorch3d semantics)."""
    if len(convention) != 3 or any(a not in "XYZ" for a in convention):
        raise ValueError(f"Invalid convention {convention!r}")
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central_angle = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0), -1.0, 1.0)
        )
    else:
        central_angle = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central_angle,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Vectors (..., 3) -> skew matrices (..., 3, 3): hat(v) @ u == v x u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    )
    return rows.reshape(v.shape[:-1] + (3, 3))


def so3_exp_map(log_rot: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) via Rodrigues."""
    theta2 = jnp.sum(jnp.square(log_rot), axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    safe = theta2 > _EPS
    # Taylor fallbacks keep gradients finite at theta -> 0.
    fac1 = jnp.where(safe, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    fac2 = jnp.where(safe, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS), 0.5 - theta2 / 24.0)
    K = hat(log_rot)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), K.shape)
    return eye + fac1[..., None, None] * K + fac2[..., None, None] * K2


def so3_log_map(R: jnp.ndarray, cos_bound: float = 1e-4) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + cos_bound, 1.0 - cos_bound)
    theta = jnp.arccos(cos_theta)
    # vee((R - R^T)/2) = sin(theta)/theta * omega
    vx = R[..., 2, 1] - R[..., 1, 2]
    vy = R[..., 0, 2] - R[..., 2, 0]
    vz = R[..., 1, 0] - R[..., 0, 1]
    v = 0.5 * jnp.stack([vx, vy, vz], axis=-1)
    sin_theta = jnp.sin(theta)
    scale = jnp.where(
        jnp.abs(sin_theta) > 1e-6, theta / jnp.maximum(jnp.abs(sin_theta), 1e-12), 1.0 + theta * theta / 6.0
    )
    return v * scale[..., None]

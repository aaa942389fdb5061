import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.geometry import (
    PatchPerspectiveCameras,
    Transform,
    euler_angles_to_matrix,
    matrix_to_euler_angles,
    robust_inverse,
    se3_exp_map,
    se3_log_map,
    so3_exp_map,
    so3_log_map,
    z_learned_to_world,
    z_world_to_learned,
)


def _rz(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], dtype=np.float32)


def test_euler_to_matrix_yaw_only():
    yaw = 0.7
    R = np.asarray(euler_angles_to_matrix(jnp.asarray([0.0, 0.0, yaw]), "XYZ"))
    np.testing.assert_allclose(R, _rz(yaw), atol=1e-6)


def test_euler_matrix_roundtrip(rng):
    angles = rng.uniform(-1.2, 1.2, size=(16, 3)).astype(np.float32)
    R = euler_angles_to_matrix(jnp.asarray(angles), "XYZ")
    back = np.asarray(matrix_to_euler_angles(R, "XYZ"))
    np.testing.assert_allclose(back, angles, atol=1e-4)


def test_so3_exp_log_roundtrip(rng):
    w = rng.uniform(-2.0, 2.0, size=(32, 3)).astype(np.float32)
    R = so3_exp_map(jnp.asarray(w))
    # orthonormality
    RtR = np.asarray(R @ jnp.swapaxes(R, -1, -2))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    w_back = np.asarray(so3_log_map(R))
    np.testing.assert_allclose(w_back, w, atol=1e-3)


def test_so3_exp_small_angle():
    R = np.asarray(so3_exp_map(jnp.zeros((1, 3))))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


def test_se3_log_of_dataset_style_matrix():
    # The dataset builds [[R, t], [0, 1]] column-form then transposes to the
    # row-vector form [[R^T, 0], [t, 1]] (ref nuscenes.py:302-312).
    yaw = 0.5
    t = np.array([0.3, -0.2, 0.9], dtype=np.float32)
    M_col = np.eye(4, dtype=np.float32)
    M_col[:3, :3] = _rz(yaw)
    M_col[:3, 3] = t
    M_row = jnp.asarray(M_col.T)[None]
    log = np.asarray(se3_log_map(M_row))[0]
    # rotation part: log of Rz(yaw)^T = -yaw about z
    np.testing.assert_allclose(log[3:], [0.0, 0.0, -yaw], atol=1e-5)
    # roundtrip
    M_back = np.asarray(se3_exp_map(jnp.asarray(log)[None]))[0]
    np.testing.assert_allclose(M_back, np.asarray(M_row[0]), atol=1e-5)


def test_se3_identity_translation():
    # With R = I the translation log equals the translation itself.
    t = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    M = np.eye(4, dtype=np.float32)
    M[3, :3] = t
    log = np.asarray(se3_log_map(jnp.asarray(M)[None]))[0]
    np.testing.assert_allclose(log[:3], t, atol=1e-6)
    np.testing.assert_allclose(log[3:], 0.0, atol=1e-6)


def test_transform_compose_and_w_divide():
    # projective matrix with w' = z must w-divide like pytorch3d
    M = jnp.zeros((4, 4)).at[0, 0].set(2.0).at[1, 1].set(2.0).at[3, 2].set(1.0).at[2, 3].set(1.0)
    tr = Transform(matrix=M)
    p = jnp.asarray([[4.0, 6.0, 2.0]])
    out = np.asarray(tr.transform_points(p))
    np.testing.assert_allclose(out[0], [4.0, 6.0, 0.5], atol=1e-6)


def test_robust_inverse_singular():
    singular = Transform(matrix=jnp.zeros((4, 4)))
    inv = robust_inverse(singular, eps=1e-6)
    assert np.all(np.isfinite(np.asarray(inv.matrix)))


def _make_camera(f=1266.0, px=816.0, py=491.0, W=1600, H=900):
    # Dataset-style construction: negated focal, screen principal point
    # (ref nuscenes.py:394-406).
    return PatchPerspectiveCameras.create(
        focal_length=-f,
        principal_point=[[px, py]],
        image_size=[[H, W]],
        znear=0.01,
        zfar=55.0,
    ), f, px, py, W, H


def test_transform_points_patch_ndc_matches_collapsed_formula():
    cam, f, px, py, W, H = _make_camera()
    s = min(H, W) / 2.0  # 450
    x, y, z = 2.5, -1.0, 20.0
    patch_size = [[100.0, 100.0]]
    cx, cy = 700.0, 300.0

    pts = jnp.asarray([[[x, y, z]]])
    out = np.asarray(
        cam.transform_points_patch_ndc(pts, patch_size=patch_size, patch_center=[[cx, cy]])
    ).reshape(-1)

    x_ndc2 = (W / 2.0 - px + f * x / z) / s
    y_ndc2 = (H / 2.0 - py + f * y / z) / s
    cx_ndc = (cx - W / 2.0) / s
    cy_ndc = (cy - H / 2.0) / s
    ratio = 100.0 / min(H, W)
    np.testing.assert_allclose(out[0], ratio * (x_ndc2 - cx_ndc), rtol=1e-4)
    np.testing.assert_allclose(out[1], ratio * (y_ndc2 - cy_ndc), rtol=1e-4)
    np.testing.assert_allclose(out[2], 1.0 / z, rtol=1e-5)


def test_patch_projection_roundtrip():
    cam, *_ = _make_camera()
    patch_size = [[200.0, 200.0]]
    patch_center = [[900.0, 500.0]]
    pts = jnp.asarray([[[1.0, 0.5, 12.0], [-2.0, 1.5, 30.0]]])
    fwd = cam.get_patch_projection_transform(patch_size, patch_center)
    projected = fwd.transform_points(pts)
    back = np.asarray(
        cam.transform_points_world_from_patch_ndc(projected, patch_size, patch_center)
    )
    np.testing.assert_allclose(back, np.asarray(pts), rtol=1e-3, atol=1e-4)


def test_host_label_math_matches_jnp_path():
    # pure-numpy loader-thread label math vs the jnp transform stack
    from generative_detection_tpu.data.synthetic import (
        pose_labels_from_box,
        pose_labels_from_box_jnp,
    )

    args = dict(
        x=2.0, y=0.7, z=21.0, l=4.2, h=1.7, w=2.0, yaw=0.6,
        patch_center=(860.0, 480.0), patch_size_pixels=100.0,
        patch_resampling_factor=2.56, fill_factor=0.12, hmin=0.5, hmax=4.0,
    )
    pose_np, sizes_np, yaw_np = pose_labels_from_box(**args)
    pose_j, sizes_j, yaw_j = pose_labels_from_box_jnp(**args)
    np.testing.assert_allclose(pose_np, pose_j, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sizes_np, sizes_j, rtol=1e-6)
    assert yaw_np == yaw_j


def test_z_world_learned_roundtrip():
    z = 17.3
    got = z_learned_to_world(
        z_world_to_learned(z, zmin=2.0, zmax=60.0, patch_resampling_factor=2.56),
        zmin=2.0,
        zmax=60.0,
        patch_resampling_factor=2.56,
    )
    np.testing.assert_allclose(float(got), z, rtol=1e-6)

"""Batched inference: crop -> encode -> pose-decode -> 3D box recovery.

The eval surface the reference README promises but never shipped
(ref README.md:63-66 references a missing eval.py; SURVEY §6 Stage 6).
At inference the pose head acts as a per-patch 3D detector: the decoded
19-d pose vector is inverted back to a camera-frame 3D box via the exact
transforms the data pipeline used to build the labels
(ref src/util/cameras.py:97-108,321-345 and nuscenes.py:244-332):

- SE(3): label t = V(omega)^-1 T with omega = (0, 0, -yaw) (pure-yaw
  row-form log); recovery computes T = V(omega) @ u;
- z: learned [-1,1] -> patch -> world via per-class hmin/hmax and the
  patch resampling factor;
- x, y: (x_patch_ndc, y_patch_ndc, 1/z) through the inverse of the
  world->patch-NDC projection.

All per-patch math is vectorized (vmap-free jnp) and jit-compatible.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..geometry.se3 import _se3_V
from ..geometry import z_learned_to_world

POSE_6D_DIM = 4
LHW_DIM = 3


def pose_inference(model, net_params, rgb, sample_posterior: bool = False, rng=None):
    """Batched patches -> (dec_pose (B,19), posterior_obj). Mode path by
    default (deterministic detector)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # forward-only net: fused gn+conv Pallas kernels, identical params
    net = model.inference_net() if hasattr(model, "inference_net") else model.net

    def fn(x):
        posterior_obj, pose_feat = net.apply(
            {"params": net_params}, x, method=net.encode
        )
        dec_pose, bbox_posterior = net.apply(
            {"params": net_params},
            pose_feat,
            sample_posterior,
            method=net._decode_pose,
            rngs={"sample": rng},
        )
        return dec_pose, posterior_obj, bbox_posterior

    return jax.jit(fn)(rgb)


def recover_boxes(
    dec_pose: jnp.ndarray,
    focal_length: jnp.ndarray,  # (B,) positive camera focal fx
    principal_point: jnp.ndarray,  # (B, 2)
    patch_size: jnp.ndarray,  # (B,) original patch size in pixels (min dim)
    patch_center: jnp.ndarray,  # (B, 2) screen pixels
    resampling_factor: jnp.ndarray,  # (B,)
    hmin_table: jnp.ndarray,  # (num_classes,) per-class box-height min
    hmax_table: jnp.ndarray,  # (num_classes,)
    image_size=(900.0, 1600.0),
    patch_out: int = 256,
    train_on_yaw: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Decoded pose vectors -> camera-frame 3D boxes [x,y,z,l,h,w,yaw] + class."""
    b = dec_pose.shape[0]
    u = dec_pose[:, :3]
    v3 = dec_pose[:, 3]
    lhw = dec_pose[:, POSE_6D_DIM : POSE_6D_DIM + LHW_DIM]
    fill = dec_pose[:, POSE_6D_DIM + LHW_DIM]
    logits = dec_pose[:, POSE_6D_DIM + LHW_DIM + 1 :]
    cls = jnp.argmax(logits, axis=-1)
    score = jnp.max(jax.nn.sigmoid(logits), axis=-1)

    # box sizes: (l/h, h, w/h) -> (l, h, w) (ref nuscenes.py:320-325)
    h = lhw[:, 1]
    l = lhw[:, 0] * h
    w = lhw[:, 2] * h

    # translation from SE(3) log: T = V(omega) @ u, omega = (0,0,-yaw)
    yaw = v3 if train_on_yaw else -v3
    omega = jnp.stack([jnp.zeros(b), jnp.zeros(b), -yaw], axis=-1)
    V = _se3_V(omega)
    T = jnp.einsum("bij,bj->bi", V, u)
    x_patch, y_patch, z_learned = T[:, 0], T[:, 1], T[:, 2]

    # z: learned -> world (per predicted class hmin/hmax; ref :275-291)
    hmin = jnp.take(hmin_table, cls)
    hmax = jnp.take(hmax_table, cls)
    pad = fill * patch_out
    denom = jnp.maximum(patch_out - pad, 1.0)
    zmin = hmin * focal_length / denom  # == -(hmin * (-f)) / denom
    zmax = hmax * focal_length / denom
    z_world = z_learned_to_world(z_learned, zmin, zmax, resampling_factor)
    z_world = jnp.clip(z_world, 1e-3, None)

    # x, y: exact closed-form inverse of the label math
    # (transform_points_patch_ndc, which projects through
    # transform_points_screen *with* xyflip; the reference's composed inverse
    # transform lacks that flip and does NOT invert its own labels — see
    # test_eval.py::test_recover_boxes_roundtrip):
    #   x_patch = (p/i_min) * (x_ndc2 - cx_ndc)
    #   x_ndc2  = (W/2 - px + f*x/z) / s,  s = min(H, W)/2
    img_h, img_w = float(image_size[0]), float(image_size[1])
    s = min(img_h, img_w) / 2.0
    i_min = min(img_h, img_w)
    ratio = patch_size / i_min
    px, py = principal_point[:, 0], principal_point[:, 1]
    cx_ndc = (patch_center[:, 0] - img_w / 2.0) / s
    cy_ndc = (patch_center[:, 1] - img_h / 2.0) / s
    x_ndc2 = x_patch / jnp.maximum(ratio, 1e-9) + cx_ndc
    y_ndc2 = y_patch / jnp.maximum(ratio, 1e-9) + cy_ndc
    x_world = z_world * (s * x_ndc2 - img_w / 2.0 + px) / focal_length
    y_world = z_world * (s * y_ndc2 - img_h / 2.0 + py) / focal_length

    boxes = jnp.stack([x_world, y_world, z_world, l, h, w, yaw], axis=-1)
    return {"boxes_3d": boxes, "class_id": cls, "score": score, "logits": logits}


def frame_ids_from_batch(batch, batch_size: int):
    """Frame identity for the set-based evaluator.

    Real datasets emit ``sample_idx``/``cam_idx`` per patch (data/
    nuscenes.py:568-570); patches from the same camera frame must compete in
    the nuScenes-style matching, so their frame id is
    ``sample_idx * 64 + cam_idx`` (64 > any camera count). Datasets without
    frame identity (synthetic) return the sentinel -1 for every patch — the
    caller assigns each patch its own pseudo-frame, which keeps matching
    honest (a prediction can only match its own patch's GT).
    """
    import numpy as np

    if "sample_idx" in batch and "cam_idx" in batch:
        return (
            np.asarray(batch["sample_idx"], np.int64).reshape(-1) * 64
            + np.asarray(batch["cam_idx"], np.int64).reshape(-1)
        )
    return np.full((batch_size,), -1, np.int64)

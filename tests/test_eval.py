import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.eval import detection_metrics, psnr, recover_boxes
from generative_detection_tpu.data.synthetic import pose_labels_from_box


def test_psnr_identity_and_noise(rng):
    a = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    noisy = a + 0.1
    p = psnr(a, noisy)
    # MSE = 0.01, range 2 -> 10*log10(4/0.01) = 26.02
    assert p == pytest.approx(26.02, abs=0.1)


def test_recover_boxes_roundtrip():
    """Label math forward (pose_labels_from_box) -> recover_boxes inverse must
    reproduce the original camera-frame box."""
    x, y, z = 2.0, 0.7, 21.0
    l, h, w = 4.2, 1.7, 2.0
    yaw = 0.6
    center = (860.0, 480.0)
    patch_px = 100.0
    resamp = 256.0 / patch_px
    fill = 0.12
    hmin, hmax = 0.5, 4.0

    pose_6d, bbox_sizes, _ = pose_labels_from_box(
        x, y, z, l, h, w, yaw, center, patch_px, resamp, fill, hmin, hmax
    )
    # assemble a dec_pose as the model would produce it, with yaw at index 3
    # (train_on_yaw=True training overwrites v3 with yaw, ref autoencoder.py:262-265)
    logits = np.full((11,), -10.0, np.float32)
    logits[0] = 10.0  # car
    dec_pose = np.concatenate(
        [pose_6d[:3], [yaw], bbox_sizes, [fill], logits]
    ).astype(np.float32)[None]

    rec = recover_boxes(
        jnp.asarray(dec_pose),
        focal_length=jnp.asarray([1266.0]),
        principal_point=jnp.asarray([[800.0, 450.0]]),
        patch_size=jnp.asarray([patch_px]),
        patch_center=jnp.asarray([list(center)]),
        resampling_factor=jnp.asarray([resamp]),
        hmin_table=jnp.full((11,), hmin),
        hmax_table=jnp.full((11,), hmax),
    )
    box = np.asarray(rec["boxes_3d"])[0]
    np.testing.assert_allclose(box[:3], [x, y, z], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(box[3:6], [l, h, w], rtol=1e-4)
    np.testing.assert_allclose(box[6], yaw, atol=1e-5)
    assert int(rec["class_id"][0]) == 0
    assert float(rec["score"][0]) > 0.99


def test_recover_boxes_uses_translation_jacobian():
    # with u rotated through V(omega), recovery must still land on T = V u;
    # check that a nonzero yaw changes the translation mapping (V != I)
    logits = np.zeros((11,), np.float32)
    base = np.concatenate([[0.5, 0.2, 0.1], [1.2], [2.0, 1.5, 1.0], [0.0], logits])
    kw = dict(
        focal_length=jnp.asarray([1266.0]),
        principal_point=jnp.asarray([[800.0, 450.0]]),
        patch_size=jnp.asarray([100.0]),
        patch_center=jnp.asarray([[800.0, 450.0]]),
        resampling_factor=jnp.asarray([2.56]),
        hmin_table=jnp.full((11,), 0.5),
        hmax_table=jnp.full((11,), 4.0),
    )
    b1 = np.asarray(recover_boxes(jnp.asarray(base, jnp.float32)[None], **kw)["boxes_3d"])
    noyaw = base.copy()
    noyaw[3] = 0.0
    b2 = np.asarray(recover_boxes(jnp.asarray(noyaw, jnp.float32)[None], **kw)["boxes_3d"])
    assert not np.allclose(b1[0, :2], b2[0, :2])


def test_detection_metrics():
    gt = np.asarray([[0, 0, 10, 4, 1.5, 2, 0.0], [1, 1, 20, 4, 1.5, 2, 1.0]], np.float32)
    pred = gt.copy()
    pred[0, 0] += 0.3  # 0.3 m off
    pred[1, 2] += 3.0  # 3 m off
    m = detection_metrics(
        pred, np.asarray([0, 1]), gt, np.asarray([0, 1]), np.asarray([True, True])
    )
    assert m["class_accuracy"] == 1.0
    assert m["match@0.5m"] == pytest.approx(0.5)
    assert m["match@4.0m"] == pytest.approx(1.0)
    assert m["mATE"] == pytest.approx((0.3 + 3.0) / 2, rel=1e-5)


def test_detection_metrics_empty_foreground():
    m = detection_metrics(
        np.zeros((2, 7)), np.zeros(2), np.zeros((2, 7)), np.zeros(2), np.asarray([False, False])
    )
    assert m["num_eval"] == 0

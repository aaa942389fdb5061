import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.losses.contperceptual import (
    PoseLoss,
    adopt_weight,
    build_prior_tables,
    hinge_d_loss,
)
from generative_detection_tpu.utils.distributions import DiagonalGaussianDistribution

B, S = 4, 32


def make_loss(**kw):
    defaults = dict(
        encoder_pretrain_steps=10,
        pose_conditioned_generation_steps=10,
        disc_start=10,
        kl_weight_obj=1.0,
        kl_weight_bbox=1e-6,
        disc_weight=0.5,
        pose_weight=2.0,
        fill_factor_weight=3.0,
        class_weight=4.0,
        bbox_weight=5.0,
        pose_loss_fn="l1",
        mask_loss_fn="l2",
        disc_in_channels=3,
        num_classes=11,
        dataset_stats_path=None,
    )
    defaults.update(kw)
    return PoseLoss(**defaults)


@pytest.fixture(scope="module")
def loss_setup():
    loss = make_loss()
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32))
    dec = jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32))
    dec_pose = jnp.asarray(rng.normal(size=(B, 19)).astype(np.float32))
    pose_gt = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    class_gt = jnp.asarray([0, 1, 2, 10], jnp.int32)  # one 'truck' (bg-idx quirk), one background
    class_orig = jnp.asarray([0, 1, 2, 10], jnp.int32)
    bbox_gt = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    fill_gt = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
    post_obj = DiagonalGaussianDistribution(
        jnp.asarray(rng.normal(size=(B, 16, 16, 16)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 16, 16, 16)).astype(np.float32)),
    )
    post_bbox = DiagonalGaussianDistribution(
        jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32)),
    )
    mask = jnp.ones((B, S, S, 1), jnp.float32)
    args = (rgb, None, pose_gt, dec, dec_pose, class_gt, class_orig, bbox_gt, fill_gt, post_obj, post_bbox)
    variables = loss.init(
        jax.random.PRNGKey(0), *args, 0, jnp.asarray(0, jnp.int32), mask
    )
    return loss, variables, args, mask


def _call(loss, variables, args, mask, optimizer_idx, step, d_weight=0.0):
    return loss.apply(
        variables,
        *args,
        optimizer_idx,
        jnp.asarray(step, jnp.int32),
        mask,
        d_weight=d_weight,
    )


def test_adopt_weight():
    assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(10), threshold=10)) == 1.0


def test_generator_loss_finite_and_logged(loss_setup):
    loss, variables, args, mask = loss_setup
    total, log = _call(loss, variables, args, mask, 0, 100)
    assert np.isfinite(float(total))
    for k in (
        "train/total_loss",
        "train/nll_loss",
        "train/kl_loss_obj",
        "train/kl_loss_bbox",
        "train/pose_loss",
        "train/class_loss",
        "train/bbox_loss",
        "train/fill_factor_loss",
        "train/g_loss",
        "train/rec_loss",
        "train/d_weight",
    ):
        assert k in log, k
        assert np.isfinite(float(log[k])), k


def test_pretrain_phase_excludes_reconstruction_terms(loss_setup):
    loss, variables, args, mask = loss_setup
    total_pre, log_pre = _call(loss, variables, args, mask, 0, 5)
    # Before encoder_pretrain_steps the total is pose-only terms (ref :318-321).
    expected = (
        float(log_pre["train/weighted_pose_loss"])
        + float(log_pre["train/weighted_class_loss"])
        + float(log_pre["train/weighted_bbox_loss"])
        + float(log_pre["train/weighted_fill_factor_loss"])
        + 1e-6 * float(log_pre["train/kl_loss_bbox"])
    )
    np.testing.assert_allclose(float(total_pre), expected, rtol=1e-5)


def test_full_phase_includes_nll_and_kl(loss_setup):
    loss, variables, args, mask = loss_setup
    total, log = _call(loss, variables, args, mask, 0, 100, d_weight=0.5)
    expected = (
        float(log["train/weighted_pose_loss"])
        + float(log["train/weighted_nll_loss"])
        + float(log["train/weighted_class_loss"])
        + float(log["train/weighted_bbox_loss"])
        + float(log["train/weighted_fill_factor_loss"])
        + float(log["train/weighted_kl_loss_obj"])
        + 1e-6 * float(log["train/kl_loss_bbox"])
        + 0.5 * 1.0 * float(log["train/g_loss"])
    )
    np.testing.assert_allclose(float(total), expected, rtol=1e-4)


def test_pixel_loss_gated_until_pose_cond_end(loss_setup):
    loss, variables, args, mask = loss_setup
    # step 15: past pretrain(10) but before pretrain+pose_cond(20):
    # rec loss = LPIPS only; perturbing pixels changes LPIPS but the
    # |x-xhat| term must be absent. Compare rec_loss at steps 15 vs 25.
    _, log15 = _call(loss, variables, args, mask, 0, 15)
    _, log25 = _call(loss, variables, args, mask, 0, 25)
    assert float(log25["train/rec_loss"]) > float(log15["train/rec_loss"])


def test_discriminator_loss_gated_by_disc_start(loss_setup):
    loss, variables, args, mask = loss_setup
    d5, log5 = _call(loss, variables, args, mask, 1, 5)
    assert float(d5) == 0.0
    d50, log50 = _call(loss, variables, args, mask, 1, 50)
    assert float(d50) > 0.0
    assert "train/logits_real" in log50


def test_hinge_loss_formula(rng):
    lr = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    lf = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    got = float(hinge_d_loss(lr, lf))
    want = 0.5 * (
        np.maximum(1.0 - np.asarray(lr), 0).mean()
        + np.maximum(1.0 + np.asarray(lf), 0).mean()
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pose_kl_skips_background_by_name(loss_setup):
    loss, variables, args, mask = loss_setup
    post_bbox = args[-1]
    mask_bg = jnp.ones((B,))
    kl_all = loss.apply(
        variables,
        post_bbox,
        mask_bg,
        jnp.asarray([0, 1, 2, 3], jnp.int32),
        method=loss.compute_pose_kl_loss,
    )
    kl_with_bg = loss.apply(
        variables,
        post_bbox,
        mask_bg,
        jnp.asarray([0, 1, 2, 10], jnp.int32),
        method=loss.compute_pose_kl_loss,
    )
    # replacing one foreground row with background lowers the summed KL
    assert float(kl_with_bg) < float(kl_all)


def test_mask_bg_uses_background_class_idx_quirk(loss_setup):
    loss, _, _, _ = loss_setup
    # ref BACKGROUND_CLASS_IDX = 1 ('truck' in the shipped mapping!)
    mask = loss._mask_bg(jnp.asarray([0, 1, 10], jnp.int32))
    np.testing.assert_allclose(np.asarray(mask), [1.0, 0.0, 1.0])


def test_masked_mean_empty_foreground(loss_setup):
    loss, variables, args, mask = loss_setup
    (rgb, m, pose_gt, dec, dec_pose, _, class_orig, bbox_gt, fill_gt, po, pb) = args
    all_bg = jnp.full((B,), 1, jnp.int32)  # everything == background_class_idx
    total, log = loss.apply(
        variables,
        rgb, m, pose_gt, dec, dec_pose, all_bg, class_orig, bbox_gt, fill_gt, po, pb,
        0,
        jnp.asarray(5, jnp.int32),
        mask,
    )
    assert np.isfinite(float(total))
    assert float(log["train/pose_loss"]) == 0.0


def test_prior_tables_defaults():
    means, logvars = build_prior_tables(None, train_on_yaw=True)
    assert len(means) == 11 and len(means[0]) == 8
    # yaw prior: N(0, pi^2)
    np.testing.assert_allclose(logvars[0][3], 2 * np.log(np.pi), rtol=1e-6)
    # fill factor prior: N(0.5, 2)
    np.testing.assert_allclose(means[0][7], 0.5)
    np.testing.assert_allclose(logvars[0][7], np.log(2.0), rtol=1e-6)


def test_prior_tables_from_stats(tmp_path):
    import pickle

    stats = {
        "car": {"t3": (1.5, 0.3), "l": (2.0, 0.1), "h": (1.0, 0.2), "w": (0.9, 0.4)},
    }
    p = tmp_path / "all.pkl"
    with open(p, "wb") as f:
        pickle.dump(stats, f)
    means, logvars = build_prior_tables(str(p), train_on_yaw=True)
    np.testing.assert_allclose(means[0][2], 1.5)
    np.testing.assert_allclose(logvars[0][4], 0.1)


def test_mask_loss_enabled_path(loss_setup):
    """use_mask_loss=True with RGBA reconstruction + mask gt computes the
    term (ref contperceptual.py:166-175; dead in every shipped ref config)."""
    loss = make_loss(use_mask_loss=True, mask_weight=2.0, mask_loss_fn="l2")
    rng = np.random.default_rng(5)
    mask_gt = jnp.asarray(rng.uniform(0, 1, size=(B, S, S, 1)).astype(np.float32))
    dec_rgba = jnp.asarray(rng.normal(size=(B, S, S, 4)).astype(np.float32))
    mask2d = jnp.ones((B, S, S, 1), jnp.float32)
    got_loss, got_w = loss.get_mask_loss(mask_gt, dec_rgba, mask2d)
    want = float(jnp.mean(jnp.square(mask_gt - dec_rgba[..., 3:])))
    np.testing.assert_allclose(float(got_loss), want, rtol=1e-6)
    np.testing.assert_allclose(float(got_w), 2.0 * want, rtol=1e-6)


def test_mask_loss_rejects_bad_config(loss_setup):
    """use_mask_loss=True without mask gt / RGBA output fails loudly instead
    of silently training without the term (the reference silently disables,
    ref contperceptual.py:232,248)."""
    loss = make_loss(use_mask_loss=True, mask_weight=1.0)
    rng = np.random.default_rng(5)
    dec_rgb = jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32))
    mask2d = jnp.ones((B, S, S, 1), jnp.float32)
    with pytest.raises(ValueError, match="use_mask_loss"):
        loss.get_mask_loss(None, dec_rgb, mask2d)
    mask_gt = jnp.ones((B, S, S, 1), jnp.float32)
    with pytest.raises(ValueError, match="4-channel"):
        loss.get_mask_loss(mask_gt, dec_rgb, mask2d)


def test_mask_loss_disabled_returns_zeros(loss_setup):
    loss = make_loss()  # use_mask_loss default False
    z, w = loss.get_mask_loss(None, jnp.zeros((B, S, S, 3)), jnp.ones((B, S, S, 1)))
    assert float(z) == 0.0 and float(w) == 0.0

"""OD-VAE composite loss stack (flax, fully on-device).

TPU-native rebuild of ``src/modules/losses/contperceptual.py`` (PoseLoss over
the ldm LPIPSWithDiscriminator base [EXTERNAL]):

- L1 pixel + LPIPS perceptual reconstruction, NLL with a learned scalar
  ``logvar`` (ref :134-158);
- object-latent KL and per-class bbox-posterior KL against dataset-statistics
  priors — the reference's per-sample Python loop (:191-205) is vectorized
  into one gathered table lookup;
- pose L1 + SmoothL1(sin yaw), focal class loss, MSE box-size & fill-factor
  losses, with foreground masking (:111-132,176-212,226-257);
- PatchGAN hinge adversarial loss with ``adopt_weight`` gating and an
  adaptive generator weight (:281-304,352-375). The adaptive weight needs
  parameter gradients, so it is *computed in the train step* (see
  ``train/steps.py``) and passed in; validation passes 0 like the reference's
  eval-mode RuntimeError fallback (:296-299).

All step-dependent phase gates are ``jnp.where`` on a traced ``global_step``
so the jitted train step never retraces at curriculum boundaries.

Known reference quirk replicated: ``BACKGROUND_CLASS_IDX = 1`` (:17) is used
for the foreground mask even though the shipped 11-class config maps
'background' to id 10 — configurable here via ``background_class_idx``
(default 1 for parity); the *prior-KL* background skip uses the class *name*
(canonical id ``background_label_id``), also as in the reference.
"""

from __future__ import annotations

import logging
import math
import pickle
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.discriminator import NLayerDiscriminator
from ..models.lpips import LPIPS
from ..ops.focal import sigmoid_focal_loss

POSE_6D_DIM = 4
LHW_DIM = 3
FILL_FACTOR_DIM = 1
BBOX_DIM = POSE_6D_DIM + LHW_DIM + FILL_FACTOR_DIM  # 8

# Canonical nuScenes label order (ref nuscenes.py:23-35).
LABEL_NAMES = (
    "car",
    "truck",
    "trailer",
    "bus",
    "construction_vehicle",
    "bicycle",
    "motorcycle",
    "pedestrian",
    "traffic_cone",
    "barrier",
    "background",
)
BACKGROUND_LABEL_ID = 10


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    """``weight`` once ``global_step >= threshold`` else ``value``
    (ref taming vqperceptual.adopt_weight; used at contperceptual.py:303,363)."""
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(nn.softplus(-logits_real)) + jnp.mean(nn.softplus(logits_fake))
    )


def _smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _masked_mean(x_sum: jnp.ndarray, mask_sum: jnp.ndarray) -> jnp.ndarray:
    """sum(x)/sum(mask) with the reference's 0-if-empty fallback."""
    return jnp.where(mask_sum > 0, x_sum / jnp.maximum(mask_sum, 1e-12), 0.0)


def build_prior_tables(
    dataset_stats_path: Optional[str],
    train_on_yaw: bool = True,
    label_names: Tuple[str, ...] = LABEL_NAMES,
) -> Tuple[tuple, tuple]:
    """Per-class bbox prior moments (mean, logvar), each (num_labels, 8).

    Mirrors ``_create_distribution_from_dataset_stats`` (ref :82-109): keys
    [t1, t2, t3, yaw|v3, l, h, w, fill_factor]; t1/t2 ~ N(0,1), yaw ~
    N(0, pi^2), fill ~ N(0.5, 2); t3/l/h/w from the dataset stats pickle.
    Returned as nested tuples (hashable, safe as flax static fields).
    """
    stats = {}
    if dataset_stats_path:
        try:
            with open(dataset_stats_path, "rb") as f:
                stats = pickle.load(f)
        except (FileNotFoundError, OSError):
            logging.warning(
                "dataset stats %s not found; using unit-Gaussian bbox priors "
                "(run compute_dataset_stats.py for faithful priors)",
                dataset_stats_path,
            )
    rot_key = "yaw" if train_on_yaw else "v3"
    keys = ["t1", "t2", "t3", rot_key, "l", "h", "w", "fill_factor"]
    means, logvars = [], []
    for label in label_names:
        label_stats = stats.get(label, {})
        m_row, lv_row = [], []
        for key in keys:
            if key == "yaw":
                m, lv = 0.0, 2.0 * math.log(math.pi)
            elif key in ("t1", "t2"):
                m, lv = 0.0, 0.0
            elif key == "fill_factor":
                m, lv = 0.5, 2.0 * math.log(math.sqrt(2.0))
            else:  # t3, l, h, w (and v3 when train_on_yaw=False)
                if key in label_stats:
                    m, lv = float(label_stats[key][0]), float(label_stats[key][1])
                else:
                    m, lv = 0.0, 0.0
            m_row.append(m)
            lv_row.append(lv)
        means.append(tuple(m_row))
        logvars.append(tuple(lv_row))
    return tuple(means), tuple(logvars)


class PoseLoss(nn.Module):
    """Generator + discriminator losses for the pose autoencoder.

    Constructor keyword surface matches the reference YAML ``lossconfig``
    (configs/autoencoder/pose/autoencoder_kl_16x16x16.yaml:16-32).
    """

    # pose-loss params (ref contperceptual.py:28-51)
    train_on_yaw: bool = True
    kl_weight_obj: float = 1.0
    kl_weight_bbox: float = 1e-6
    pose_weight: float = 1.0
    mask_weight: float = 0.0
    class_weight: float = 1.0
    bbox_weight: float = 1.0
    fill_factor_weight: float = 1.0
    pose_loss_fn: str = "l1"
    mask_loss_fn: str = "l2"
    encoder_pretrain_steps: int = 0
    pose_conditioned_generation_steps: int = 7000
    use_mask_loss: bool = False
    num_classes: int = 1
    dataset_stats_path: Optional[str] = "dataset_stats/combined/all.pkl"
    background_class_idx: int = 1  # ref BACKGROUND_CLASS_IDX quirk (:17)
    background_label_id: int = BACKGROUND_LABEL_ID
    # ldm LPIPSWithDiscriminator base params (defaults as in ldm)
    disc_start: int = 0  # == discriminator_iter_start
    logvar_init: float = 0.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0  # == disc_weight scaling of adaptive d_weight
    perceptual_weight: float = 1.0
    disc_ndf: int = 64
    disc_conditional: bool = False
    disc_loss: str = "hinge"
    dtype: Any = jnp.float32
    # prior tables ((L, 8) nested tuples); built by the model wrapper via
    # build_prior_tables() so the pickle is read once on host.
    prior_means: Optional[tuple] = None
    prior_logvars: Optional[tuple] = None

    def setup(self):
        assert self.pose_loss_fn in ("l1", "l2", "mse")
        assert self.mask_loss_fn in ("l1", "l2", "mse")
        assert self.disc_loss in ("hinge", "vanilla")
        self.perceptual_loss = LPIPS(dtype=self.dtype, name="perceptual")
        self.discriminator = NLayerDiscriminator(
            input_nc=self.disc_in_channels,
            ndf=self.disc_ndf,
            n_layers=self.disc_num_layers,
            dtype=self.dtype,
            name="discriminator",
        )
        self.logvar = self.param(
            "logvar", nn.initializers.constant(self.logvar_init), ()
        )

    # -- pieces ---------------------------------------------------------------

    def _elemwise(self, kind: str, a, b):
        return jnp.abs(a - b) if kind == "l1" else jnp.square(a - b)

    def _priors(self):
        if self.prior_means is None:
            m, lv = build_prior_tables(None, self.train_on_yaw)
        else:
            m, lv = self.prior_means, self.prior_logvars
        return jnp.asarray(m, jnp.float32), jnp.asarray(lv, jnp.float32)

    def _mask_bg(self, class_gt: jnp.ndarray) -> jnp.ndarray:
        """Foreground mask: 1 where class != background_class_idx (ref :226-228)."""
        return (class_gt != self.background_class_idx).astype(jnp.float32)

    def compute_pose_loss(self, pred, gt, mask_bg):
        """(ref :111-132) returns (pose_loss, weighted, t1, t2, t3, v3 per-sample)."""
        t1 = self._elemwise(self.pose_loss_fn, pred[:, 0], gt[:, 0])
        t2 = self._elemwise(self.pose_loss_fn, pred[:, 1], gt[:, 1])
        t3 = self._elemwise(self.pose_loss_fn, pred[:, 2], gt[:, 2])
        if self.train_on_yaw:
            v3 = _smooth_l1(jnp.sin(pred[:, 3]) - jnp.sin(gt[:, 3]))
        else:
            v3 = self._elemwise(self.pose_loss_fn, pred[:, 3], gt[:, 3])
        per_sample = t1 + t2 + t3 + v3
        pose_loss = _masked_mean(jnp.sum(per_sample * mask_bg), jnp.sum(mask_bg))
        return pose_loss, self.pose_weight * pose_loss, t1, t2, t3, v3

    def _get_rec_loss(self, inputs, recons, use_pixel_loss):
        """|x - x_hat| (phase-gated) + perceptual map (ref :134-145). NHWC."""
        pixel = jnp.abs(inputs - recons)
        rec = jnp.where(use_pixel_loss, pixel, jnp.zeros_like(pixel))
        if self.perceptual_weight > 0:
            p = self.perceptual_loss(inputs, recons)  # (B,1,1,1)
            rec = rec + self.perceptual_weight * p
        return rec

    def _get_nll_loss(self, rec_loss, mask_bg, weights=None):
        """(ref :147-158): nll = rec/exp(logvar) + logvar; masked sum over
        pixels divided by the count of foreground *samples*."""
        nll = rec_loss / (jnp.exp(self.logvar) + 1e-8) + self.logvar
        weighted = nll if weights is None else weights * nll
        m = mask_bg.reshape(-1, 1, 1, 1)
        nll_out = _masked_mean(jnp.sum(nll * m), jnp.sum(mask_bg))
        weighted_out = _masked_mean(jnp.sum(weighted * m), jnp.sum(mask_bg))
        return nll_out, weighted_out

    def _get_kl_loss(self, posterior, mask_bg):
        kl = posterior.kl()
        return _masked_mean(jnp.sum(kl * mask_bg), jnp.sum(mask_bg))

    def compute_class_loss(self, class_gt, class_logits):
        loss = sigmoid_focal_loss(class_logits, class_gt)
        return loss, self.class_weight * loss

    def compute_bbox_loss(self, bbox_gt, bbox_pred, mask_bg):
        per = jnp.square(bbox_gt - bbox_pred) * mask_bg[:, None]
        loss = _masked_mean(jnp.sum(per), jnp.sum(mask_bg))
        return loss, self.bbox_weight * loss

    def compute_fill_factor_loss(self, fill_gt, fill_pred, mask_bg):
        per = jnp.square(fill_gt - fill_pred) * mask_bg
        loss = _masked_mean(jnp.sum(per), jnp.sum(mask_bg))
        return loss, self.fill_factor_weight * loss

    def get_mask_loss(self, mask_gt, dec_obj, mask_2d_bbox):
        """Alpha-mask reconstruction term (ref contperceptual.py:166-175).

        In the reference this is DEAD code for every shipped config: the model
        always passes ``mask_gt=None`` (ref autoencoder.py:310-314), which
        force-disables it at :232. When enabled it needs a mask ground truth
        AND a 4-channel reconstruction (RGBA, ref :246-248); anything else is
        a config error and fails loudly here instead of silently training
        without the term. Note the reference's activated path would also
        crash (it adds an unreduced elementwise tensor into the scalar total,
        :313); we take the evident intent: mean of the masked elementwise
        loss, scaled by ``mask_weight``.
        """
        if not self.use_mask_loss:
            z = jnp.asarray(0.0)
            return z, z
        if mask_gt is None or dec_obj.shape[-1] != 4:
            raise ValueError(
                "use_mask_loss=True requires a mask ground truth in the batch "
                "and a 4-channel (RGBA) reconstruction (ddconfig out_ch: 4); "
                f"got mask_gt={'None' if mask_gt is None else 'ok'}, "
                f"reconstruction channels={dec_obj.shape[-1]}. The reference "
                "silently disables the term in this situation "
                "(ref contperceptual.py:232,248) — this framework rejects it."
            )
        inputs_mask = mask_gt * mask_2d_bbox
        recons_mask = dec_obj[..., 3:] * mask_2d_bbox
        mask_loss = jnp.mean(
            self._elemwise(self.mask_loss_fn, inputs_mask, recons_mask)
        )
        return mask_loss, self.mask_weight * mask_loss

    def compute_pose_kl_loss(self, bbox_posterior, mask_bg, class_orig_id):
        """Vectorized per-class prior KL (ref python loop :191-205):
        gather (mean, logvar) priors by canonical class id, skip 'background'
        rows by name-id, divide by sum(mask_bg) — faithfully including the
        reference's mismatch between the skip mask and the divisor."""
        pm, plv = self._priors()
        prior_mean = jnp.take(pm, class_orig_id, axis=0)  # (B, 8)
        prior_logvar = jnp.take(plv, class_orig_id, axis=0)
        mean, logvar = bbox_posterior.mean, bbox_posterior.logvar
        prior_var = jnp.exp(prior_logvar)
        var = jnp.exp(logvar)
        kl = 0.5 * jnp.sum(
            jnp.square(mean - prior_mean) / (prior_var + 1e-5)
            + var / (prior_var + 1e-5)
            - 1.0
            - logvar
            + prior_logvar,
            axis=-1,
        )
        not_bg = (class_orig_id != self.background_label_id).astype(kl.dtype)
        return _masked_mean(jnp.sum(kl * not_bg), jnp.sum(mask_bg))

    # -- adaptive-weight support ------------------------------------------------

    def rec_gan_terms(
        self, rgb_gt, dec_obj, class_gt, mask_2d_bbox, global_step, weights=None
    ):
        """The reconstruction-dependent scalars as a function of ``dec_obj``:
        ``(nll, weighted_nll, g_loss, rec_mean)``.

        The train step wraps this in ``jax.vjp``: the primal values feed the
        total generator loss (one LPIPS + one discriminator forward total),
        while the cotangent pulls for ``nll`` and ``g_loss`` are pushed
        through the decoder's ``conv_out`` kernel to form the adaptive
        discriminator weight (ref contperceptual.py:294-304)."""
        mask_bg = self._mask_bg(class_gt)
        use_pixel = global_step >= (
            self.encoder_pretrain_steps + self.pose_conditioned_generation_steps
        )
        inputs_rgb = rgb_gt * mask_2d_bbox
        recons_rgb = dec_obj * mask_2d_bbox
        rec = self._get_rec_loss(inputs_rgb, recons_rgb, use_pixel)
        nll, w_nll = self._get_nll_loss(rec, mask_bg, weights)
        logits_fake = self.discriminator(recons_rgb, train=True)
        logits_fake = logits_fake * mask_bg.reshape(-1, 1, 1, 1)
        g_loss = -jnp.mean(logits_fake)
        return nll, w_nll, g_loss, jnp.mean(rec)

    def nll_terms(self, rgb_gt, dec_obj, class_gt, mask_2d_bbox, global_step):
        """Reconstruction-NLL scalars only (no discriminator): ``(nll,
        weighted_nll, rec_mean)``. Split from ``rec_gan_terms`` so the
        adaptive-weight vjp for ``nll`` backprops through pixel+LPIPS ONLY —
        pulling it through the joint graph pays a dead discriminator
        backward (and vice versa for ``g_term``).

        Deliberately takes NO per-sample ``weights``: with weights absent,
        ``w_nll == nll`` elementwise, which is the invariant the train
        step's surrogate-gradient reattachment relies on (it injects
        d(nll)/dy as the gradient of w_nll — steps.py:_reattach_grad). The
        reference never passes weights either (ref contperceptual.py:117);
        the weighted path survives only in ``rec_gan_terms``/
        ``generator_loss`` for log parity."""
        mask_bg = self._mask_bg(class_gt)
        use_pixel = global_step >= (
            self.encoder_pretrain_steps + self.pose_conditioned_generation_steps
        )
        inputs_rgb = rgb_gt * mask_2d_bbox
        recons_rgb = dec_obj * mask_2d_bbox
        rec = self._get_rec_loss(inputs_rgb, recons_rgb, use_pixel)
        nll, w_nll = self._get_nll_loss(rec, mask_bg, None)
        return nll, w_nll, jnp.mean(rec)

    def g_term(self, dec_obj, class_gt, mask_2d_bbox):
        """Generator GAN scalar only (one discriminator forward)."""
        mask_bg = self._mask_bg(class_gt)
        recons_rgb = dec_obj * mask_2d_bbox
        logits_fake = self.discriminator(recons_rgb, train=True)
        logits_fake = logits_fake * mask_bg.reshape(-1, 1, 1, 1)
        return -jnp.mean(logits_fake)

    def nll_g_pair(self, rgb_gt, dec_obj, class_gt, mask_2d_bbox, global_step):
        nll, _, g, _ = self.rec_gan_terms(
            rgb_gt, dec_obj, class_gt, mask_2d_bbox, global_step
        )
        return nll, g

    # -- main entry points --------------------------------------------------------

    def generator_loss(
        self,
        rgb_gt,
        mask_gt,
        pose_gt,
        dec_obj,
        dec_pose,
        class_gt,
        class_orig_id,
        bbox_gt,
        fill_factor_gt,
        posterior_obj,
        bbox_posterior,
        global_step,
        mask_2d_bbox,
        d_weight=0.0,
        split="train",
        weights=None,
        rec_terms=None,
    ):
        """optimizer_idx == 0 path (ref :281-350). All inputs NHWC.

        ``rec_terms``: optional precomputed ``rec_gan_terms`` tuple (from the
        train step's vjp) so LPIPS/discriminator run once per step."""
        mask_bg = self._mask_bg(class_gt)

        pose_rec = dec_pose[:, :POSE_6D_DIM]
        lhw_rec = dec_pose[:, POSE_6D_DIM : POSE_6D_DIM + LHW_DIM]
        fill_rec = dec_pose[:, POSE_6D_DIM + LHW_DIM : POSE_6D_DIM + LHW_DIM + FILL_FACTOR_DIM]
        class_logits = dec_pose[:, POSE_6D_DIM + LHW_DIM + FILL_FACTOR_DIM :]

        class_loss, w_class = self.compute_class_loss(class_gt, class_logits)
        bbox_loss, w_bbox = self.compute_bbox_loss(bbox_gt, lhw_rec, mask_bg)
        pose_loss, w_pose, t1, t2, t3, v3 = self.compute_pose_loss(
            pose_gt, pose_rec, mask_bg
        )
        fill_loss, w_fill = self.compute_fill_factor_loss(
            fill_factor_gt, fill_rec[:, 0], mask_bg
        )
        mask_loss, w_mask = self.get_mask_loss(mask_gt, dec_obj, mask_2d_bbox)

        if rec_terms is None:
            rec_terms = self.rec_gan_terms(
                rgb_gt, dec_obj, class_gt, mask_2d_bbox, global_step, weights
            )
        nll_loss, w_nll, g_loss, rec_mean = rec_terms
        kl_obj = self._get_kl_loss(posterior_obj, mask_bg)
        kl_bbox = self.compute_pose_kl_loss(bbox_posterior, mask_bg, class_orig_id)

        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        d_weight = jnp.asarray(d_weight, jnp.float32)

        pose_only = w_pose + w_class + w_bbox + w_fill + self.kl_weight_bbox * kl_bbox
        full = (
            w_pose
            + w_mask
            + w_nll
            + w_class
            + w_bbox
            + w_fill
            + self.kl_weight_obj * kl_obj
            + self.kl_weight_bbox * kl_bbox
            + d_weight * disc_factor * g_loss
        )
        if self.encoder_pretrain_steps == -1:
            loss = pose_only
        else:
            loss = jnp.where(global_step > self.encoder_pretrain_steps, full, pose_only)

        log = {
            f"{split}/total_loss": loss,
            f"{split}/logvar": self.logvar,
            f"{split}/kl_loss_obj": kl_obj,
            f"{split}/nll_loss": nll_loss,
            f"{split}/weighted_nll_loss": w_nll,
            f"{split}/rec_loss": rec_mean,
            f"{split}/d_weight": d_weight,
            f"{split}/disc_factor": disc_factor,
            f"{split}/g_loss": g_loss,
            f"{split}/pose_loss": pose_loss,
            f"{split}/weighted_pose_loss": w_pose,
            f"{split}/mask_loss": mask_loss,
            f"{split}/weighted_mask_loss": w_mask,
            f"{split}/class_loss": class_loss,
            f"{split}/weighted_class_loss": w_class,
            f"{split}/bbox_loss": bbox_loss,
            f"{split}/weighted_bbox_loss": w_bbox,
            f"{split}/t1_loss": jnp.mean(t1),
            f"{split}/t2_loss": jnp.mean(t2),
            f"{split}/t3_loss": jnp.mean(t3),
            f"{split}/v3_loss": jnp.mean(v3),
            f"{split}/kl_loss_bbox": kl_bbox,
            f"{split}/weighted_kl_loss_bbox": self.kl_weight_bbox * kl_bbox,
            f"{split}/weighted_kl_loss_obj": self.kl_weight_obj * kl_obj,
            f"{split}/fill_factor_loss": fill_loss,
            f"{split}/weighted_fill_factor_loss": w_fill,
        }
        return loss, log

    def discriminator_loss(
        self,
        rgb_gt,
        dec_obj,
        class_gt,
        global_step,
        mask_2d_bbox,
        split="train",
    ):
        """optimizer_idx == 1 path (ref :352-375); inputs already detached by
        the caller (stop_gradient on dec_obj)."""
        mask_bg = self._mask_bg(class_gt).reshape(-1, 1, 1, 1)
        inputs_rgb = rgb_gt * mask_2d_bbox
        recons_rgb = dec_obj * mask_2d_bbox
        logits_real = self.discriminator(inputs_rgb, train=True) * mask_bg
        logits_fake = self.discriminator(recons_rgb, train=True) * mask_bg
        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        loss_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        d_loss = disc_factor * loss_fn(logits_real, logits_fake)
        log = {
            f"{split}/disc_loss": d_loss,
            f"{split}/logits_real": jnp.mean(logits_real),
            f"{split}/logits_fake": jnp.mean(logits_fake),
        }
        return d_loss, log

    def __call__(
        self,
        rgb_gt,
        mask_gt,
        pose_gt,
        dec_obj,
        dec_pose,
        class_gt,
        class_orig_id,
        bbox_gt,
        fill_factor_gt,
        posterior_obj,
        bbox_posterior,
        optimizer_idx: int,
        global_step,
        mask_2d_bbox,
        d_weight=0.0,
        split="train",
        weights=None,
    ):
        """Reference-shaped dispatch (optimizer_idx is static)."""
        if optimizer_idx == 0:
            return self.generator_loss(
                rgb_gt,
                mask_gt,
                pose_gt,
                dec_obj,
                dec_pose,
                class_gt,
                class_orig_id,
                bbox_gt,
                fill_factor_gt,
                posterior_obj,
                bbox_posterior,
                global_step,
                mask_2d_bbox,
                d_weight=d_weight,
                split=split,
                weights=weights,
            )
        return self.discriminator_loss(
            rgb_gt, jax.lax.stop_gradient(dec_obj), class_gt, global_step, mask_2d_bbox, split=split
        )


class LPIPSWithDiscriminator(nn.Module):
    """Plain AutoencoderKL loss (for the non-pose ``Autoencoder``): NLL(+LPIPS)
    + KL + PatchGAN (ldm.modules.losses.contperceptual.LPIPSWithDiscriminator
    [EXTERNAL]; subclassed untouched at ref contperceptual.py:21-24)."""

    disc_start: int = 0
    logvar_init: float = 0.0
    kl_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_conditional: bool = False
    disc_loss: str = "hinge"
    dtype: Any = jnp.float32

    def setup(self):
        self.perceptual_loss = LPIPS(dtype=self.dtype, name="perceptual")
        self.discriminator = NLayerDiscriminator(
            input_nc=self.disc_in_channels,
            n_layers=self.disc_num_layers,
            dtype=self.dtype,
            name="discriminator",
        )
        self.logvar = self.param(
            "logvar", nn.initializers.constant(self.logvar_init), ()
        )

    def nll_g_pair(self, inputs, recons, global_step):
        rec = jnp.abs(inputs - recons)
        if self.perceptual_weight > 0:
            rec = rec + self.perceptual_weight * self.perceptual_loss(inputs, recons)
        nll = jnp.sum(rec / jnp.exp(self.logvar) + self.logvar) / inputs.shape[0]
        g = -jnp.mean(self.discriminator(recons, train=True))
        return nll, g

    def nll_terms(self, inputs, recons):
        """NLL(+LPIPS) scalars only (no discriminator): ``(nll, rec_mean)``.
        Split so the adaptive-weight vjp for nll backprops through
        pixel+LPIPS ONLY (same rationale as PoseLoss.nll_terms)."""
        rec = jnp.abs(inputs - recons)
        if self.perceptual_weight > 0:
            rec = rec + self.perceptual_weight * self.perceptual_loss(inputs, recons)
        nll = jnp.sum(rec / jnp.exp(self.logvar) + self.logvar) / inputs.shape[0]
        return nll, jnp.mean(rec)

    def g_term(self, recons):
        """Generator GAN scalar only (one discriminator forward)."""
        return -jnp.mean(self.discriminator(recons, train=True))

    def __call__(
        self,
        inputs,
        recons,
        posterior,
        optimizer_idx: int,
        global_step,
        d_weight=0.0,
        split="train",
        rec_terms=None,
    ):
        if optimizer_idx == 0:
            if rec_terms is None:
                rec = jnp.abs(inputs - recons)
                if self.perceptual_weight > 0:
                    rec = rec + self.perceptual_weight * self.perceptual_loss(
                        inputs, recons
                    )
                nll = (
                    jnp.sum(rec / jnp.exp(self.logvar) + self.logvar)
                    / inputs.shape[0]
                )
                g = -jnp.mean(self.discriminator(recons, train=True))
                rec_mean = jnp.mean(rec)
            else:
                # precomputed by the train step's adaptive-weight vjps so
                # LPIPS/discriminator run (and backprop) exactly once
                nll, g, rec_mean = rec_terms
            kl = jnp.sum(posterior.kl()) / inputs.shape[0]
            disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
            loss = nll + self.kl_weight * kl + jnp.asarray(d_weight) * disc_factor * g
            log = {
                f"{split}/total_loss": loss,
                f"{split}/nll_loss": nll,
                f"{split}/rec_loss": rec_mean,  # monitored key (ldm logs it)
                f"{split}/kl_loss": kl,
                f"{split}/g_loss": g,
                f"{split}/logvar": self.logvar,
                f"{split}/d_weight": jnp.asarray(d_weight),
                f"{split}/disc_factor": disc_factor,
            }
            return loss, log
        logits_real = self.discriminator(jax.lax.stop_gradient(inputs), train=True)
        logits_fake = self.discriminator(jax.lax.stop_gradient(recons), train=True)
        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        loss_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        d_loss = disc_factor * loss_fn(logits_real, logits_fake)
        log = {
            f"{split}/disc_loss": d_loss,
            f"{split}/logits_real": jnp.mean(logits_real),
            f"{split}/logits_fake": jnp.mean(logits_fake),
        }
        return d_loss, log

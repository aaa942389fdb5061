"""Pose-aware KL autoencoder (flax) + experiment-facing wrappers.

TPU-native rebuild of ``src/models/autoencoder.py``:

- ``PoseAutoencoderNet`` — the pure flax module: dual-latent encode (object
  posterior + deterministic pose feature, ref :176-182), pose decode to a
  19-d vector via a sampled bbox posterior (:126-160), pose re-encode to a
  16x16x16 feature map (:162-174), staged z-dropout + N(0,1) noise
  (:184-206,226-241), and pose-conditioned reconstruction (:246-255).
  All step-dependent behavior takes a *traced* ``global_step`` so phase
  boundaries never retrace; an optional static ``phase`` lets the trainer
  skip decoder compute during encoder pretraining (one recompile per
  curriculum phase instead of dead compute).
- ``PoseAutoencoder`` / ``Autoencoder`` — orchestration wrappers whose
  constructor keyword surface matches the reference YAML ``model.params``
  exactly, so reference configs instantiate unchanged.

Conventions: NHWC activations; images in [-1, 1]; explicit PRNG streams
('sample', 'dropout', 'noise') replace torch's global RNG (:227,240).
torch-checkpoint layout parity: flatten/reshape between the pose MLPs and
feature maps goes through NCHW ordering (torch ``.view``), so converted
checkpoints stay bit-compatible.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import instantiate_from_config
from ..utils.distributions import DiagonalGaussianDistribution
from .blocks import Decoder, Encoder
from .pose_modules import PoseDecoderSpatialVAE, PoseEncoderSpatialVAE

POSE_6D_DIM = 4
FILL_FACTOR_DIM = 1
LHW_DIM = 3


def _resolve_dtype(dtype) -> Any:
    if isinstance(dtype, str):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}[
            dtype
        ]
    return dtype


class AutoencoderKLNet(nn.Module):
    """Plain KL autoencoder net (ldm ``AutoencoderKL`` [EXTERNAL] semantics)."""

    ddconfig: Dict[str, Any]
    embed_dim: int
    dtype: Any = jnp.float32
    fuse: bool = False  # fused gn+conv kernels (forward-only/inference nets)

    def setup(self):
        self.encoder = Encoder(self.ddconfig, dtype=self.dtype, fuse=self.fuse)
        self.decoder = Decoder(self.ddconfig, dtype=self.dtype, fuse=self.fuse)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), dtype=self.dtype
        )

    def encode(self, x):
        h = self.encoder(x)
        moments = self.quant_conv(h)
        return DiagonalGaussianDistribution.from_parameters(moments, axis=-1)

    def decode(self, z, return_pre_out: bool = False):
        z = self.post_quant_conv(z)
        return self.decoder(z, return_pre_out=return_pre_out)

    def __call__(self, x, sample_posterior: bool = True):
        posterior = self.encode(x)
        if sample_posterior:
            z = posterior.sample(self.make_rng("sample"))
        else:
            z = posterior.mode()
        dec, pre_out = self.decode(z, return_pre_out=True)
        return {"dec_obj": dec, "posterior_obj": posterior, "pre_out": pre_out}


class PoseAutoencoderNet(nn.Module):
    """The OD-VAE network (ref ``PoseAutoencoder`` forward, autoencoder.py:208-257)."""

    ddconfig: Dict[str, Any]
    embed_dim: int = 16
    feat_dims: Sequence[int] = (16, 16, 16)  # (C, H, W), torch layout
    pose_decoder_config: Optional[Dict[str, Any]] = None
    pose_encoder_config: Optional[Dict[str, Any]] = None
    num_classes: int = 11
    dropout_prob_init: float = 1.0
    dropout_prob_final: float = 0.7
    dropout_warmup_steps: int = 5000
    pose_conditioned_generation_steps: int = 10000
    encoder_pretrain_steps: int = 0
    add_noise_to_z_obj: bool = True
    dtype: Any = jnp.float32
    fuse: bool = False  # fused gn+conv kernels (forward-only/inference nets)

    def setup(self):
        self.encoder = Encoder(self.ddconfig, dtype=self.dtype, fuse=self.fuse)
        self.decoder = Decoder(self.ddconfig, dtype=self.dtype, fuse=self.fuse)
        # 1x1 quant convs (ref autoencoder.py:88-90)
        self.quant_conv_obj = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.quant_conv_pose = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), dtype=self.dtype
        )
        if self.pose_decoder_config is not None:
            self.pose_decoder = instantiate_from_config(
                self.pose_decoder_config, dtype=self.dtype
            )
        else:
            self.pose_decoder = PoseDecoderSpatialVAE(
                num_classes=self.num_classes, dtype=self.dtype
            )
        if self.pose_encoder_config is not None:
            self.pose_encoder = instantiate_from_config(
                self.pose_encoder_config, dtype=self.dtype
            )
        else:
            self.pose_encoder = PoseEncoderSpatialVAE(
                num_classes=self.num_classes, dtype=self.dtype
            )

    # -- pieces (ref autoencoder.py:126-206) -----------------------------------

    def encode(self, x):
        h = self.encoder(x)
        moments_obj = self.quant_conv_obj(h)
        pose_feat = self.quant_conv_pose(h)
        posterior_obj = DiagonalGaussianDistribution.from_parameters(
            moments_obj, axis=-1
        )
        return posterior_obj, pose_feat

    def decode(self, z, return_pre_out: bool = False):
        z = self.post_quant_conv(z)
        return self.decoder(z, return_pre_out=return_pre_out)

    def _decode_pose_to_distribution(self, z):
        c_pred = z[..., -self.num_classes :]
        d = POSE_6D_DIM + LHW_DIM + FILL_FACTOR_DIM
        bbox_mu = z[..., :d]
        bbox_logvar = jnp.clip(z[..., d : 2 * d], -30.0, 20.0)
        return DiagonalGaussianDistribution(mean=bbox_mu, logvar=bbox_logvar), c_pred

    def _decode_pose(self, pose_feat, sample_posterior: bool):
        b = pose_feat.shape[0]
        # torch .view(B, -1) flattens NCHW; keep that ordering for ckpt parity.
        flat = jnp.transpose(pose_feat, (0, 3, 1, 2)).reshape(b, -1)
        z = self.pose_decoder(flat)
        bbox_posterior, c_pred = self._decode_pose_to_distribution(z)
        if sample_posterior:
            bbox_pred = bbox_posterior.sample(self.make_rng("sample"))
        else:
            bbox_pred = bbox_posterior.mode()
        dec_pose = jnp.concatenate([bbox_pred, c_pred], axis=-1)
        return dec_pose, bbox_posterior

    def _encode_pose(self, dec_pose):
        flat = self.pose_encoder(dec_pose)  # (B, C*H*W)
        c, h, w = self.feat_dims
        return jnp.transpose(flat.reshape(-1, c, h, w), (0, 2, 3, 1))  # NHWC

    def dropout_prob(self, global_step):
        """Staged dropout schedule (ref :184-206), as traced arithmetic."""
        p_init = self.dropout_prob_init
        p_final = self.dropout_prob_final
        pretrain = self.encoder_pretrain_steps
        pose_cond = self.pose_conditioned_generation_steps
        warmup = max(self.dropout_warmup_steps, 1)
        ramp = p_init - (p_init - p_final) * (global_step - pretrain) / warmup
        p = jnp.where(
            global_step < pretrain + pose_cond,
            p_init,
            jnp.where(global_step < pretrain + pose_cond + warmup, ramp, p_final),
        )
        return jnp.clip(p, 0.0, 1.0)

    def __call__(
        self,
        x,
        global_step,
        sample_posterior: bool = True,
        phase: str = "auto",
        override_pose: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """Forward pass (ref :208-257).

        phase: 'auto' computes the reconstruction and gates it with the
        traced step (no retrace across the curriculum); 'pretrain' skips
        decoder compute entirely; 'full' always decodes.
        override_pose: replaces ``dec_pose`` before pose re-encoding — used
        by the perturbed-pose image probe (ref :379-395).
        """
        posterior_obj, pose_feat = self.encode(x)
        if sample_posterior:
            z_obj = posterior_obj.sample(self.make_rng("sample"))
        else:
            z_obj = posterior_obj.mode()

        p = self.dropout_prob(global_step)
        # torch nn.Dropout with traced p (ref :231-235): zero w.p. p, scale
        # kept values by 1/(1-p); all-zero at p=1 without inf*0.
        keep = (
            jax.random.uniform(self.make_rng("dropout"), z_obj.shape) >= p
        ).astype(z_obj.dtype)
        z_obj = z_obj * keep / jnp.maximum(1.0 - p, 1e-6)

        if self.add_noise_to_z_obj:
            z_obj = z_obj + jax.random.normal(
                self.make_rng("noise"), z_obj.shape, dtype=z_obj.dtype
            )

        dec_pose, bbox_posterior = self._decode_pose(pose_feat, sample_posterior)
        pose_for_decode = dec_pose if override_pose is None else override_pose

        if phase == "pretrain":
            dec_obj = jnp.zeros_like(x)
            c0 = self.ddconfig["ch"]
            pre_out = jnp.zeros(x.shape[:3] + (c0,), x.dtype)
        else:
            enc_pose = self._encode_pose(pose_for_decode)
            dec, pre_out = self.decode(z_obj + enc_pose, return_pre_out=True)
            if phase == "full":
                dec_obj = dec
            else:  # 'auto': gate with the traced step (ref :246-247)
                in_pretrain = global_step < self.encoder_pretrain_steps
                dec_obj = jnp.where(in_pretrain, jnp.zeros_like(dec), dec)

        return {
            "dec_obj": dec_obj,
            "dec_pose": dec_pose,
            "posterior_obj": posterior_obj,
            "bbox_posterior": bbox_posterior,
            "pre_out": pre_out,
            "dropout_prob": p,
        }

    def perturbed_pose_forward(self, x, pose, sample_posterior: bool = True):
        """Decode with an externally perturbed pose vector — the image-logging
        pose-controllability probe (ref autoencoder.py:386-395): fresh
        posterior sample, NO z-dropout/noise, pose re-encode, decode."""
        posterior_obj, _ = self.encode(x)
        if sample_posterior:
            z_obj = posterior_obj.sample(self.make_rng("sample"))
        else:
            z_obj = posterior_obj.mode()
        enc_pose = self._encode_pose(pose)
        dec, _ = self.decode(z_obj + enc_pose, return_pre_out=True)
        return dec


class _WrapperBase:
    """Shared wrapper plumbing (config-built, Lightning-free)."""

    monitor: Optional[str] = None
    learning_rate: float = 4.5e-6
    # which fused train/eval step family the Trainer builds for this model:
    # "pose" (PoseAutoencoder curriculum step) or "plain" (ldm AutoencoderKL)
    step_family: str = "pose"

    def init_variables(self, rng: jax.Array, batch_size: int = 1):
        raise NotImplementedError

    def inference_net(self):
        """Net used by forward-only paths (eval / serving / image logging).

        ``GDT_FUSE_INFERENCE=1`` returns a clone with the fused
        GN+SiLU+conv3x3 Pallas kernels (same parameter tree). Measured on
        v5e: the fused kernel wins ISOLATED per-shape A/B (1.3-2x at
        256^2/128^2) but LOSES composed into the full decoder (~0.6x) — XLA's
        cross-op fusion absorbs the GN into neighboring convs, while the
        kernel adds per-block stats passes and launch overhead. Kept as an
        opt-in for future tuning; default is the XLA lowering
        (docs/BENCH.md round-2 notes)."""
        import os

        if os.environ.get("GDT_FUSE_INFERENCE", "0") == "1":
            return self.net.clone(fuse=True)
        return self.net

    def _prepare_jit(self):
        """Cached jit of ``prepare_batch_device`` (``meta`` static). One
        compiled dispatch per batch replaces the per-op eager jnp calls the
        prefetch thread used to make."""
        fn = getattr(self, "_prep_jit_fn", None)
        if fn is None:
            fn = jax.jit(self.prepare_batch_device, static_argnums=(1, 2))
            self._prep_jit_fn = fn
        return fn

    def prepare_batch(self, batch, num_shards: int = 1) -> Dict[str, jnp.ndarray]:
        """Map a host batch dict into loss-ready device arrays: the pure-numpy
        host half (``prepare_batch_host``) + ONE jitted device dispatch
        (``prepare_batch_device``; ref get_input/_rescale,
        autoencoder.py:296-305,434-436). Shared by both model families —
        each defines only the two halves. ``num_shards`` is the data-axis
        size for per-shard normalization (see ``rescale_minmax``)."""
        host, meta = self.prepare_batch_host(batch)
        return self._prepare_jit()(host, meta, num_shards)

    def maybe_init_from_ckpt(self, net_params, loss_params):
        """Apply the config-driven torch-checkpoint overlay when
        ``ckpt_path`` is set (the reference loads it at construction,
        src/models/autoencoder.py:97-98); identity otherwise. Called by
        every state-building entrypoint (Trainer.fit, eval.py, serving)."""
        if not getattr(self, "ckpt_path", None):
            return net_params, loss_params
        import logging

        logging.info(
            "Initializing from torch checkpoint %s (ignore_keys=%s)",
            self.ckpt_path,
            list(self.ignore_keys),
        )
        return self.init_from_ckpt(
            net_params, loss_params, self.ckpt_path, self.ignore_keys
        )

    @staticmethod
    def _warm_kernel_dispatch() -> None:
        """Resolve Pallas availability EAGERLY (outside any jit trace) —
        the probe cannot run while module code is being traced, and an
        unwarmed dispatch would silently fall back to XLA kernels there."""
        from ..ops.dispatch import pallas_enabled

        try:
            pallas_enabled()
        except Exception:  # noqa: BLE001 — probing must never break init
            pass


class PoseAutoencoder(_WrapperBase):
    """Experiment wrapper with the reference constructor surface
    (ref autoencoder.py:39-107). Holds the net + loss flax modules, batch-key
    mapping, and checkpoint utilities; the functional train loop lives in
    ``generative_detection_tpu.train``.
    """

    def __init__(
        self,
        ddconfig,
        lossconfig,
        embed_dim,
        euler_convention="XYZ",
        ckpt_path=None,
        ignore_keys=(),
        image_mask_key=None,
        image_rgb_key="patch",
        pose_key="pose_6d",
        fill_factor_key="fill_factor",
        pose_perturbed_key="pose_6d_perturbed",
        class_key="class_id",
        bbox_key="bbox_sizes",
        colorize_nlabels=None,
        monitor=None,
        activation="relu",
        feat_dims=(16, 16, 16),
        pose_decoder_config=None,
        pose_encoder_config=None,
        dropout_prob_init=1.0,
        dropout_prob_final=0.7,
        dropout_warmup_steps=5000,
        pose_conditioned_generation_steps=10000,
        add_noise_to_z_obj=True,
        train_on_yaw=True,
        dtype="float32",
        lpips_weights_path=None,
        input_size=256,
    ):
        from ..losses.contperceptual import PoseLoss, build_prior_tables

        self.input_size = input_size

        self.image_rgb_key = image_rgb_key
        self.image_mask_key = image_mask_key
        self.pose_key = pose_key
        self.pose_perturbed_key = pose_perturbed_key
        self.class_key = class_key
        self.bbox_key = bbox_key
        self.fill_factor_key = fill_factor_key
        self.train_on_yaw = train_on_yaw
        self.euler_convention = euler_convention
        self.monitor = monitor
        self.embed_dim = embed_dim
        self.feat_dims = tuple(feat_dims)
        self.lpips_weights_path = lpips_weights_path
        self.ddconfig = dict(ddconfig)
        self.compute_dtype = _resolve_dtype(dtype)

        loss_params = dict(lossconfig.get("params") or {})
        self.encoder_pretrain_steps = loss_params.get("encoder_pretrain_steps", 0)
        self.num_classes = loss_params.get("num_classes", 11)

        self._warm_kernel_dispatch()
        self.net = PoseAutoencoderNet(
            ddconfig=dict(ddconfig),
            embed_dim=embed_dim,
            feat_dims=tuple(feat_dims),
            pose_decoder_config=pose_decoder_config,
            pose_encoder_config=pose_encoder_config,
            num_classes=self.num_classes,
            dropout_prob_init=dropout_prob_init,
            dropout_prob_final=dropout_prob_final,
            dropout_warmup_steps=dropout_warmup_steps,
            pose_conditioned_generation_steps=pose_conditioned_generation_steps,
            encoder_pretrain_steps=self.encoder_pretrain_steps,
            add_noise_to_z_obj=add_noise_to_z_obj,
            dtype=self.compute_dtype,
        )

        # Build the loss module (ref :85-86 injects train_on_yaw into lossconfig).
        prior_means, prior_logvars = build_prior_tables(
            loss_params.get("dataset_stats_path"), train_on_yaw
        )
        disc_start = loss_params.pop("disc_start", 0)
        disc_weight = loss_params.pop("disc_weight", 1.0)
        loss_params.pop("dataset_stats_path", None)
        self.loss = PoseLoss(
            train_on_yaw=train_on_yaw,
            disc_start=disc_start,
            disc_weight=disc_weight,
            prior_means=prior_means,
            prior_logvars=prior_logvars,
            dtype=self.compute_dtype,
            **loss_params,
        )
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)

    def init_from_ckpt(self, net_params, loss_params, path, ignore_keys=()):
        """Overlay a converted torch checkpoint onto initialized params
        (ref autoencoder.py:97-98 / ldm init_from_ckpt with key filtering)."""
        from ..utils.torch_compat import (
            convert_pose_autoencoder,
            filter_ignore_keys,
            load_torch_state_dict,
            overlay_params,
        )

        sd = load_torch_state_dict(path)
        sd = filter_ignore_keys(sd, ignore_keys or self.ignore_keys)
        net_overlay, loss_overlay = convert_pose_autoencoder(sd, self.ddconfig)
        net_params = overlay_params(net_params, net_overlay)
        if loss_params is not None and loss_overlay:
            loss_params = overlay_params(loss_params, loss_overlay)
        return net_params, loss_params

    # -- variable init ------------------------------------------------------------

    def example_batch(self, batch_size: int = 1) -> Dict[str, np.ndarray]:
        h = w = self.input_size
        return {
            self.image_rgb_key: np.zeros((batch_size, h, w, 3), np.float32),
            self.pose_key: np.zeros((batch_size, POSE_6D_DIM), np.float32),
            "yaw": np.zeros((batch_size,), np.float32),
            self.class_key: np.zeros((batch_size,), np.int32),
            "original_class_id": np.zeros((batch_size,), np.int32),
            self.bbox_key: np.zeros((batch_size, LHW_DIM), np.float32),
            self.fill_factor_key: np.zeros((batch_size,), np.float32),
            "mask_2d_bbox": np.ones((batch_size, h, w, 1), np.float32),
            self.pose_perturbed_key: np.zeros((batch_size, POSE_6D_DIM), np.float32),
            "yaw_perturbed": np.zeros((batch_size,), np.float32),
        }

    def init_variables(self, rng: jax.Array, batch_size: int = 1):
        """Initialize (net_params, loss_params)."""
        s = self.input_size
        x = jnp.zeros((batch_size, s, s, 3), jnp.float32)
        k_net, k_loss, k_rngs = jax.random.split(rng, 3)
        rngs = {
            "params": k_net,
            "sample": jax.random.fold_in(k_rngs, 0),
            "dropout": jax.random.fold_in(k_rngs, 1),
            "noise": jax.random.fold_in(k_rngs, 2),
        }
        net_vars = self.net.init(rngs, x, jnp.asarray(0, jnp.int32))
        outs = self.net.apply(
            net_vars,
            x,
            jnp.asarray(0, jnp.int32),
            rngs={k: v for k, v in rngs.items() if k != "params"},
        )
        loss_vars = self.loss.init(
            {"params": k_loss},
            x,
            None,
            jnp.zeros((batch_size, POSE_6D_DIM)),
            outs["dec_obj"],
            outs["dec_pose"],
            jnp.zeros((batch_size,), jnp.int32),
            jnp.zeros((batch_size,), jnp.int32),
            jnp.zeros((batch_size, LHW_DIM)),
            jnp.zeros((batch_size,)),
            outs["posterior_obj"],
            outs["bbox_posterior"],
            0,
            jnp.asarray(0, jnp.int32),
            jnp.ones((batch_size, s, s, 1)),
        )
        net_params = net_vars["params"]
        loss_params = loss_vars["params"]
        if self.lpips_weights_path:
            from .lpips import load_lpips_weights

            loss_params = dict(loss_params)
            loss_params["perceptual"] = load_lpips_weights(
                loss_params["perceptual"], self.lpips_weights_path
            )
        return net_params, loss_params

    # -- batch-key mapping (ref autoencoder.py:259-305) ---------------------------

    def get_pose_input(self, batch):
        """Pose vector with the yaw column injected (ref :262-265) —
        pure numpy; safe on the prefetch thread."""
        x = np.array(batch[self.pose_key], np.float32, copy=True)
        if self.train_on_yaw:
            x[:, 3] = np.asarray(batch["yaw"], np.float32)
        return x

    def prepare_batch_host(self, batch):
        """Host half of batch preparation: key mapping, layout fixes, dtype
        casts — PURE NUMPY, zero jnp dispatches (this runs on the prefetch
        thread; on a tunneled backend every eager jnp op is ~0.7 ms of
        round-trip, round-3 verdict weak-spot #5).

        Returns ``(host_dict, meta)`` where ``meta`` is a hashable static
        descriptor for the jitted device half (the image contract + raw-crop
        output size).
        """
        b = np.asarray(batch[self.class_key]).shape[0]
        out = {
            "pose_gt": self.get_pose_input(batch),
            "class_gt": np.asarray(batch[self.class_key], np.int32),
            "class_orig_id": np.asarray(
                batch.get("original_class_id", batch[self.class_key]), np.int32
            ),
            "bbox_gt": np.asarray(batch[self.bbox_key], np.float32),
            "fill_factor_gt": np.asarray(batch[self.fill_factor_key], np.float32),
            "yaw_perturbed": np.asarray(
                batch.get("yaw_perturbed", np.zeros(b)), np.float32
            ),
        }
        if "patch_raw" in batch:
            # device-preprocess contract (``dataset.device_preprocess: true``):
            # raw uint8 crops + mask rects; resize/normalize/mask run in jit
            out_size = int(np.asarray(batch["patch_out_size"]).ravel()[0])
            out["patch_raw"] = np.asarray(batch["patch_raw"])  # (B,S,S,3) u8
            out["patch_src_size"] = np.asarray(batch["patch_src_size"], np.float32)
            out["bbox_in_crop"] = np.asarray(batch["bbox_in_crop"], np.float32)
            return out, ("raw", out_size)
        rgb = np.asarray(batch[self.image_rgb_key], np.float32)
        if rgb.ndim == 4 and rgb.shape[1] == 3 and rgb.shape[-1] != 3:
            rgb = np.transpose(rgb, (0, 2, 3, 1))  # NCHW -> NHWC
        mask = np.asarray(batch["mask_2d_bbox"], np.float32)
        if mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[-1] != 1:
            mask = np.transpose(mask, (0, 2, 3, 1))
        out["rgb"] = rgb
        out["mask"] = mask
        return out, ("float",)

    def prepare_batch_device(self, host, meta, num_shards: int = 1) -> Dict[str, jnp.ndarray]:
        """Device half (jittable; ``meta`` and ``num_shards`` are static):
        rescale_minmax + (for raw crops) resize/normalize/mask — the BASELINE
        "jit preprocessing" stage. ``num_shards`` (the data-axis size under a
        sharded jit) makes rescale_minmax normalize per shard, matching the
        reference's per-DDP-rank normalization (ref autoencoder.py:434)."""
        host = dict(host)
        if meta[0] == "raw":
            from ..ops import batched_crop_resize, bbox_mask

            out_size = meta[1]
            src = host.pop("patch_src_size")
            centers = jnp.stack([src / 2.0, src / 2.0], axis=-1)
            rgb = batched_crop_resize(
                host.pop("patch_raw"), centers, src, out_size=out_size
            )
            mask = bbox_mask(host.pop("bbox_in_crop"), src, out_size)
        else:
            rgb = host.pop("rgb")
            mask = host.pop("mask")
        out = {k: jnp.asarray(v) for k, v in host.items()}
        out["rgb_gt"] = rescale_minmax(rgb, num_shards=num_shards)
        out["mask_2d_bbox"] = mask
        return out

def rescale_minmax(x: jnp.ndarray, num_shards: int = 1) -> jnp.ndarray:
    """2*(x - min)/(max - min) - 1 (ref autoencoder.py:434-436).

    The reference runs under DDP, so each rank normalizes over ITS OWN local
    batch. ``num_shards`` reproduces that under a single sharded jit: the
    batch normalizes in ``num_shards`` contiguous groups of ``B/num_shards``
    samples — exactly the per-rank result when the batch is contiguously
    sharded over the data mesh axis (and it keeps the min/max reductions
    shard-local, no collective). ``num_shards=1`` is the single-device case.
    """
    b = x.shape[0]
    if num_shards > 1 and b % num_shards == 0:
        g = x.reshape(num_shards, b // num_shards, *x.shape[1:])
        axes = tuple(range(1, g.ndim))
        lo = jnp.min(g, axis=axes, keepdims=True)
        hi = jnp.max(g, axis=axes, keepdims=True)
        out = 2.0 * (g - lo) / jnp.maximum(hi - lo, 1e-12) - 1.0
        return out.reshape(x.shape)
    lo, hi = jnp.min(x), jnp.max(x)
    return 2.0 * (x - lo) / jnp.maximum(hi - lo, 1e-12) - 1.0


class Autoencoder(_WrapperBase):
    """Plain KL autoencoder wrapper (ref ``Autoencoder``, autoencoder.py:29-32).

    Runs end-to-end through the same Trainer/CLI as the pose model: the
    Trainer dispatches on ``step_family`` to the plain fused train step and
    the ``{'image': (B,H,W,C) in [-1,1]}`` batch contract."""

    step_family = "plain"
    encoder_pretrain_steps = 0  # no curriculum: always the 'full' phase

    def __init__(
        self,
        ddconfig,
        lossconfig,
        embed_dim,
        ckpt_path=None,
        ignore_keys=(),
        image_key="image",
        colorize_nlabels=None,
        monitor=None,
        dtype="float32",
        **_,
    ):
        self.image_key = image_key
        self.monitor = monitor
        self.embed_dim = embed_dim
        self.compute_dtype = _resolve_dtype(dtype)
        self.ddconfig = dict(ddconfig)
        self._warm_kernel_dispatch()
        self.net = AutoencoderKLNet(
            ddconfig=dict(ddconfig), embed_dim=embed_dim, dtype=self.compute_dtype
        )
        self.loss = (
            instantiate_from_config(lossconfig) if lossconfig is not None else None
        )
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys)

    def example_batch(self, batch_size: int = 1) -> Dict[str, np.ndarray]:
        res = self.ddconfig.get("resolution", 256)
        return {
            self.image_key: np.zeros(
                (batch_size, res, res, self.ddconfig["in_channels"]), np.float32
            )
        }

    def init_from_ckpt(self, net_params, loss_params, path, ignore_keys=()):
        """Overlay a converted torch ldm-AutoencoderKL checkpoint
        (ref autoencoder.py:97-98 via the ldm base's init_from_ckpt)."""
        from ..utils.torch_compat import (
            convert_plain_autoencoder,
            filter_ignore_keys,
            load_torch_state_dict,
            overlay_params,
        )

        sd = load_torch_state_dict(path)
        sd = filter_ignore_keys(sd, ignore_keys or self.ignore_keys)
        net_overlay, loss_overlay = convert_plain_autoencoder(sd, self.ddconfig)
        net_params = overlay_params(net_params, net_overlay)
        if loss_params is not None and loss_overlay:
            loss_params = overlay_params(loss_params, loss_overlay)
        return net_params, loss_params

    def prepare_batch_host(self, batch):
        """ldm ``get_input`` semantics (ref autoencoder.py:296 via the base
        class): dataset provides images already in [-1, 1]; accept NCHW or
        NHWC and emit NHWC. Pure numpy (prefetch-thread safe)."""
        img = np.asarray(batch[self.image_key], np.float32)
        if img.ndim == 4 and img.shape[1] in (1, 3) and img.shape[-1] not in (1, 3):
            img = np.transpose(img, (0, 2, 3, 1))
        return {"image": img}, ("plain",)

    def prepare_batch_device(self, host, meta, num_shards: int = 1) -> Dict[str, jnp.ndarray]:
        return {"image": jnp.asarray(host["image"])}

    def init_variables(self, rng: jax.Array, batch_size: int = 1):
        res = self.ddconfig.get("resolution", 256)
        x = jnp.zeros((batch_size, res, res, self.ddconfig["in_channels"]), jnp.float32)
        k_net, k_loss, k_s = jax.random.split(rng, 3)
        net_vars = self.net.init({"params": k_net, "sample": k_s}, x)
        net_params = net_vars["params"]
        loss_params = None
        if self.loss is not None:
            outs = self.net.apply(net_vars, x, rngs={"sample": k_s})
            loss_vars = self.loss.init(
                {"params": k_loss}, x, outs["dec_obj"], outs["posterior_obj"], 0,
                jnp.asarray(0, jnp.int32),
            )
            loss_params = loss_vars["params"]
        return net_params, loss_params

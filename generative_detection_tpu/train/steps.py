"""Fused two-optimizer train step (the hot loop).

One jitted function replaces the reference's per-batch double
``training_step`` dispatch (ref src/models/autoencoder.py:295-330 under
Lightning's multi-optimizer loop):

1. generator pass: forward, adaptive discriminator weight, composite loss,
   grads over net params only, Adam update;
2. discriminator pass: hinge loss on detached reconstructions, grads over
   discriminator params only, Adam update.

Adaptive d_weight (ref contperceptual.py:294-304, ldm
``calculate_adaptive_weight``): ||grad(nll, conv_out.weight)|| /
(||grad(g_loss, conv_out.weight)|| + 1e-4), clipped to [0, 1e4], times
``disc_weight``, detached. Computed with one ``jax.vjp`` over the
reconstruction-dependent scalars (single LPIPS + discriminator forward,
primals reused in the total loss) and a second tiny vjp through the decoder's
final conv kernel — no full-graph second backward like torch needs.

Step counting: the reference pins PyTorch Lightning 1.9, where
``global_step`` counts *optimizer* steps — two per batch. With
``step_counting='optimizer'`` (default) the curriculum sees
``2*batch_idx`` (G pass) / ``2*batch_idx + 1`` (D pass), faithfully
reproducing the shipped config's effective phase lengths;
``'batch'`` gives the more intuitive one-step-per-batch counting.

Under ``jit`` over a ``Mesh`` with the batch sharded on the ``data`` axis,
all means/sums become global (XLA inserts psum over ICI) — this one function
is also the multi-chip data-parallel step.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .state import TrainState


def _global_steps(step: jnp.ndarray, step_counting: str):
    if step_counting == "optimizer":
        return 2 * step, 2 * step + 1
    return step, step


def _forward_rngs(rng: jax.Array, step: jnp.ndarray, salt: int = 0):
    k = jax.random.fold_in(jax.random.fold_in(rng, step), salt)
    return {
        "sample": jax.random.fold_in(k, 0),
        "dropout": jax.random.fold_in(k, 1),
        "noise": jax.random.fold_in(k, 2),
    }


def _conv_out_kernel_grads(net_params, pre_out, cotangents):
    """Pull reconstruction cotangents back through the decoder's final conv
    kernel only (the reference's ``last_layer`` = decoder.conv_out.weight)."""
    w = net_params["decoder"]["conv_out"]["kernel"].astype(jnp.float32)
    a = pre_out.astype(jnp.float32)

    def conv_out(w_):
        return jax.lax.conv_general_dilated(
            a, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    _, vjp_w = jax.vjp(conv_out, w)
    return [vjp_w(c.astype(jnp.float32))[0] for c in cotangents]


def _adaptive_d_weight(g_nll_w, g_g_w, disc_weight):
    num = jnp.linalg.norm(g_nll_w.reshape(-1))
    den = jnp.linalg.norm(g_g_w.reshape(-1)) + 1e-4
    return jnp.clip(num / den, 0.0, 1e4) * disc_weight


def _reattach_grad(value, y, gy):
    """Return ``value`` (computed on ``stop_gradient(y)``) carrying
    ``d value/d y := gy`` for the outer autodiff.

    The adaptive-weight machinery already computes the exact cotangents of
    the reconstruction-dependent scalars (one LPIPS backward, one
    discriminator backward). If those scalars re-entered the total through
    their primal graphs, the outer ``value_and_grad`` would differentiate
    LPIPS and the discriminator a SECOND time — the cotangent values differ
    between the two pulls, so XLA cannot CSE the duplicated backwards (the
    round-2 profile's "loss tail"). Surrogate: value + <y, sg(gy)> -
    sg(<y, gy>) has the same primal value and exactly gradient ``gy``.
    """
    dot = jnp.vdot(y, jax.lax.stop_gradient(gy))
    return value + dot - jax.lax.stop_gradient(dot)


def make_train_step(
    model,
    opt_ae,
    opt_disc,
    phase: str = "auto",
    disc_forward: str = "shared",
    step_counting: str = "optimizer",
    lean_pretrain: bool = True,
    accumulate_grad_batches: int = 1,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jittable train step for a ``PoseAutoencoder`` wrapper.

    disc_forward: 'shared' reuses the generator pass's reconstruction for the
    discriminator update (one backbone forward per batch); 'separate' re-runs
    the forward with the *updated* generator params and fresh noise, exactly
    like Lightning's sequential optimizer loop.

    lean_pretrain: when the static phase is 'pretrain', skip LPIPS and all
    discriminator compute entirely — in that phase the reconstruction is
    zeros, the total excludes every reconstruction/GAN term, and
    disc_factor==0 makes the D grads exactly zero, so only log-only values
    change (rec/g/disc metrics read 0 instead of their on-zeros values).
    Saves ~25-30%% of step cost for the first quarter of the recipe.

    accumulate_grad_batches: must match the ``optax.MultiSteps`` factor baked
    into ``opt_ae``/``opt_disc``. ``state.step`` counts micro-batches, but
    Lightning's ``global_step`` (which drives the curriculum, ref
    train.py:376-381 + autoencoder.py:184-206) counts OPTIMIZER steps — so
    the curriculum clock is ``state.step // k``. Forward PRNGs are also keyed
    on the optimizer step, making the accumulated update reproducible as a
    function of the window.
    """
    net, loss = model.net, model.loss
    pretrain = loss.encoder_pretrain_steps
    disc_factor_cfg = loss.disc_factor
    disc_weight_cfg = loss.disc_weight
    accum = max(int(accumulate_grad_batches), 1)

    # lean only valid when the discriminator cannot be active during pretrain
    lean = lean_pretrain and phase == "pretrain" and loss.disc_start >= pretrain

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        step = state.step
        opt_step = step // accum if accum > 1 else step
        step_g, step_d = _global_steps(opt_step, step_counting)
        rngs_g = _forward_rngs(state.rng, opt_step, salt=0)

        rgb = batch["rgb_gt"]
        loss_params = state.loss_params

        # ---- generator (optimizer_idx == 0) --------------------------------
        def gen_loss_fn(net_params):
            outs = net.apply(
                {"params": net_params}, rgb, step_g, phase=phase, rngs=rngs_g
            )
            y = outs["dec_obj"]

            if lean:
                z = jnp.zeros(())
                terms = (z, z, z, z)
                d_weight = z
            else:
                # SPLIT vjps: nll depends on pixel+LPIPS only, g_loss on the
                # discriminator only. One joint vjp would drag each cotangent
                # through BOTH subgraphs (a dead LPIPS backward for g and a
                # dead discriminator backward for nll — ~an extra full LPIPS
                # backward per step). Primals are reused in the total loss.
                def nll_fn(yy):
                    return loss.apply(
                        {"params": loss_params},
                        rgb,
                        yy,
                        batch["class_gt"],
                        batch["mask_2d_bbox"],
                        step_g,
                        method=loss.nll_terms,
                    )

                def g_fn(yy):
                    return loss.apply(
                        {"params": loss_params},
                        yy,
                        batch["class_gt"],
                        batch["mask_2d_bbox"],
                        method=loss.g_term,
                    )

                # vjp on a DETACHED y: the primal scalars re-enter the total
                # as surrogates carrying the precomputed cotangents, so the
                # outer backward never re-differentiates LPIPS or the
                # discriminator (see _reattach_grad).
                y_det = jax.lax.stop_gradient(y)
                (nll, w_nll, rec_mean), vjp_nll = jax.vjp(nll_fn, y_det)
                g_loss, vjp_g = jax.vjp(g_fn, y_det)
                gy_nll = vjp_nll((jnp.ones(()), jnp.zeros(()), jnp.zeros(())))[0]
                gy_g = vjp_g(jnp.ones(()))[0]
                g_nll_w, g_g_w = _conv_out_kernel_grads(
                    net_params, outs["pre_out"], (gy_nll, gy_g)
                )
                d_weight = _adaptive_d_weight(g_nll_w, g_g_w, disc_weight_cfg)
                # Gate EXACTLY as the reference pose loss does (ref
                # contperceptual.py:294-301): d_weight activates at
                # global_step > encoder_pretrain_steps — NOT at disc_start;
                # only disc_factor (adopt_weight inside generator_loss) keys
                # on disc_start. With the shipped recipe (pretrain 30000,
                # disc_start 30001) the logged train/d_weight is therefore
                # nonzero at step 30001 while disc_factor is still 0, same
                # as the reference. Pinned by test_d_weight_gate_parity.
                active = jnp.logical_and(disc_factor_cfg > 0.0, step_g > pretrain)
                d_weight = jax.lax.stop_gradient(jnp.where(active, d_weight, 0.0))
                # nll_terms is unweighted BY CONSTRUCTION (it takes no
                # weights argument), so w_nll == nll elementwise and
                # d w_nll/dy == gy_nll exactly
                terms = (
                    nll,
                    _reattach_grad(w_nll, y, gy_nll),
                    _reattach_grad(g_loss, y, gy_g),
                    rec_mean,
                )

            total, log = loss.apply(
                {"params": loss_params},
                rgb,
                None,
                batch["pose_gt"],
                y,
                outs["dec_pose"],
                batch["class_gt"],
                batch["class_orig_id"],
                batch["bbox_gt"],
                batch["fill_factor_gt"],
                outs["posterior_obj"],
                outs["bbox_posterior"],
                step_g,
                batch["mask_2d_bbox"],
                d_weight=d_weight,
                split="train",
                rec_terms=terms,
                method=loss.generator_loss,
            )
            return total, (log, outs)

        (aeloss, (log_ae, outs)), grads_ae = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.net_params)
        updates_ae, opt_ae_state = opt_ae.update(
            grads_ae, state.opt_ae_state, state.net_params
        )
        net_params = optax.apply_updates(state.net_params, updates_ae)

        # ---- discriminator (optimizer_idx == 1) -----------------------------
        if lean:
            # disc_factor == 0 throughout pretrain: grads are exactly zero,
            # so skip the three discriminator passes and the optimizer update
            z = jnp.zeros(())
            log_disc = {
                "train/disc_loss": z,
                "train/logits_real": z,
                "train/logits_fake": z,
            }
            discloss = z
            opt_disc_state = state.opt_disc_state
            new_loss_params = loss_params
        else:
            if disc_forward == "separate":
                rngs_d = _forward_rngs(state.rng, opt_step, salt=1)
                outs_d = net.apply(
                    {"params": net_params}, rgb, step_d, phase=phase, rngs=rngs_d
                )
                y_d = outs_d["dec_obj"]
            else:
                y_d = outs["dec_obj"]
            y_d = jax.lax.stop_gradient(y_d)

            def disc_loss_fn(disc_params):
                lp = dict(loss_params)
                lp["discriminator"] = disc_params
                return loss.apply(
                    {"params": lp},
                    rgb,
                    y_d,
                    batch["class_gt"],
                    step_d,
                    batch["mask_2d_bbox"],
                    split="train",
                    method=loss.discriminator_loss,
                )

            (discloss, log_disc), grads_d = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(loss_params["discriminator"])
            updates_d, opt_disc_state = opt_disc.update(
                grads_d, state.opt_disc_state, loss_params["discriminator"]
            )
            new_disc = optax.apply_updates(loss_params["discriminator"], updates_d)
            new_loss_params = dict(loss_params)
            new_loss_params["discriminator"] = new_disc

        metrics = dict(log_ae)
        metrics.update(log_disc)
        metrics["aeloss"] = aeloss
        metrics["discloss"] = discloss
        metrics["dropout_prob"] = outs["dropout_prob"]

        new_state = TrainState(
            step=step + 1,
            net_params=net_params,
            loss_params=new_loss_params,
            opt_ae_state=opt_ae_state,
            opt_disc_state=opt_disc_state,
            rng=state.rng,
        )
        return new_state, metrics

    return train_step


def make_plain_train_step(
    model,
    opt_ae,
    opt_disc,
    step_counting: str = "optimizer",
    accumulate_grad_batches: int = 1,
) -> Callable:
    """Fused train step for the plain ``Autoencoder`` family (ldm
    AutoencoderKL semantics: NLL+LPIPS + KL + PatchGAN; ref
    src/models/autoencoder.py:29-32 subclasses it unchanged). Batch contract:
    ``{'image': (B, H, W, C) in [-1, 1]}``."""
    net, loss = model.net, model.loss
    disc_weight_cfg = loss.disc_weight
    disc_factor_cfg = loss.disc_factor
    accum = max(int(accumulate_grad_batches), 1)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        step = state.step
        opt_step = step // accum if accum > 1 else step
        step_g, step_d = _global_steps(opt_step, step_counting)
        rngs = {"sample": jax.random.fold_in(jax.random.fold_in(state.rng, opt_step), 0)}
        x = batch["image"]
        loss_params = state.loss_params

        def gen_loss_fn(net_params):
            outs = net.apply({"params": net_params}, x, rngs=rngs)
            y = outs["dec_obj"]

            # SPLIT vjps on a DETACHED y (same scheme as the pose step): nll
            # backprops through pixel+LPIPS only, g through the discriminator
            # only, each exactly once; the primal scalars re-enter the total
            # as surrogates carrying the precomputed cotangents.
            def nll_fn(yy):
                return loss.apply(
                    {"params": loss_params}, x, yy, method=loss.nll_terms
                )

            def g_fn(yy):
                return loss.apply({"params": loss_params}, yy, method=loss.g_term)

            y_det = jax.lax.stop_gradient(y)
            (nll, rec_mean), vjp_nll = jax.vjp(nll_fn, y_det)
            g, vjp_g = jax.vjp(g_fn, y_det)
            gy_nll = vjp_nll((jnp.ones(()), jnp.zeros(())))[0]
            gy_g = vjp_g(jnp.ones(()))[0]
            g_nll_w, g_g_w = _conv_out_kernel_grads(
                net_params, outs["pre_out"], (gy_nll, gy_g)
            )
            d_weight = _adaptive_d_weight(g_nll_w, g_g_w, disc_weight_cfg)
            # ldm's LPIPSWithDiscriminator computes the adaptive weight with
            # NO step gate (only `disc_factor > 0`); the total is still
            # correct before disc_start because generator_loss multiplies by
            # adopt_weight(disc_factor, step, disc_start) == 0. Matching that
            # keeps the logged train/d_weight identical to ldm's from step 0.
            active = disc_factor_cfg > 0.0
            d_weight = jax.lax.stop_gradient(jnp.where(active, d_weight, 0.0))
            total, log = loss.apply(
                {"params": loss_params},
                x,
                y,
                outs["posterior_obj"],
                0,
                step_g,
                d_weight=d_weight,
                rec_terms=(
                    _reattach_grad(nll, y, gy_nll),
                    _reattach_grad(g, y, gy_g),
                    rec_mean,
                ),
            )
            return total, (log, outs)

        (aeloss, (log_ae, outs)), grads_ae = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.net_params)
        updates_ae, opt_ae_state = opt_ae.update(
            grads_ae, state.opt_ae_state, state.net_params
        )
        net_params = optax.apply_updates(state.net_params, updates_ae)

        y_d = jax.lax.stop_gradient(outs["dec_obj"])

        def disc_loss_fn(disc_params):
            lp = dict(loss_params)
            lp["discriminator"] = disc_params
            return loss.apply({"params": lp}, x, y_d, outs["posterior_obj"], 1, step_d)

        (discloss, log_disc), grads_d = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            loss_params["discriminator"]
        )
        updates_d, opt_disc_state = opt_disc.update(
            grads_d, state.opt_disc_state, loss_params["discriminator"]
        )
        new_loss_params = dict(loss_params)
        new_loss_params["discriminator"] = optax.apply_updates(
            loss_params["discriminator"], updates_d
        )

        metrics = dict(log_ae)
        metrics.update(log_disc)
        metrics["aeloss"] = aeloss
        metrics["discloss"] = discloss
        return (
            TrainState(
                step=step + 1,
                net_params=net_params,
                loss_params=new_loss_params,
                opt_ae_state=opt_ae_state,
                opt_disc_state=opt_disc_state,
                rng=state.rng,
            ),
            metrics,
        )

    return train_step


def make_plain_eval_step(
    model,
    step_counting: str = "optimizer",
    split: str = "val",
    accumulate_grad_batches: int = 1,
) -> Callable:
    """Validation step for the plain ``Autoencoder`` family: forward + both
    loss passes for logging only, d_weight = 0 (ldm AutoencoderKL
    validation_step semantics)."""
    net, loss = model.net, model.loss
    accum = max(int(accumulate_grad_batches), 1)

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray], eval_rng):
        step_g, step_d = _global_steps(state.step // accum, step_counting)
        x = batch["image"]
        rngs = {"sample": jax.random.fold_in(eval_rng, state.step)}
        outs = net.apply({"params": state.net_params}, x, rngs=rngs)
        _, log_ae = loss.apply(
            {"params": state.loss_params},
            x,
            outs["dec_obj"],
            outs["posterior_obj"],
            0,
            step_g,
            d_weight=0.0,
            split=split,
        )
        _, log_disc = loss.apply(
            {"params": state.loss_params},
            x,
            jax.lax.stop_gradient(outs["dec_obj"]),
            outs["posterior_obj"],
            1,
            step_d,
            split=split,
        )
        metrics = dict(log_ae)
        metrics.update(log_disc)
        return metrics

    return eval_step


def make_eval_step(
    model,
    phase: str = "auto",
    step_counting: str = "optimizer",
    split: str = "val",
    accumulate_grad_batches: int = 1,
) -> Callable:
    """Validation step (ref autoencoder.py:332-363): forward + both loss
    passes for logging only; d_weight = 0 like the reference's eval-mode
    RuntimeError fallback."""
    net, loss = model.net, model.loss
    accum = max(int(accumulate_grad_batches), 1)

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray], eval_rng):
        step_g, step_d = _global_steps(state.step // accum, step_counting)
        rngs = _forward_rngs(eval_rng, state.step, salt=2)
        rgb = batch["rgb_gt"]
        outs = net.apply(
            {"params": state.net_params}, rgb, step_g, phase=phase, rngs=rngs
        )
        _, log_ae = loss.apply(
            {"params": state.loss_params},
            rgb,
            None,
            batch["pose_gt"],
            outs["dec_obj"],
            outs["dec_pose"],
            batch["class_gt"],
            batch["class_orig_id"],
            batch["bbox_gt"],
            batch["fill_factor_gt"],
            outs["posterior_obj"],
            outs["bbox_posterior"],
            step_g,
            batch["mask_2d_bbox"],
            d_weight=0.0,
            split=split,
            method=loss.generator_loss,
        )
        _, log_disc = loss.apply(
            {"params": state.loss_params},
            rgb,
            jax.lax.stop_gradient(outs["dec_obj"]),
            batch["class_gt"],
            step_d,
            batch["mask_2d_bbox"],
            split=split,
            method=loss.discriminator_loss,
        )
        metrics = dict(log_ae)
        metrics.update(log_disc)
        return metrics

    return eval_step

#!/usr/bin/env python
"""OD-VAE evaluation CLI — the surface the reference README promises
(ref README.md:63-66: ``python eval.py ...``) but never shipped.

Runs batched crop -> encode -> pose-decode inference, recovers camera-frame
3D boxes from the pose latents, and reports reconstruction (PSNR, KL) and
per-patch detection metrics (center-distance matches, ATE/ASE/AOE, class
accuracy). Inference is data-parallel over the device mesh whenever the
batch size divides the device count (BASELINE config #5: "data-parallel over
ICI"); batches route through ``model.prepare_batch`` so both image contracts
work — host-preprocessed ``patch`` and ``device_preprocess: true`` raw
crops.

Detection metrics come in two granularities:
- 1:1 PER PATCH (one GT and one prediction per patch) — eval/metrics.py;
- set-based frame-level mAP/NDS-3 — patches grouped into real frames by
  ``(sample_idx, cam_idx)`` when the dataset emits them (nuscenes.py does),
  else each patch is its own pseudo-frame (synthetic data).

Usage:
  python eval.py -b configs/autoencoder/pose/synthetic_smoke.yaml \
      [-r logs/run/checkpoints] [--split validation] [--limit 8]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", default=list())
    p.add_argument("-r", "--resume", type=str, default="", help="logdir or ckpt dir")
    p.add_argument("--split", type=str, default="validation")
    p.add_argument("--limit", type=int, default=None, help="max batches")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--out", type=str, default=None, help="write metrics JSON here")
    return p.parse_known_args()


def main():
    logging.basicConfig(level=logging.INFO)
    opt, unknown = parse_args()

    import jax
    import jax.numpy as jnp

    from generative_detection_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()

    from generative_detection_tpu.config import instantiate_from_config, merge_configs
    from generative_detection_tpu.eval import detection_metrics, psnr, recover_boxes
    from generative_detection_tpu.losses.contperceptual import LABEL_NAMES
    from generative_detection_tpu.train.checkpoint import CheckpointManager

    config = merge_configs(opt.base, unknown)
    lightning_cfg = config.pop("lightning", {}) or {}
    if (lightning_cfg.get("trainer", {}) or {}).get("accelerator") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # CI / virtual-mesh tests
    model = instantiate_from_config(config["model"])
    data = instantiate_from_config(config["data"])
    data.setup()

    split = opt.split if opt.split in data.datasets else "validation"
    dataset = data.datasets[split]
    logging.info("Evaluating %s (%d items)", split, len(dataset))

    # Data-parallel inference mesh (BASELINE config #5): shard the batch over
    # every local device when the batch size divides the device count, else
    # fall back to one device (the XLA sharding contract needs even shards).
    from generative_detection_tpu.parallel import create_mesh, shard_batch

    devices = jax.devices()
    n_dev = max(
        n for n in range(1, len(devices) + 1) if data.batch_size % n == 0
    )
    if n_dev != len(devices):
        logging.warning(
            "batch_size %d not divisible by %d devices; evaluating on %d",
            data.batch_size, len(devices), n_dev,
        )
    mesh = create_mesh(devices[:n_dev])

    # Params-only state: inference never touches optimizer states, and a
    # full TrainState restore materializes both Adam states (~3x param
    # memory). Abstract shapes come from eval_shape (no allocation); a
    # checkpoint restores net_params only (orbax partial restore).
    from jax.sharding import NamedSharding, PartitionSpec

    repl = NamedSharding(mesh, PartitionSpec())
    if opt.resume:
        ckptdir = opt.resume
        if os.path.isdir(os.path.join(ckptdir, "checkpoints")):
            ckptdir = os.path.join(ckptdir, "checkpoints")
        abstract_net, _ = jax.eval_shape(
            lambda r: model.init_variables(r, batch_size=data.batch_size),
            jax.random.PRNGKey(opt.seed),
        )
        restored = CheckpointManager(ckptdir, monitor=model.monitor).restore_params(
            abstract_net
        )
        net_params = jax.device_put(restored["net_params"], repl)
        start_step = int(restored["step"])
        logging.info("Restored checkpoint params at step %d", start_step)
    else:
        net_params = jax.jit(
            lambda r: model.init_variables(r, batch_size=data.batch_size)[0],
            out_shardings=repl,
        )(jax.random.PRNGKey(opt.seed))
        # config-driven torch-checkpoint init (ref autoencoder.py:97-98)
        net_params, _ = model.maybe_init_from_ckpt(net_params, None)
        net_params = jax.device_put(net_params, repl)
        start_step = 0

    # per-class hmin/hmax tables for z recovery
    ds = data.datasets[split]
    inner = getattr(ds, "data", ds)
    hmin_d = getattr(inner, "hmin_dict", {n: 0.5 for n in LABEL_NAMES})
    hmax_d = getattr(inner, "hmax_dict", {n: 4.0 for n in LABEL_NAMES})
    hmin_t = jnp.asarray([hmin_d.get(n, 0.5) for n in LABEL_NAMES], jnp.float32)
    hmax_t = jnp.asarray([hmax_d.get(n, 4.0) for n in LABEL_NAMES], jnp.float32)

    def _infer_impl(net_params, rgb, step):
        # params as an argument (NOT a closure constant: closed-over weights
        # get baked into the HLO and blow up compile payloads)
        rngs = {
            "sample": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
        }
        outs = model.net.apply(
            {"params": net_params}, rgb, step, phase="full", rngs=rngs
        )
        return outs["dec_obj"], outs["dec_pose"], outs["posterior_obj"].kl()

    from generative_detection_tpu.utils.runtime import step_compiler_options

    _infer = [jax.jit(_infer_impl, compiler_options=step_compiler_options())]

    def infer(net_params, rgb, step):
        """One-shot Pallas->XLA rebuild on kernel-toolchain failure (ADVICE
        r3: a stale positive probe verdict within the 24 h TTL would
        otherwise make eval fail at compile time with no recourse)."""
        try:
            return _infer[0](net_params, rgb, step)
        except Exception as e:  # noqa: BLE001 — filtered below
            from generative_detection_tpu.ops.dispatch import reset_probe
            from generative_detection_tpu.train.loop import Trainer

            if not Trainer._is_pallas_toolchain_error(e):
                raise
            logging.warning(
                "Pallas kernel compilation failed in eval; rebuilding with "
                "XLA fallback kernels. (%s)", str(e).splitlines()[0] if str(e) else e,
            )
            reset_probe()
            os.environ["GDT_USE_PALLAS"] = "0"
            jax.clear_caches()
            _infer[0] = jax.jit(_infer_impl)
            return _infer[0](net_params, rgb, step)

    agg = {"psnr": [], "kl": []}
    all_pred, all_cls, all_gt, all_gtcls, all_fg = [], [], [], [], []
    all_score, all_frame = [], []
    step = jnp.asarray(10**9, jnp.int32)  # fully-trained phase gates

    loaders = {
        "validation": data.val_dataloader,
        "test": data.test_dataloader,
        "train": data.train_dataloader,
    }
    for i, batch in enumerate(loaders.get(split, data.val_dataloader)()):
        if opt.limit is not None and i >= opt.limit:
            break
        # prepare_batch handles BOTH image contracts (host float `patch` and
        # device_preprocess raw crops) and applies rescale_minmax; sharding
        # the prepared batch over the mesh makes the jit data-parallel.
        with mesh:
            prepared = shard_batch(
                model.prepare_batch(batch, num_shards=mesh.shape["data"]), mesh
            )
            rgb = prepared["rgb_gt"]
            dec_obj, dec_pose, kl = infer(net_params, rgb, step)
        rgb = np.asarray(rgb)
        agg["psnr"].append(psnr(rgb, np.asarray(dec_obj)))
        agg["kl"].append(float(np.mean(np.asarray(kl))))

        b = rgb.shape[0]
        # real frame identity when the dataset emits it (nuscenes.py:568-570);
        # a sentinel -1 means "no grouping known" (synthetic datasets)
        from generative_detection_tpu.eval import frame_ids_from_batch

        all_frame.append(frame_ids_from_batch(batch, b))
        patch_size = jnp.asarray(batch["patch_size"], jnp.float32).reshape(b, -1)[:, 0]
        center = jnp.asarray(batch["patch_center_2d"], jnp.float32).reshape(b, 2)
        resampling = jnp.asarray(batch["resampling_factor"], jnp.float32).reshape(b)
        if "cam2img" in batch:  # real camera intrinsics from the info pkl
            K = jnp.asarray(batch["cam2img"], jnp.float32).reshape(b, 3, 3)
            focal = K[:, 0, 0]
            pp = K[:, :2, 2]
        else:  # synthetic dataset's fixed camera
            focal = jnp.full((b,), 1266.0)
            pp = jnp.broadcast_to(jnp.asarray([800.0, 450.0]), (b, 2))
        rec = recover_boxes(
            dec_pose,
            focal_length=focal,
            principal_point=pp,
            patch_size=patch_size,
            patch_center=center,
            resampling_factor=resampling,
            hmin_table=hmin_t,
            hmax_table=hmax_t,
        )
        all_pred.append(np.asarray(rec["boxes_3d"]))
        all_cls.append(np.asarray(rec["class_id"]))
        all_gt.append(np.asarray(batch["bbox_3d_gt"], np.float32).reshape(b, -1)[:, :7])
        gtcls = np.asarray(batch["original_class_id"])
        all_gtcls.append(gtcls)
        all_fg.append(gtcls != 10)
        # confidence for the set-based eval: sigmoid prob of the argmax class
        # (focal-loss head semantics, ref contperceptual.py:176-181)
        logits = np.asarray(dec_pose[:, 8:])
        all_score.append(1.0 / (1.0 + np.exp(-np.max(logits, axis=-1))))

    results = {
        "split": split,
        "psnr": float(np.mean(agg["psnr"])),
        "kl": float(np.mean(agg["kl"])),
        "step": start_step,
    }
    results.update(
        detection_metrics(
            np.concatenate(all_pred),
            np.concatenate(all_cls),
            np.concatenate(all_gt),
            np.concatenate(all_gtcls),
            np.concatenate(all_fg),
        )
    )

    # set-based frame-level metrics (eval/detection.py). Patches group into
    # REAL frames by (sample_idx, cam_idx) when the dataset emits them —
    # multiple predictions/GTs per camera frame compete in the matching, the
    # nuScenes-protocol shape. Datasets without frame identity (synthetic)
    # fall back to one pseudo-frame per patch (matching stays honest: a
    # prediction can only match its own frame's GT).
    from generative_detection_tpu.eval import evaluate_detections

    pred_np = np.concatenate(all_pred)
    cls_np = np.concatenate(all_cls)
    gt_np = np.concatenate(all_gt)
    gtc_np = np.concatenate(all_gtcls)
    fg_np = np.concatenate(all_fg)
    score_np = np.concatenate(all_score)
    frame_np = np.concatenate(all_frame)

    def _sbox(frame, name, row, score=None):
        d = {
            "frame": int(frame),
            "class_name": name,
            "center": np.asarray([row[0], row[2]], np.float32),  # BEV (x, z)
            "size": np.asarray(row[3:6], np.float32),
            "yaw": float(row[6]),
        }
        if score is not None:
            d["score"] = float(score)
        return d

    preds_set, gts_set = [], []
    seen_gt = set()
    for f in range(pred_np.shape[0]):
        fid = int(frame_np[f]) if frame_np[f] >= 0 else (1 << 40) + f
        cid = int(cls_np[f])
        if 0 <= cid < len(LABEL_NAMES) and LABEL_NAMES[cid] != "background":
            preds_set.append(_sbox(fid, LABEL_NAMES[cid], pred_np[f], score_np[f]))
        if fg_np[f]:
            # dedupe identical GT instances within a frame: the patch dataset
            # samples one instance per item (nuscenes.py:563) and skip-forward
            # can land two items on the same camera frame, so the SAME
            # physical box can arrive twice — counting it twice inflates the
            # recall denominator and turns duplicate predictions into TPs
            gt_key = (fid, int(gtc_np[f]), gt_np[f].tobytes())
            if gt_key not in seen_gt:
                seen_gt.add(gt_key)
                gts_set.append(_sbox(fid, LABEL_NAMES[int(gtc_np[f])], gt_np[f]))
    set_metrics = evaluate_detections(
        preds_set, gts_set, [n for n in LABEL_NAMES if n != "background"]
    )
    results.update({f"set/{k}": v for k, v in set_metrics.items()})
    print(json.dumps(results, indent=2))
    if opt.out:
        with open(opt.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

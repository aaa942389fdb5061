#!/usr/bin/env python
"""Export a trained orbax checkpoint as a torch .ckpt the reference loads.

Closes the interop loop with the forward converter (``utils/torch_compat``):
a model trained in this framework can be handed back to the reference's
torch stack via its ``init_from_ckpt(ckpt_path)`` surface
(ref src/models/autoencoder.py:97-116). The export is params-only (no
optimizer state), LPIPS excluded (seeded-random unless pretrained weights
were dropped in), discriminator BN buffers written as fresh defaults —
the reference loads with strict=False, so absence of the rest is fine.

Usage:
    python tools/export_torch_ckpt.py -b <config.yaml> -r <run_or_ckpt_dir> \
        --out exported.ckpt
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="+", required=True, help="config YAML(s)")
    p.add_argument("-r", "--resume", required=True, help="run dir or checkpoints dir")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--seed", type=int, default=23)
    opt, unknown = p.parse_known_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is a host job

    from generative_detection_tpu.config import instantiate_from_config, merge_configs
    from generative_detection_tpu.train.checkpoint import CheckpointManager
    from generative_detection_tpu.utils.torch_compat import (
        export_pose_autoencoder,
        save_torch_checkpoint,
    )

    config = merge_configs(opt.base, unknown)
    model = instantiate_from_config(config["model"])

    ckptdir = opt.resume
    if os.path.isdir(os.path.join(ckptdir, "checkpoints")):
        ckptdir = os.path.join(ckptdir, "checkpoints")
    abstract_net, abstract_loss = jax.eval_shape(
        lambda r: model.init_variables(r, batch_size=1), jax.random.PRNGKey(opt.seed)
    )
    restored = CheckpointManager(ckptdir, monitor=model.monitor).restore_params(
        abstract_net, loss_template=abstract_loss
    )
    step = int(restored["step"])
    logging.info("Restored params at step %d from %s", step, ckptdir)

    # export_plain_autoencoder is the same mapping (single quant_conv pair)
    sd = export_pose_autoencoder(
        restored["net_params"], restored.get("loss_params")
    )
    save_torch_checkpoint(opt.out, sd, global_step=step)
    logging.info("Wrote %d tensors -> %s", len(sd), opt.out)


if __name__ == "__main__":
    main()

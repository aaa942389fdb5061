"""torch-checkpoint compatibility: state_dict -> flax parameter trees.

Supports the reference's ``init_from_ckpt(path, ignore_keys)`` surface
(ref src/models/autoencoder.py:97-98 via the ldm AutoencoderKL base) and the
BASELINE parity requirement (load converted torch AutoencoderKL/PoseAutoencoder
checkpoints and match per-patch outputs).

Layout conventions:
- torch conv weight (O, I, kH, kW) -> flax Conv kernel (kH, kW, I, O);
- torch Linear weight (out, in)    -> flax Dense kernel (in, out);
- GroupNorm / BatchNorm weight -> 'scale', bias -> 'bias' (BN running stats
  dropped: the discriminator normalizes by batch statistics);
- the reference's NCHW flatten/reshape points are already NCHW-ordered in
  this package (models/autoencoder.py), so no permutation is needed there.

Works on plain numpy dicts; ``.ckpt``/``.pth`` files are read with torch when
available (torch-cpu is enough).
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable, Tuple

import numpy as np


def _conv(sd, key):
    return {
        "kernel": np.transpose(np.asarray(sd[f"{key}.weight"]), (2, 3, 1, 0)),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _conv_nobias(sd, key):
    return {"kernel": np.transpose(np.asarray(sd[f"{key}.weight"]), (2, 3, 1, 0))}


def _dense(sd, key, bias=True):
    out = {"kernel": np.transpose(np.asarray(sd[f"{key}.weight"]), (1, 0))}
    if bias:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _norm(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"]),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _resnet_block(sd, prefix, has_shortcut):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if has_shortcut:
        out["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return out


def _attn_block(sd, prefix):
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "q": _conv(sd, f"{prefix}.q"),
        "k": _conv(sd, f"{prefix}.k"),
        "v": _conv(sd, f"{prefix}.v"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
    }


def convert_backbone(sd: Dict, torch_prefix: str, ddconfig: Dict, is_encoder: bool) -> Dict:
    """Convert an ldm Encoder/Decoder state_dict subtree (ldm naming:
    ``encoder.down.{i}.block.{j}...``) to this package's flax layout
    (``down_{i}_block_{j}`` etc., models/blocks.py)."""
    ch, ch_mult = ddconfig["ch"], tuple(ddconfig["ch_mult"])
    num_blocks = ddconfig["num_res_blocks"]
    attn_res = tuple(ddconfig["attn_resolutions"])
    n_levels = len(ch_mult)
    p = torch_prefix
    out: Dict = {
        "conv_in": _try(_conv, sd, f"{p}.conv_in"),
        "norm_out": _try(_norm, sd, f"{p}.norm_out"),
        "conv_out": _try(_conv, sd, f"{p}.conv_out"),
        "mid_block_1": _try(_resnet_block, sd, f"{p}.mid.block_1", False),
        "mid_attn_1": _try(_attn_block, sd, f"{p}.mid.attn_1"),
        "mid_block_2": _try(_resnet_block, sd, f"{p}.mid.block_2", False),
    }
    if is_encoder:
        curr_res = ddconfig["resolution"]
        in_mult = (1,) + ch_mult
        for i in range(n_levels):
            block_in = ch * in_mult[i]
            block_out = ch * ch_mult[i]
            for j in range(num_blocks):
                has_sc = (block_in if j == 0 else block_out) != block_out
                out[f"down_{i}_block_{j}"] = _try(
                    _resnet_block, sd, f"{p}.down.{i}.block.{j}", has_sc
                )
                if curr_res in attn_res:
                    out[f"down_{i}_attn_{j}"] = _try(
                        _attn_block, sd, f"{p}.down.{i}.attn.{j}"
                    )
            if i != n_levels - 1:
                out[f"down_{i}_downsample"] = {
                    "conv": _try(_conv, sd, f"{p}.down.{i}.downsample.conv")
                }
                curr_res //= 2
    else:
        curr_res = ddconfig["resolution"] // 2 ** (n_levels - 1)
        block_in = ch * ch_mult[-1]
        for i in reversed(range(n_levels)):
            block_out = ch * ch_mult[i]
            for j in range(num_blocks + 1):
                has_sc = (block_in if j == 0 else block_out) != block_out
                out[f"up_{i}_block_{j}"] = _try(
                    _resnet_block, sd, f"{p}.up.{i}.block.{j}", has_sc
                )
                if curr_res in attn_res:
                    out[f"up_{i}_attn_{j}"] = _try(
                        _attn_block, sd, f"{p}.up.{i}.attn.{j}"
                    )
            block_in = block_out
            if i != 0:
                out[f"up_{i}_upsample"] = {
                    "conv": _try(_conv, sd, f"{p}.up.{i}.upsample.conv")
                }
                curr_res *= 2
    return _prune(out)


def _try(fn, *args, **kwargs):
    """Build one converted subtree, or None when its torch keys are absent —
    the reference loads checkpoints with ``strict=False`` after deleting
    ``ignore_keys`` prefixes (ldm init_from_ckpt), so a filtered state_dict
    must convert as a PARTIAL overlay, not KeyError."""
    try:
        return fn(*args, **kwargs)
    except KeyError:
        return None


def _prune(tree):
    """Drop None/empty entries left by ``_try`` so ``overlay_params`` only
    touches leaves the checkpoint actually provides."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            v = _prune(v)
            if v is None or (isinstance(v, dict) and not v):
                continue
            out[k] = v
        return out
    return tree


def convert_pose_autoencoder(sd: Dict, ddconfig: Dict) -> Tuple[Dict, Dict]:
    """Full PoseAutoencoder state_dict -> (net_params, loss_params_overlay).

    Both returns are PARTIAL overlays: subtrees whose torch keys were removed
    by ``ignore_keys`` (or never saved) are simply absent."""
    net = _prune({
        "encoder": _try(convert_backbone, sd, "encoder", ddconfig, is_encoder=True),
        "decoder": _try(convert_backbone, sd, "decoder", ddconfig, is_encoder=False),
        "quant_conv_obj": _try(_conv, sd, "quant_conv_obj"),
        "quant_conv_pose": _try(_conv, sd, "quant_conv_pose"),
        "post_quant_conv": _try(_conv, sd, "post_quant_conv"),
        "pose_decoder": {
            "fc_in": _try(_dense, sd, "pose_decoder.layers.0"),
            "fc_1": _try(_dense, sd, "pose_decoder.layers.2"),
            "fc_out": _try(_dense, sd, "pose_decoder.layers.4"),
        },
        "pose_encoder": {
            "coord_linear": _try(_dense, sd, "pose_encoder.coord_linear"),
            "latent_linear": _try(_dense, sd, "pose_encoder.latent_linear", bias=False),
            "fc_1": _try(_dense, sd, "pose_encoder.layers.1"),
            "fc_out": _try(_dense, sd, "pose_encoder.layers.3"),
        },
    })
    return net, _loss_overlay(sd)


def _loss_overlay(sd: Dict) -> Dict:
    """Shared loss-module overlay: learned logvar + taming
    NLayerDiscriminator (Sequential indices for n_layers=3)."""
    loss_overlay: Dict = {}
    if "loss.logvar" in sd:
        loss_overlay["logvar"] = np.asarray(sd["loss.logvar"]).reshape(())
    disc_map = {"conv_0": 0, "conv_1": 2, "conv_2": 5, "conv_3": 8, "conv_out": 11}
    bn_map = {"bn_1": 3, "bn_2": 6, "bn_3": 9}
    if "loss.discriminator.main.0.weight" in sd:
        disc: Dict = {}
        for name, idx in disc_map.items():
            key = f"loss.discriminator.main.{idx}"
            disc[name] = _try(
                _conv if f"{key}.bias" in sd else _conv_nobias, sd, key
            )
        for name, idx in bn_map.items():
            disc[name] = _try(_norm, sd, f"loss.discriminator.main.{idx}")
        loss_overlay["discriminator"] = _prune(disc)
    return _prune(loss_overlay)


def convert_plain_autoencoder(sd: Dict, ddconfig: Dict) -> Tuple[Dict, Dict]:
    """Plain ldm ``AutoencoderKL`` state_dict -> (net_params, loss_overlay)
    (ref ``Autoencoder``, src/models/autoencoder.py:29-32 — single
    ``quant_conv``/``post_quant_conv`` instead of the dual pose/obj split).
    Partial-overlay semantics identical to ``convert_pose_autoencoder``."""
    net = _prune({
        "encoder": _try(convert_backbone, sd, "encoder", ddconfig, is_encoder=True),
        "decoder": _try(convert_backbone, sd, "decoder", ddconfig, is_encoder=False),
        "quant_conv": _try(_conv, sd, "quant_conv"),
        "post_quant_conv": _try(_conv, sd, "post_quant_conv"),
    })
    return net, _loss_overlay(sd)


def load_torch_state_dict(path: str) -> Dict:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def filter_ignore_keys(sd: Dict, ignore_keys: Iterable[str]) -> Dict:
    """Drop keys by prefix (ref ldm init_from_ckpt ignore_keys semantics)."""
    ignore = tuple(ignore_keys)
    out = {}
    for k, v in sd.items():
        if any(k.startswith(ik) for ik in ignore):
            logging.info("Deleting key %s from state_dict.", k)
            continue
        out[k] = v
    return out


def overlay_params(params: Dict, overlay: Dict) -> Dict:
    """Recursively replace leaves of ``params`` present in ``overlay``
    (shape-checked)."""
    import jax.numpy as jnp

    out = dict(params)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = overlay_params(out[k], v)
        else:
            cur = out.get(k)
            arr = jnp.asarray(v)
            if cur is not None and jnp.shape(cur) != arr.shape:
                raise ValueError(
                    f"shape mismatch for {k}: ckpt {arr.shape} vs model {jnp.shape(cur)}"
                )
            out[k] = arr
    return out

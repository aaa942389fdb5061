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


# -- reverse direction: flax parameter trees -> torch state_dict ---------------
#
# Lets a user move a model trained here BACK to the reference's torch stack
# (ref src/models/autoencoder.py:97-116 loads torch .ckpt state_dicts), and
# closes the interop loop: export -> convert_* -> overlay must round-trip
# bit-exactly (tests/test_torch_export.py).

_BACKBONE_RE = [
    # down_0_block_1 -> down.0.block.1 ; up_2_attn_0 -> up.2.attn.0
    (r"^(down|up)_(\d+)_(block|attn)_(\d+)$", r"\1.\2.\3.\4"),
    # down_0_downsample -> down.0.downsample ; up_2_upsample -> up.2.upsample
    (r"^(down|up)_(\d+)_(downsample|upsample)$", r"\1.\2.\3"),
    # mid_block_1 -> mid.block_1 ; mid_attn_1 -> mid.attn_1
    (r"^mid_(block|attn)_(\d+)$", r"mid.\1_\2"),
]


def _torch_name(flax_name: str) -> str:
    import re

    for pat, rep in _BACKBONE_RE:
        new, n = re.subn(pat, rep, flax_name)
        if n:
            return new
    return flax_name


def _export_leaf_module(tree: Dict, torch_key: str, sd: Dict) -> bool:
    """Write one torch module's tensors if ``tree`` is a flax leaf module
    (Conv/Dense via 'kernel' ndim, Group/BatchNorm via 'scale')."""
    if "kernel" in tree:
        k = np.asarray(tree["kernel"])
        if k.ndim == 4:  # flax (kH, kW, I, O) -> torch (O, I, kH, kW)
            sd[f"{torch_key}.weight"] = np.transpose(k, (3, 2, 0, 1))
        else:  # flax Dense (in, out) -> torch Linear (out, in)
            sd[f"{torch_key}.weight"] = np.transpose(k, (1, 0))
        if "bias" in tree:
            sd[f"{torch_key}.bias"] = np.asarray(tree["bias"])
        return True
    if "scale" in tree:
        sd[f"{torch_key}.weight"] = np.asarray(tree["scale"])
        sd[f"{torch_key}.bias"] = np.asarray(tree["bias"])
        return True
    return False


def _export_tree(tree: Dict, torch_prefix: str, sd: Dict) -> None:
    for name, sub in tree.items():
        key = f"{torch_prefix}.{_torch_name(name)}" if torch_prefix else _torch_name(name)
        if isinstance(sub, dict):
            if not _export_leaf_module(sub, key, sd):
                _export_tree(sub, key, sd)
        else:
            sd[key] = np.asarray(sub)


def _export_pose_mlp(tree: Dict, torch_prefix: str, sd: Dict) -> None:
    """spatial-VAE MLPs store as torch ``nn.Sequential`` indices with an
    activation between Linears (inverse of the maps in
    ``convert_pose_autoencoder``):

    - pose_decoder (has fc_in): fc_in -> layers.0, fc_i -> layers.{2i},
      fc_out -> layers.{2(n_hidden+1)}  (num_layers=2: 0, 2, 4)
    - pose_encoder (no fc_in; coord/latent linears are named): fc_i ->
      layers.{2i-1}, fc_out -> layers.{2*n_hidden+1}  (num_layers=2: 1, 3)
    """
    fcs = [n for n in tree if n.startswith("fc_") and n[3:].isdigit()]
    has_fc_in = "fc_in" in tree
    for name, sub in tree.items():
        if name == "fc_in":
            key = f"{torch_prefix}.layers.0"
        elif name == "fc_out":
            last = 2 * (len(fcs) + 1) if has_fc_in else 2 * len(fcs) + 1
            key = f"{torch_prefix}.layers.{last}"
        elif name in fcs:
            i = int(name[3:])
            key = f"{torch_prefix}.layers.{2 * i if has_fc_in else 2 * i - 1}"
        else:  # coord_linear / latent_linear keep their names
            key = f"{torch_prefix}.{name}"
        _export_leaf_module(sub, key, sd)


_DISC_CONV_IDX = {"conv_0": 0, "conv_1": 2, "conv_2": 5, "conv_3": 8, "conv_out": 11}
_DISC_BN_IDX = {"bn_1": 3, "bn_2": 6, "bn_3": 9}


def _export_loss(loss_params: Dict, sd: Dict) -> None:
    if "logvar" in loss_params:
        sd["loss.logvar"] = np.asarray(loss_params["logvar"]).reshape(())
    disc = loss_params.get("discriminator")
    if disc:
        for name, sub in disc.items():
            idx = _DISC_CONV_IDX.get(name, _DISC_BN_IDX.get(name))
            if idx is None:
                continue
            key = f"loss.discriminator.main.{idx}"
            _export_leaf_module(sub, key, sd)
            if name in _DISC_BN_IDX:
                # torch BatchNorm2d buffers: this package normalizes by batch
                # statistics (torch train-mode), so export fresh defaults for
                # torch-load completeness
                c = np.asarray(sub["scale"]).shape[0]
                sd[f"{key}.running_mean"] = np.zeros(c, np.float32)
                sd[f"{key}.running_var"] = np.ones(c, np.float32)
                sd[f"{key}.num_batches_tracked"] = np.asarray(0, np.int64)
    # LPIPS (loss.perceptual_loss.*) is intentionally NOT exported: the
    # in-package VGG is seeded-random unless pretrained weights were dropped
    # in; the reference loads checkpoints strict=False so absence is fine.


def export_pose_autoencoder(net_params: Dict, loss_params: Dict | None = None) -> Dict:
    """PoseAutoencoder flax params -> torch state_dict (numpy values).

    Exact inverse of ``convert_pose_autoencoder`` over the keys both sides
    share (LPIPS excluded, BN buffers exported as fresh defaults)."""
    sd: Dict = {}
    for top in ("encoder", "decoder"):
        if top in net_params:
            _export_tree(net_params[top], top, sd)
    for top in ("quant_conv_obj", "quant_conv_pose", "post_quant_conv", "quant_conv"):
        if top in net_params:
            _export_leaf_module(net_params[top], top, sd)
    if "pose_decoder" in net_params:
        _export_pose_mlp(net_params["pose_decoder"], "pose_decoder", sd)
    if "pose_encoder" in net_params:
        _export_pose_mlp(net_params["pose_encoder"], "pose_encoder", sd)
    if loss_params:
        _export_loss(loss_params, sd)
    return sd


def export_plain_autoencoder(net_params: Dict, loss_params: Dict | None = None) -> Dict:
    """Plain AutoencoderKL flax params -> torch state_dict (numpy values)."""
    return export_pose_autoencoder(net_params, loss_params)


def save_torch_checkpoint(path: str, sd: Dict, global_step: int = 0) -> None:
    """Write a Lightning-style .ckpt that the reference's ``init_from_ckpt``
    (and plain ``torch.load``) reads: ``{'state_dict': tensors, 'global_step'}``."""
    import torch

    torch.save(
        {
            # copy=True: torch tensors need writable buffers (jax arrays
            # export read-only numpy views)
            "state_dict": {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
            "global_step": int(global_step),
        },
        path,
    )


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

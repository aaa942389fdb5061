#!/usr/bin/env python
"""Convert torch LPIPS weights (torchvision vgg16 + taming vgg.pth linear
heads) into the .npz layout consumed by
``generative_detection_tpu.models.lpips.load_lpips_weights``.

Run on a machine with the public checkpoints available:
  python tools/convert_lpips.py --vgg16 vgg16-397923af.pth --lin vgg.pth \
      --out lpips_vgg.npz

torch conv weights are (O, I, kH, kW); flax expects (kH, kW, I, O).
"""

from __future__ import annotations

import argparse

import numpy as np


def t2f_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


# torchvision vgg16 'features' indices of the 13 convs, in order
_TV_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def main():
    import torch

    p = argparse.ArgumentParser()
    p.add_argument("--vgg16", required=True, help="torchvision vgg16 state_dict (.pth)")
    p.add_argument("--lin", required=True, help="taming LPIPS vgg.pth (lin heads)")
    p.add_argument("--out", default="lpips_vgg.npz")
    args = p.parse_args()

    vgg = torch.load(args.vgg16, map_location="cpu")
    lin = torch.load(args.lin, map_location="cpu")

    flat = {}
    for i, idx in enumerate(_TV_CONV_IDX, start=1):
        flat[f"vgg/conv{i}/kernel"] = t2f_conv(vgg[f"features.{idx}.weight"])
        flat[f"vgg/conv{i}/bias"] = np.asarray(vgg[f"features.{idx}.bias"])
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        flat[f"lin{i}/kernel"] = t2f_conv(lin[key])

    np.savez(args.out, **flat)
    print(f"wrote {args.out} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()

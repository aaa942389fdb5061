#!/usr/bin/env python
"""Per-class box-height range derivation (ref /root/reference/compute_hmin_hmax.py).

From the combined stats: hmin/hmax = mean -/+ 2*std of the box height ``h``
per class, written to ``dataset_stats/combined/{hmin,hmax}.pkl`` — consumed
by the dataset's z normalization (ref nuscenes.py:73-78,283-291).
"""

from __future__ import annotations

import argparse
import math
import os
import pickle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stats_dir", type=str, default="dataset_stats/combined")
    opt = p.parse_args()

    raw_path = os.path.join(opt.stats_dir, "raw_moments.pkl")
    all_path = os.path.join(opt.stats_dir, "all.pkl")
    hmin, hmax = {}, {}
    if os.path.exists(raw_path):
        with open(raw_path, "rb") as f:
            raw = pickle.load(f)
        for label, row in raw.items():
            mean, std = row["h"]["mean"], row["h"]["std"]
            hmin[label] = mean - 2 * std
            hmax[label] = mean + 2 * std
    else:  # fall back to (mean, logvar) pairs in all.pkl
        with open(all_path, "rb") as f:
            allstats = pickle.load(f)
        for label, row in allstats.items():
            mean, logvar = row["h"]
            std = math.exp(0.5 * logvar)
            hmin[label] = mean - 2 * std
            hmax[label] = mean + 2 * std

    with open(os.path.join(opt.stats_dir, "hmin.pkl"), "wb") as f:
        pickle.dump(hmin, f)
    with open(os.path.join(opt.stats_dir, "hmax.pkl"), "wb") as f:
        pickle.dump(hmax, f)
    print("hmin:", hmin)
    print("hmax:", hmax)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Loader-throughput benchmark: items/sec of the nuScenes patch loader.

Measures the host data path (native ROI JPEG decode + C++ crop/resize/mask +
label math, thread-pool workers) and the device-preprocess variant (host
ships raw uint8 crops; resize/normalize/mask run on-device in jit) against
a generated camera-image tree, so the number is comparable across machines
without the 300 GB dataset. The step-rate target context lives in
docs/BENCH.md.

Usage: python tools/bench_loader.py [--items 256] [--workers 16]
"""

import argparse
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_fake_tree(root: str, n_samples: int = 8) -> None:
    from PIL import Image

    rng = np.random.default_rng(5)
    cam = "CAM_FRONT"
    os.makedirs(os.path.join(root, "samples", cam), exist_ok=True)
    data_list = []
    for s in range(n_samples):
        fname = f"img_{s}.jpg"
        img = rng.integers(0, 255, size=(900, 1600, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "samples", cam, fname))
        cam2img = [[1266.0, 0.0, 800.0], [0.0, 1266.0, 450.0], [0.0, 0.0, 1.0]]
        insts = [
            {
                "bbox": [700.0 + 30 * i, 380.0, 900.0 + 30 * i, 520.0],
                "bbox_label": 0,
                "bbox_3d": [1.2, 0.8, 20.0, 4.0, 1.6, 1.9, 0.4],
                "center_2d": [800.0 + 30 * i, 450.0],
            }
            for i in range(3)
        ]
        images = {
            c: {"img_path": f"x/{fname}", "cam2img": cam2img}
            for c in [
                "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
            ]
        }
        data_list.append(
            {
                "sample_idx": s,
                "images": images,
                "cam_instances": {c: (insts if c == cam else []) for c in images},
            }
        )
    with open(os.path.join(root, "nuscenes_infos_train.pkl"), "wb") as f:
        pickle.dump({"metainfo": {}, "data_list": data_list}, f)


def bench(ds, n_items: int, workers: int) -> float:
    from concurrent.futures import ThreadPoolExecutor

    idxs = [i % len(ds) for i in range(n_items)]
    # warmup (decoder caches, thread pool spin-up)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(lambda i: ds[int(i)], idxs[: 2 * workers]))
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as pool:
        items = list(pool.map(lambda i: ds[int(i)], idxs))
    dt = time.perf_counter() - t0
    assert len(items) == n_items
    return n_items / dt


def bench_loader(ds, n_items: int, workers: int, worker_type: str, batch_size: int = 8) -> float:
    """End-to-end ``_Loader`` rate (collate + prefetch/reorder included) for
    the thread vs process worker paths — the number the Trainer actually
    sees, unlike ``bench`` which measures bare ``dataset[idx]`` fan-out."""
    from generative_detection_tpu.data.datamodule import _Loader

    loader = _Loader(
        ds,
        batch_size=batch_size,
        shuffle=False,
        num_workers=workers,
        worker_type=worker_type,
        drop_last=True,
    )
    epochs = max(1, n_items // (len(ds) // batch_size * batch_size))
    for _ in loader():  # warmup epoch (pool spawn, decoder caches)
        pass
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for batch in loader():
            n += batch["class_id"].shape[0]
    dt = time.perf_counter() - t0
    loader.shutdown()
    return n / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--items", type=int, default=256)
    p.add_argument("--workers", type=int, default=16)
    args = p.parse_args()

    from generative_detection_tpu.data.nuscenes import NuScenesTrain

    with tempfile.TemporaryDirectory() as root:
        make_fake_tree(root)
        kw = dict(
            data_root=root,
            label_names=["car", "background"],
            patch_height=256,
            negative_sample_prob=0.25,
            seed=0,
        )
        host = NuScenesTrain(**kw)
        rate_host = bench(host, args.items, args.workers)
        print(f"host path (C++ crop/resize/mask): {rate_host:8.1f} items/s")

        dev = NuScenesTrain(device_preprocess=True, **kw)
        rate_dev = bench(dev, args.items, args.workers)
        print(f"device-preprocess path (raw uint8): {rate_dev:8.1f} items/s")

        for wt in ("thread", "process"):
            rate = bench_loader(host, args.items, args.workers, wt)
            print(f"_Loader end-to-end [{wt:7s} workers]: {rate:8.1f} items/s")


if __name__ == "__main__":
    main()

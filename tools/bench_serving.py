#!/usr/bin/env python
"""Serving-latency benchmark: per-batch 3D-detector inference on the default
backend (the deployment surface the reference promises but never shipped,
ref README.md:63-66).

Measures the in-process jitted detector (params as jit arguments — the
production serving path) across a batch sweep, plus one leg through the
exported StableHLO artifact (weights baked) at the largest batch to price
the portability tax. Prints a human table and ONE final JSON line.

Usage:
    python tools/bench_serving.py                     # flagship ddconfig, TPU
    python tools/bench_serving.py --tiny              # tiny model, CPU smoke
    python tools/bench_serving.py --batches 1 8 32 --steps 50
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _percentiles(ts):
    a = np.asarray(ts) * 1e3
    return {
        "mean_ms": float(a.mean()),
        "p50_ms": float(np.percentile(a, 50)),
        "p95_ms": float(np.percentile(a, 95)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="+", default=None, help="config YAML(s)")
    p.add_argument("-r", "--resume", default=None, help="checkpoint dir (optional)")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8, 16, 32])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--tiny", action="store_true", help="tiny model on CPU (smoke)")
    p.add_argument(
        "--recon",
        action="store_true",
        help="also time the FULL reconstruction forward (encode -> pose decode"
        " -> image decode) — the BASELINE 'patch recon/sec (infer)' metric; the"
        " detector legs skip the image decoder",
    )
    p.add_argument("--seed", type=int, default=23)
    opt, unknown = p.parse_known_args()

    import jax

    if opt.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from generative_detection_tpu.config import instantiate_from_config, merge_configs
    from generative_detection_tpu.losses.contperceptual import LABEL_NAMES
    from generative_detection_tpu.serving import export_detector, load_detector, make_detector_fn
    from generative_detection_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()
    base = opt.base or [
        "configs/autoencoder/pose/tiny_cpu.yaml"
        if opt.tiny
        else "configs/autoencoder/pose/synthetic_smoke.yaml"
    ]
    config = merge_configs(base, unknown)
    model = instantiate_from_config(config["model"])
    # The model's true input size, NOT ddconfig.resolution: the flagship
    # recipe configures resolution=64 for attention placement while feeding
    # 256^2 patches (the reference quirk models/blocks.py documents).
    size = int(getattr(model, "input_size", None) or model.ddconfig.get("resolution", 256))

    rng = jax.random.PRNGKey(opt.seed)
    if opt.resume:
        from generative_detection_tpu.train.checkpoint import CheckpointManager

        abstract_net, _ = jax.eval_shape(
            lambda r: model.init_variables(r, batch_size=1), rng
        )
        ckptdir = opt.resume
        if os.path.isdir(os.path.join(ckptdir, "checkpoints")):
            ckptdir = os.path.join(ckptdir, "checkpoints")
        net_params = CheckpointManager(ckptdir, monitor=model.monitor).restore_params(
            abstract_net
        )["net_params"]
    else:
        net_params = jax.jit(lambda r: model.init_variables(r, batch_size=1)[0])(rng)

    hmin = jnp.asarray([0.5] * len(LABEL_NAMES), jnp.float32)
    hmax = jnp.asarray([4.0] * len(LABEL_NAMES), jnp.float32)
    detect = jax.jit(
        make_detector_fn(model, None, hmin, hmax, size, params_as_arg=True)
    )

    def make_args(b):
        r = np.random.default_rng(0)
        return (
            jnp.asarray(r.standard_normal((b, size, size, 3)), jnp.float32),
            jnp.full((b,), 1266.0, jnp.float32),
            jnp.tile(jnp.asarray([[800.0, 450.0]], jnp.float32), (b, 1)),
            jnp.full((b,), 240.0, jnp.float32),
            jnp.tile(jnp.asarray([[820.0, 430.0]], jnp.float32), (b, 1)),
            jnp.full((b,), float(size) / 240.0, jnp.float32),
        )

    results = []
    for b in opt.batches:
        args = make_args(b)
        out = detect(net_params, *args)  # compile + warmup
        jax.block_until_ready(out)
        ts = []
        for _ in range(opt.steps):
            t0 = time.perf_counter()
            jax.block_until_ready(detect(net_params, *args))
            ts.append(time.perf_counter() - t0)
        row = {"batch": b, **_percentiles(ts)}
        row["patches_per_s"] = b / (row["p50_ms"] / 1e3)
        results.append(row)
        print(
            f"batch {b:4d}: p50 {row['p50_ms']:8.2f} ms  p95 {row['p95_ms']:8.2f} ms"
            f"  {row['patches_per_s']:8.1f} patches/s"
        )

    recon_results = []
    if opt.recon:
        from generative_detection_tpu.utils.runtime import step_compiler_options

        def _recon_impl(params, rgb):
            rngs = {
                "sample": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "noise": jax.random.PRNGKey(2),
            }
            outs = model.net.apply(
                {"params": params}, rgb, jnp.asarray(0, jnp.int32),
                phase="full", rngs=rngs,
            )
            return outs["dec_obj"]

        recon = jax.jit(_recon_impl, compiler_options=step_compiler_options())
        for b in opt.batches:
            rgb = make_args(b)[0]
            jax.block_until_ready(recon(net_params, rgb))
            ts = []
            for _ in range(opt.steps):
                t0 = time.perf_counter()
                jax.block_until_ready(recon(net_params, rgb))
                ts.append(time.perf_counter() - t0)
            row = {"batch": b, **_percentiles(ts)}
            row["patches_per_s"] = b / (row["p50_ms"] / 1e3)
            recon_results.append(row)
            print(
                f"recon batch {b:4d}: p50 {row['p50_ms']:8.2f} ms "
                f" {row['patches_per_s']:8.1f} patches/s"
            )

    # exported-artifact leg (portable StableHLO, weights baked) at the
    # largest batch: the portability tax vs the in-process path
    b = opt.batches[-1]
    blob = export_detector(model, net_params, hmin, hmax, batch=b, input_size=size)
    fn = load_detector(blob)
    args = make_args(b)
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(opt.steps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    exported = {"batch": b, **_percentiles(ts), "artifact_bytes": len(blob)}
    print(
        f"exported artifact (batch {b}): p50 {exported['p50_ms']:.2f} ms "
        f"({exported['artifact_bytes'] / 1e6:.1f} MB blob)"
    )

    print(
        json.dumps(
            {
                "metric": "serving_latency",
                "backend": jax.devices()[0].platform,
                "model_resolution": size,
                "in_process": results,
                **({"recon": recon_results} if recon_results else {}),
                "exported": exported,
            }
        )
    )


if __name__ == "__main__":
    main()

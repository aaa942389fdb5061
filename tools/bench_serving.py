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


def _run_sweep(opt, model, net_params, hmin, hmax, size, make_args):
    """Compose-measure the forward-only kernel winners (docs/BENCH.md round
    4: subpixel upsample −21…−43% isolated, fused GN+SiLU+Winograd fwd up to
    −21% isolated, bf16) in the two deployment legs — detector (no image
    decoder) and full reconstruction — at the largest requested batch.

    The knobs are trace-time env vars, so each combo gets a FRESH jit; the
    env is restored after every leg. One table + one JSON line."""
    import jax
    import jax.numpy as jnp

    from generative_detection_tpu.serving import make_detector_fn
    from generative_detection_tpu.utils.runtime import step_compiler_options

    b = opt.batches[-1]
    args = make_args(b)
    knob_names = ("GDT_SUBPIXEL_UP", "GDT_WINOGRAD")
    combos = [
        ("fp32-xla", None, {}),  # the round-4 recorded baseline path
        ("bf16", jnp.bfloat16, {}),
        ("bf16+subpix", jnp.bfloat16, {"GDT_SUBPIXEL_UP": "1"}),
        ("bf16+fusedwino", jnp.bfloat16, {"GDT_WINOGRAD": "fused"}),
        (
            "bf16+subpix+fusedwino",
            jnp.bfloat16,
            {"GDT_SUBPIXEL_UP": "1", "GDT_WINOGRAD": "fused"},
        ),
    ]

    def timed(fn, *a):
        jax.block_until_ready(fn(*a))  # compile + warmup
        ts = []
        for _ in range(opt.steps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            ts.append(time.perf_counter() - t0)
        return _percentiles(ts)

    rows = []
    for name, dtype, env in combos:
        saved = {k: os.environ.get(k) for k in knob_names}
        os.environ.update(env)
        try:
            detect = jax.jit(
                make_detector_fn(
                    model, None, hmin, hmax, size, params_as_arg=True, dtype=dtype
                ),
                compiler_options=step_compiler_options(),
            )
            det = timed(detect, net_params, *args)

            net = model.net if dtype is None else model.net.clone(dtype=dtype)

            def _recon_impl(params, rgb):
                rngs = {
                    "sample": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1),
                    "noise": jax.random.PRNGKey(2),
                }
                outs = net.apply(
                    {"params": params}, rgb, jnp.asarray(0, jnp.int32),
                    phase="full", rngs=rngs,
                )
                return outs["dec_obj"]

            recon = jax.jit(_recon_impl, compiler_options=step_compiler_options())
            rec = timed(recon, net_params, args[0])
        except Exception as e:  # noqa: BLE001 — e.g. remote-compile outage
            print(f"{name:24s}: FAILED ({type(e).__name__}: {e})")
            rows.append({"combo": name, "error": str(e)})
            continue
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        row = {
            "combo": name,
            "batch": b,
            "detector_p50_ms": det["p50_ms"],
            "detector_patches_per_s": b / (det["p50_ms"] / 1e3),
            "recon_p50_ms": rec["p50_ms"],
            "recon_patches_per_s": b / (rec["p50_ms"] / 1e3),
        }
        rows.append(row)
        print(
            f"{name:24s}: detector p50 {det['p50_ms']:8.2f} ms "
            f"({row['detector_patches_per_s']:7.1f} p/s)   "
            f"recon p50 {rec['p50_ms']:8.2f} ms "
            f"({row['recon_patches_per_s']:7.1f} p/s)"
        )

    import jax as _jax

    print(
        json.dumps(
            {
                "metric": "serving_sweep",
                "backend": _jax.devices()[0].platform,
                "batch": b,
                "steps": opt.steps,
                "rows": rows,
            }
        )
    )


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
    p.add_argument(
        "--sweep",
        action="store_true",
        help="compose-measure the forward-only kernel candidates (bf16,"
        " GDT_SUBPIXEL_UP, GDT_WINOGRAD=fused) on the detector and recon legs"
        " at the largest --batches entry; prints one table + one JSON line",
    )
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

    if opt.sweep:
        _run_sweep(opt, model, net_params, hmin, hmax, size, make_args)
        return

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
        from generative_detection_tpu.serving import _resolve_serve_dtype
        from generative_detection_tpu.utils.runtime import step_compiler_options

        # same serving-default dtype resolution as make_detector_fn: bf16
        # (the measured sweep winner) unless GDT_SERVE_DTYPE=float32
        recon_dtype = _resolve_serve_dtype("auto")
        recon_net = (
            model.net if recon_dtype is None else model.net.clone(dtype=recon_dtype)
        )

        def _recon_impl(params, rgb):
            rngs = {
                "sample": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "noise": jax.random.PRNGKey(2),
            }
            outs = recon_net.apply(
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

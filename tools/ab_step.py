#!/usr/bin/env python
"""A/B a train-step variant against the bench baseline.

Builds the same flagship workload as bench.py with one knob changed and
prints ms/step for each leg. Every timing synchronizes via a scalar fetch
(docs/BENCH.md "Methodology" — this tunneled backend acks block_until_ready
early and streams non-scalars at ~20 MB/s).

Usage:
  python tools/ab_step.py --variant noclip         # grad_clip=None
  python tools/ab_step.py --variant baseline       # stock step only
  GDT_BENCH_STEPS=20 python tools/ab_step.py --variant noclip
  python tools/ab_step.py --xla xla_tpu_scoped_vmem_limit_kib=65536
    # --xla passes XLA:TPU flags as jit compiler_options (they reach the
    # remote compile service; bad flag names fail the compile loudly)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_step(mesh, state, step_fn, batch, steps: int) -> float:
    import jax

    with mesh:
        for _ in range(3):
            state, metrics = step_fn(state, batch)
        float(np.asarray(metrics["aeloss"]))  # sync
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, batch)
        aeloss = float(np.asarray(metrics["aeloss"]))
        dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(aeloss)
    return dt * 1e3


def build_variant(bs: int, dtype: str, variant: str, compiler_options=None):
    """bench.build with one knob changed; returns (mesh, state, fn, batch)."""
    import jax
    from generative_detection_tpu.config import load_yaml, instantiate_from_config
    from generative_detection_tpu.parallel import (
        create_mesh,
        replicated_scalar,
        shard_batch,
    )
    from generative_detection_tpu.train import (
        create_train_state,
        make_optimizers,
        make_train_step,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml(
        os.path.join(root, "configs/autoencoder/pose/autoencoder_kl_16x16x16.yaml")
    )
    cfg["model"]["params"]["lossconfig"]["params"]["dataset_stats_path"] = None
    cfg["model"]["params"]["dtype"] = dtype
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 2.16e-4

    grad_clip = None if variant == "noclip" else 1.0
    mesh = create_mesh()
    opt_ae, opt_disc = make_optimizers(model.learning_rate, grad_clip=grad_clip)
    step_fn = jax.jit(
        make_train_step(model, opt_ae, opt_disc, phase="full"),
        donate_argnums=(0,),
        compiler_options=compiler_options or None,
    )

    rng = np.random.default_rng(0)
    batch_host = model.example_batch(bs)
    batch_host["patch"] = rng.uniform(0, 1, size=(bs, 256, 256, 3)).astype(np.float32)
    cls = np.resize(np.asarray([0, 2, 10, 5], np.int32), bs)
    batch_host["class_id"] = cls
    batch_host["original_class_id"] = cls
    batch_host["mask_2d_bbox"] = rng.integers(0, 2, size=(bs, 256, 256, 1)).astype(
        np.float32
    )
    with mesh:
        state = create_train_state(
            model, jax.random.PRNGKey(0), bs, opt_ae, opt_disc, mesh=mesh
        )
        state = state.replace(step=replicated_scalar(40000, mesh, np.int32))
        prepared = shard_batch(model.prepare_batch(batch_host), mesh)
    return mesh, state, step_fn, prepared


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="baseline")
    p.add_argument("--bs", type=int, default=int(os.environ.get("GDT_BENCH_BS", 16)))
    p.add_argument("--dtype", default=os.environ.get("GDT_BENCH_DTYPE", "bfloat16"))
    p.add_argument("--steps", type=int, default=int(os.environ.get("GDT_BENCH_STEPS", 10)))
    p.add_argument(
        "--xla",
        default="",
        help="comma-separated xla_flag=value pairs passed as jit compiler_options",
    )
    opt = p.parse_args()

    from generative_detection_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()

    # Default to the production compiler options (train/bench/eval all jit
    # with these) so A/B legs measure what ships; --xla overrides entirely.
    from generative_detection_tpu.utils.runtime import step_compiler_options

    copts = dict(step_compiler_options() or {}) if not opt.xla else {}
    for kv in filter(None, opt.xla.split(",")):
        k, _, v = kv.partition("=")
        copts[k] = v
    mesh, state, fn, batch = build_variant(opt.bs, opt.dtype, opt.variant, copts)
    ms = time_step(mesh, state, fn, batch, opt.steps)
    tag = f" xla[{opt.xla}]" if opt.xla else ""
    print(
        f"variant={opt.variant}{tag} bs={opt.bs} {ms:.1f} ms/step "
        f"({opt.bs / ms * 1e3:.1f} p/s)"
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Isolated A/B of the conv formulations at the backbone's hot shapes.

Paths: XLA direct conv, pure-XLA 2-D Winograd, Pallas row-Winograd F(2,3)
and F(4,3) (with either the in-kernel Winograd weight-grad or the XLA
fallback), and the subpixel upsample-conv. Timings synchronize via a
device->host scalar fetch (docs/BENCH.md "Methodology": this tunneled
backend acks block_until_ready early and streams non-scalars slowly).

Usage:
  python tools/bench_conv_paths.py                 # all paths, all shapes
  python tools/bench_conv_paths.py --paths direct,wino2,wino4
  GDT_BENCH_STEPS=10 python tools/bench_conv_paths.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = [
    ((16, 256, 256, 128), 128),
    ((16, 128, 128, 128), 128),
    ((16, 64, 64, 256), 256),
    ((16, 16, 16, 512), 512),
]


def bench_one(fn, label, shape, cout, bwd, steps, gn=False):
    import jax
    import jax.numpy as jnp

    from generative_detection_tpu.utils.runtime import step_compiler_options

    b, h, w, cin = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)
    if gn:
        # GN-composite legs: production-shaped bf16 input, grads through the
        # norm affine too (the model trains gamma/beta).
        gamma = jnp.asarray(rng.normal(size=(cin,)) * 0.1 + 1.0, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(cin,)) * 0.1, jnp.float32)
        x = x.astype(jnp.bfloat16)

        def call(k_, x_, g_, bt_):
            return fn(x_, g_, bt_, k_, bias, jnp.bfloat16)

        if bwd:
            def loss(k_, x_, g_, bt_):
                return jnp.sum(call(k_, x_, g_, bt_).astype(jnp.float32) ** 2)

            gfn = jax.jit(
                jax.value_and_grad(loss, argnums=(0, 1, 2, 3)),
                compiler_options=step_compiler_options(),
            )
            run = lambda: gfn(k, x, gamma, beta)[0]
        else:
            f = jax.jit(
                lambda k_, x_, g_, bt_: jnp.sum(
                    call(k_, x_, g_, bt_).astype(jnp.float32)
                ),
                compiler_options=step_compiler_options(),
            )
            run = lambda: f(k, x, gamma, beta)
    elif bwd:
        def loss(k_, x_):
            return jnp.sum(fn(x_, k_, bias, jnp.bfloat16).astype(jnp.float32) ** 2)

        g = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1)),
            compiler_options=step_compiler_options(),
        )
        run = lambda: g(k, x)[0]
    else:
        f = jax.jit(
            lambda k_, x_: jnp.sum(fn(x_, k_, bias, jnp.bfloat16).astype(jnp.float32)),
            compiler_options=step_compiler_options(),
        )
        run = lambda: f(k, x)
    float(run())  # compile + sync
    t0 = time.perf_counter()
    v = None
    for _ in range(steps):
        v = run()
    float(v)
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{label:10s} {shape}->{cout} {'f+b' if bwd else 'fwd'}: {dt:.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--paths", default="direct,wino2,wino4,winoxla")
    p.add_argument("--steps", type=int, default=int(os.environ.get("GDT_BENCH_STEPS", 30)))
    p.add_argument(
        "--shapes",
        default=None,
        help="override shape list: 'N,H,W,Cin->Cout;...' (default: backbone hot shapes)",
    )
    opt = p.parse_args()

    shapes = SHAPES
    if opt.shapes:
        shapes = []
        for spec in opt.shapes.split(";"):
            dims, cout = spec.split("->")
            shapes.append((tuple(int(d) for d in dims.split(",")), int(cout)))

    from generative_detection_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()

    from generative_detection_tpu.ops.fused_conv import gn_silu_conv_reference
    from generative_detection_tpu.ops.winograd import direct_conv3x3, winograd_conv3x3
    from generative_detection_tpu.ops.winograd_pallas import (
        gn_silu_wino_conv3x3,
        wino_rows_conv3x3,
    )

    paths = {
        "direct": lambda x, k, b, dt: direct_conv3x3(x, k, b, dtype=dt),
        "winoxla": lambda x, k, b, dt: winograd_conv3x3(x, k, b, dtype=dt),
        "wino2": lambda x, k, b, dt: wino_rows_conv3x3(x, k, b, dt, 2),
        "wino4": lambda x, k, b, dt: wino_rows_conv3x3(x, k, b, dt, 4),
        # GN-composite legs (gn=True call contract: x, gamma, beta, k, bias):
        # the XLA GroupNorm+SiLU+conv lowering vs the fused Winograd kernel.
        "gnref": lambda x, g, bt, k, b, dt: gn_silu_conv_reference(x, g, bt, k, b),
        "gnwino2": lambda x, g, bt, k, b, dt: gn_silu_wino_conv3x3(x, g, bt, k, b, dt, 2),
        "gnwino4": lambda x, g, bt, k, b, dt: gn_silu_wino_conv3x3(x, g, bt, k, b, dt, 4),
    }
    wanted = [s for s in opt.paths.split(",") if s]
    for shape, cout in shapes:
        for bwd in (False, True):
            for name in wanted:
                bench_one(
                    paths[name], name, shape, cout, bwd, opt.steps,
                    gn=name.startswith("gn"),
                )


if __name__ == "__main__":
    main()

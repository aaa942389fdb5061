"""Process-level JAX runtime configuration shared by every entrypoint.

The round-2 benchmark regression (VERDICT.md "Missing #1") was operational:
``bench.py`` / ``train.py`` / ``eval.py`` recompiled every kernel from scratch
in every process, so a degraded remote-compile service turned a ~60 s startup
into a >10 min timeout and silently demoted the recorded benchmark to the XLA
fallback path. The fix is the persistent compilation cache the test suite
already used (``tests/conftest.py``): compiled executables are keyed by HLO
hash + backend and serialized to disk, so a warm cache makes a fresh process's
compiles near-instant (measured: 0.01 s vs 1.7 s cold for a toy graph; minutes
vs seconds for the fused train step) and independent of compile-service health.

Reference has no analogue — torch eagerly dispatches cuDNN/cuBLAS kernels and
pays no compile step (ref /root/reference/train.py:521 sets float32 matmul
precision and nothing else); under XLA the compile step exists and must be
amortized across processes.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")

_ENABLED = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable the on-disk XLA executable cache for this process.

    Call before the first ``jax.jit`` dispatch. Idempotent. The directory
    resolves in priority order: explicit arg > ``JAX_COMPILATION_CACHE_DIR``
    env > the in-repo (untracked) ``.jax_cache/``. On the build/driver
    machine the directory holds pre-warmed benchmark/train executables, so
    driver runs never depend on the remote compile service being healthy; a
    fresh clone starts cold and warms it on first use.
    """
    global _ENABLED
    import jax

    resolved = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or DEFAULT_CACHE_DIR
    )
    try:
        os.makedirs(resolved, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", resolved)
        # Cache everything that takes measurable time; tiny compiles are
        # cheap to redo and would bloat the directory.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # Don't skip small executables (default threshold can exclude them).
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — older jax without a flag: best-effort
        pass
    _ENABLED = True
    return resolved


def persistent_cache_enabled() -> bool:
    return _ENABLED


def step_compiler_options() -> dict | None:
    """XLA:TPU compiler options for jitting graphs that may contain the
    custom flash-attention kernel (``ops/attention.py::_attention_custom``).

    Its one-pass backward holds full-length K/V blocks plus two (L, C) f32
    accumulators in scoped VMEM — ~20.4 MiB at the flagship's 4096x256
    attention site, over the 16 MiB default cap (v5e has 128 MiB of VMEM
    total). Raising the cap to 32 MiB admits the kernel; the control A/B
    (docs/BENCH.md round 4) shows the raised cap alone changes nothing else
    (223.2 ms/step with the library kernel under either cap), while the
    admitted custom kernel is −10 ms/step.

    Returns None when the custom kernel cannot engage: off-TPU (the CPU
    compiler rejects TPU flag names — unit tests and the virtual-mesh
    dryrun must not see it) or when dispatch routes attention elsewhere.
    """
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return None
    from generative_detection_tpu.ops.dispatch import pallas_enabled

    if not pallas_enabled() or os.environ.get("GDT_ATTN_IMPL", "custom") == "lib":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "32768"}

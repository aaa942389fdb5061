"""Runtime dispatch between Pallas kernels and jnp/XLA fallbacks.

Policy (env var ``GDT_USE_PALLAS``):
- ``"1"``    — always use Pallas on TPU (fail loudly if compilation breaks);
- ``"0"``    — never use Pallas (pure XLA lowering);
- ``"auto"`` (default) — probe-compile a trivial kernel once per process; if
  the Pallas toolchain is unavailable/broken (e.g. a remote-compile service
  outage), fall back to the jnp reference implementations. The probe is
  bounded by a SIGALRM timeout so a hung compile service cannot stall
  training startup.
"""

from __future__ import annotations

import logging
import os
import signal

import jax

_PALLAS_OK: bool | None = None


def _probe(timeout_s: int = 240) -> bool:
    import jax.numpy as jnp
    import numpy as np

    # Probe compiles go through the persistent executable cache: a warm cache
    # answers in milliseconds regardless of remote-compile-service health (the
    # round-2 failure mode was the probe itself timing out on a degraded
    # service and silently demoting the whole run to XLA fallbacks).
    from ..utils.runtime import enable_persistent_cache, persistent_cache_enabled

    if not persistent_cache_enabled():
        enable_persistent_cache()

    def run_inner():
        # Compile the ACTUAL production kernels on small shapes. Compile
        # requests may be load-balanced over several (possibly broken) remote
        # workers, so probing a toy kernel is not predictive; the real
        # kernels double as numerical self-checks against the XLA references.
        from .attention import _attention_pallas, _attention_reference
        from .norm import _gn_pallas, _gn_reference

        x = jnp.asarray(np.linspace(-2, 2, 2 * 64 * 128, dtype=np.float32).reshape(2, 8, 8, 128))
        g = jnp.ones((128,), jnp.float32)
        b = jnp.zeros((128,), jnp.float32)
        got = _gn_pallas(x, g, b, 32, 1e-6, "silu")
        want = _gn_reference(x, g, b, 32, 1e-6, "silu")
        if float(jnp.max(jnp.abs(got - want))) > 1e-3:
            return False

        q = jnp.asarray(np.sin(np.arange(256 * 128, dtype=np.float32)).reshape(1, 256, 128))
        a_got = _attention_pallas(q, q, q)
        a_want = _attention_reference(q, q, q)
        return float(jnp.max(jnp.abs(a_got - a_want))) <= 2e-2

    run = run_inner

    if hasattr(signal, "SIGALRM"):
        def _on_alarm(signum, frame):
            raise TimeoutError("pallas probe timed out")

        old = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(timeout_s)
        try:
            return run()
        except Exception as e:  # noqa: BLE001 — any failure => fallback
            logging.warning("Pallas probe failed (%s); using XLA fallbacks.", e)
            return False
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    try:
        return run()
    except Exception as e:  # noqa: BLE001
        logging.warning("Pallas probe failed (%s); using XLA fallbacks.", e)
        return False


def interpret_mode() -> bool:
    """Interpreter-mode switch so kernels can be unit-tested on CPU."""
    return os.environ.get("GDT_PALLAS_INTERPRET", "0") == "1"


_PROBE_CACHE_PATH = os.environ.get(
    "GDT_PALLAS_PROBE_CACHE", "/tmp/gdt_pallas_probe.json"
)
# Asymmetric TTLs: a POSITIVE probe means the Pallas kernels compiled AND
# matched their XLA references numerically — that verdict stays valid for the
# life of the toolchain install, so keep it a day. A NEGATIVE probe usually
# means a transient service outage; retry sooner.
_PROBE_CACHE_TTL_OK_S = 86400.0
_PROBE_CACHE_TTL_FAIL_S = 600.0


def _read_fresh_cache():
    import json
    import time

    try:
        with open(_PROBE_CACHE_PATH) as f:
            entry = json.load(f)
        ttl = _PROBE_CACHE_TTL_OK_S if entry["ok"] else _PROBE_CACHE_TTL_FAIL_S
        if time.time() - entry["time"] < ttl:
            return bool(entry["ok"])
    except Exception:  # noqa: BLE001 — missing/corrupt cache
        pass
    return None


def reset_probe(clear_file_cache: bool = True) -> None:
    """Forget this process's probe verdict (and optionally the cross-process
    file cache) so the next ``pallas_enabled()`` re-probes. Used by bench.py
    to retry the Pallas path after an XLA-fallback run instead of accepting a
    transient probe timeout as the number of record."""
    global _PALLAS_OK
    _PALLAS_OK = None
    if clear_file_cache:
        try:
            os.unlink(_PROBE_CACHE_PATH)
        except OSError:
            pass


def _cached_probe() -> bool:
    """Probe with a cross-process TTL cache: a hung compile service makes the
    probe cost minutes, and every fresh process (train, eval, bench, tests)
    would pay it again otherwise."""
    import json
    import time

    cached = _read_fresh_cache()
    if cached is not None:
        return cached
    ok = _probe()
    try:
        with open(_PROBE_CACHE_PATH, "w") as f:
            json.dump({"time": time.time(), "ok": ok}, f)
    except OSError:
        pass
    return ok


def pallas_enabled() -> bool:
    """Whether Pallas kernels should be used on this backend (cached)."""
    global _PALLAS_OK
    if interpret_mode():
        return True
    mode = os.environ.get("GDT_USE_PALLAS", "auto")
    if mode == "0":
        return False
    # "axon" is a tunneled TPU backend used in some environments.
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if mode == "1":
        return True
    if _PALLAS_OK is None:
        trace_clean = None
        for mod_name in ("jax.core", "jax._src.core"):  # public first
            try:
                import importlib

                mod = importlib.import_module(mod_name)
                trace_clean = bool(mod.trace_state_clean())
                break
            except Exception:  # noqa: BLE001 — symbol moved/vanished
                continue
        if trace_clean is None:
            # Cannot tell whether we are inside a jit trace. Be CONSERVATIVE:
            # running the device probe here could be the exact tracer-leak /
            # remote-compile-under-tracing hazard this check prevents. Use a
            # fresh file-cache verdict if one exists, else XLA fallbacks for
            # this call (without poisoning the process/file cache).
            cached = _read_fresh_cache()
            if cached is None:
                logging.warning(
                    "trace_state_clean unavailable in this jax version; "
                    "using XLA fallbacks (no cached Pallas probe verdict)."
                )
                return False
            _PALLAS_OK = cached
            return _PALLAS_OK
        if not trace_clean:
            # First asked from INSIDE a jit trace (module code being traced):
            # running device probes here is unsafe (tracer leaks / remote
            # compile under tracing). Use a fresh file-cache answer if one
            # exists; otherwise fall back to XLA for THIS trace only, without
            # poisoning the process or file cache. Model wrappers warm the
            # probe eagerly at construction so this path is rare.
            cached = _read_fresh_cache()
            if cached is None:
                logging.warning(
                    "pallas_enabled() first called inside a jit trace; using "
                    "XLA fallbacks for this computation. Call pallas_enabled() "
                    "eagerly at startup to enable Pallas kernels."
                )
                return False
            _PALLAS_OK = cached
            return _PALLAS_OK
        _PALLAS_OK = _cached_probe()
        logging.info("Pallas availability probe: %s", _PALLAS_OK)
    return _PALLAS_OK

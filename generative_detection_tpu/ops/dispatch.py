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


def _probe(timeout_s: int = 120) -> bool:
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, acc):
        acc[:] = x_ref[:] * 2.0
        o_ref[:] = acc[:]

    def run():
        # Two compiles (distinct shapes) because compile requests may be
        # load-balanced over several workers; a representative kernel with a
        # grid + scratch catches more toolchain breakage than a trivial one.
        for rows in (8, 16):
            x = jnp.ones((2, rows, 128), jnp.float32)
            y = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2, rows, 128), jnp.float32),
                grid=(2,),
                in_specs=[
                    pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
                ],
                out_specs=pl.BlockSpec(
                    (1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[pltpu.VMEM((1, rows, 128), jnp.float32)],
            )(x)
            if float(y[0, 0, 0]) != 2.0:
                return False
        return True

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
        _PALLAS_OK = _probe()
        logging.info("Pallas availability probe: %s", _PALLAS_OK)
    return _PALLAS_OK

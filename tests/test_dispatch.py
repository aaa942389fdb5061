"""Kernel dispatch policy: env modes, probe caching, CPU behavior."""

import json

import pytest

from generative_detection_tpu.ops import dispatch


@pytest.fixture(autouse=True)
def reset(monkeypatch, tmp_path):
    monkeypatch.setattr(dispatch, "_PALLAS_OK", None)
    monkeypatch.setattr(dispatch, "_PROBE_CACHE_PATH", str(tmp_path / "probe.json"))
    yield


def test_cpu_backend_disables_pallas(monkeypatch):
    monkeypatch.delenv("GDT_USE_PALLAS", raising=False)
    assert dispatch.pallas_enabled() is False  # conftest pins CPU


def test_mode_0_and_1(monkeypatch):
    monkeypatch.setenv("GDT_USE_PALLAS", "0")
    assert dispatch.pallas_enabled() is False
    # mode 1 still requires a TPU backend; on CPU it stays off
    monkeypatch.setenv("GDT_USE_PALLAS", "1")
    assert dispatch.pallas_enabled() is False


def test_interpret_mode_wins(monkeypatch):
    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")
    assert dispatch.pallas_enabled() is True


def test_probe_cache_roundtrip(monkeypatch, tmp_path):
    calls = []

    def fake_probe(timeout_s=240):
        calls.append(1)
        return True

    monkeypatch.setattr(dispatch, "_probe", fake_probe)
    assert dispatch._cached_probe() is True
    assert dispatch._cached_probe() is True  # served from file cache
    assert len(calls) == 1
    entry = json.load(open(dispatch._PROBE_CACHE_PATH))
    assert entry["ok"] is True


def test_probe_cache_expiry(monkeypatch):
    # TTLs are ASYMMETRIC: negative verdicts (usually transient service
    # outages) expire on the short clock, positive ones on the long one
    monkeypatch.setattr(dispatch, "_probe", lambda timeout_s=240: False)
    monkeypatch.setattr(dispatch, "_PROBE_CACHE_TTL_FAIL_S", 0.0)
    assert dispatch._cached_probe() is False
    monkeypatch.setattr(dispatch, "_probe", lambda timeout_s=240: True)
    assert dispatch._cached_probe() is True  # fail-TTL 0 -> re-probe
    # positive verdict persists even with the fail TTL at zero
    monkeypatch.setattr(dispatch, "_probe", lambda timeout_s=240: False)
    assert dispatch._cached_probe() is True


def test_reset_probe_clears_verdict(monkeypatch):
    monkeypatch.setattr(dispatch, "_probe", lambda timeout_s=240: False)
    assert dispatch._cached_probe() is False
    dispatch.reset_probe()
    monkeypatch.setattr(dispatch, "_probe", lambda timeout_s=240: True)
    assert dispatch._cached_probe() is True  # file cache cleared -> re-probe


def test_step_compiler_options_off_tpu(monkeypatch):
    """The scoped-VMEM compiler option (needed by the custom flash-attention
    backward, ops/attention.py) must never reach a non-TPU compile: the CPU
    backend rejects TPU flag names, so on this CPU-pinned suite the helper
    returns None regardless of the Pallas env knobs."""
    from generative_detection_tpu.utils.runtime import step_compiler_options

    monkeypatch.delenv("GDT_ATTN_IMPL", raising=False)
    assert step_compiler_options() is None
    monkeypatch.setenv("GDT_USE_PALLAS", "1")
    assert step_compiler_options() is None


def test_step_compiler_options_on_tpu(monkeypatch):
    """On a TPU backend with Pallas dispatch active, the helper returns the
    raised scoped-VMEM cap; GDT_ATTN_IMPL=lib (library kernel, fits the
    default cap) turns it back off."""
    import jax

    from generative_detection_tpu.utils import runtime

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda: True)
    monkeypatch.delenv("GDT_ATTN_IMPL", raising=False)
    opts = runtime.step_compiler_options()
    assert opts == {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    monkeypatch.setenv("GDT_ATTN_IMPL", "lib")
    assert runtime.step_compiler_options() is None

"""Winograd F(2x2, 3x3) conv equals XLA's direct conv (ops/winograd.py).

Pins the transform algebra (exact in exact arithmetic), gradients through
the Winograd graph, and the opt-in dispatch on the backbone's Conv3x3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.ops.winograd import (
    direct_conv3x3,
    transform_kernel,
    winograd_conv3x3,
)


@pytest.mark.parametrize(
    "h,w,cin,cout", [(8, 8, 16, 16), (6, 10, 8, 24), (16, 16, 3, 32)]
)
def test_winograd_matches_direct_fp32(h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = direct_conv3x3(x, k, b)
    got = winograd_conv3x3(x, k, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_kernel_transform_identity():
    # U for the identity-ish kernel delta at center tap: G g G^T rows known.
    k = np.zeros((3, 3, 1, 1), np.float32)
    k[1, 1, 0, 0] = 1.0
    u = np.asarray(transform_kernel(jnp.asarray(k)))[:, :, 0, 0]
    g_center = np.array([0.0, 0.5, -0.5, 0.0], np.float32)
    np.testing.assert_allclose(u, np.outer(g_center, g_center), atol=1e-7)


def test_gradients_match_direct():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    gd = jax.grad(lambda k_, x_: jnp.sum(direct_conv3x3(x_, k_, b) ** 2), (0, 1))
    gw = jax.grad(lambda k_, x_: jnp.sum(winograd_conv3x3(x_, k_, b) ** 2), (0, 1))
    gk_d, gx_d = gd(k, x)
    gk_w, gx_w = gw(k, x)
    np.testing.assert_allclose(np.asarray(gk_w), np.asarray(gk_d), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_d), rtol=1e-4, atol=1e-4)


def test_bf16_error_within_kernel_path_tolerance():
    # bf16 Winograd error must stay in the same class as the accepted
    # Pallas-vs-XLA bf16 deltas (docs/BENCH.md numerics table, ~3e-3 rel).
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 32, 32)).astype(np.float32) * 0.1)
    ref = direct_conv3x3(x, k, None, dtype=jnp.float32)
    got = winograd_conv3x3(x, k, None, dtype=jnp.bfloat16).astype(jnp.float32)
    denom = float(jnp.mean(jnp.abs(ref))) + 1e-8
    rel = float(jnp.mean(jnp.abs(got - ref))) / denom
    assert rel < 2e-2, rel


def test_conv3x3_winograd_dispatch(monkeypatch):
    from generative_detection_tpu.models.blocks import Conv3x3

    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 8)), jnp.float32)
    monkeypatch.delenv("GDT_WINOGRAD", raising=False)
    mod = Conv3x3(8)
    params = mod.init(jax.random.PRNGKey(0), x)
    y_direct = mod.apply(params, x)
    monkeypatch.setenv("GDT_WINOGRAD", "1")
    y_win = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_win), np.asarray(y_direct), rtol=3e-5, atol=3e-5
    )


def test_full_train_step_with_winograd(monkeypatch, rng):
    """The fused train step (fwd + both backwards + both Adams) composes
    through the Winograd conv graph: finite losses, params update."""
    from generative_detection_tpu.train import (
        create_train_state,
        make_optimizers,
        make_train_step,
    )
    from tests.test_models import small_model
    from tests.test_train_step import _batch

    monkeypatch.setenv("GDT_WINOGRAD", "1")
    m = small_model()
    m.learning_rate = 1e-4
    opt_ae, opt_disc = make_optimizers(m.learning_rate, grad_clip=1.0)
    state = create_train_state(m, jax.random.PRNGKey(0), 2, opt_ae, opt_disc)
    step_fn = jax.jit(make_train_step(m, opt_ae, opt_disc, step_counting="batch"))
    new_state, metrics = step_fn(state, _batch(m, rng))
    assert np.isfinite(float(metrics["aeloss"]))
    assert np.isfinite(float(metrics["discloss"]))
    changed = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.net_params, new_state.net_params
    )
    assert max(jax.tree.leaves(changed)) > 0.0


# ---- Pallas row-Winograd kernel (interpret mode on CPU) --------------------


@pytest.fixture()
def interpret_env(monkeypatch):
    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("m_out", [2, 4])
@pytest.mark.parametrize("h,w,cin,cout", [(8, 16, 8, 8), (12, 8, 4, 12)])
def test_wino_rows_matches_direct_fp32(interpret_env, h, w, cin, cout, m_out):
    from generative_detection_tpu.ops.winograd_pallas import wino_rows_conv3x3

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = direct_conv3x3(x, k, b)
    got = wino_rows_conv3x3(x, k, b, jnp.float32, m_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_wino_rows_gradients(interpret_env):
    from generative_detection_tpu.ops.winograd_pallas import wino_rows_conv3x3

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    gd = jax.grad(lambda k_, x_, b_: jnp.sum(direct_conv3x3(x_, k_, b_) ** 2), (0, 1, 2))
    for m_out in (2, 4):
        gw = jax.grad(
            lambda k_, x_, b_, m=m_out: jnp.sum(
                wino_rows_conv3x3(x_, k_, b_, jnp.float32, m) ** 2
            ),
            (0, 1, 2),
        )
        for a, bb in zip(gd(k, x, b), gw(k, x, b)):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_wino_bwd_dgrad_falls_back_when_swapped_tile_missing(interpret_env, monkeypatch):
    """Asymmetric convs: the dgrad re-runs the kernel with channels SWAPPED
    (cout as input), so a forward-eligible conv may have no VMEM-provable
    dgrad tile. The backward must fall back to XLA's direct dgrad — never
    raise mid-backward — and the gradients must stay correct."""
    from generative_detection_tpu.ops import winograd_pallas as wp

    rng = np.random.default_rng(2)
    cin, cout = 4, 8
    x = jnp.asarray(rng.normal(size=(1, 8, 8, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    real_pick = wp._pick_tile
    calls = []

    def pick(h, w, c, co, itemsize, m_out):
        calls.append((c, co))
        if c == cout:  # the swapped (dgrad) direction: pretend no tile fits
            return None
        return real_pick(h, w, c, co, itemsize, m_out)

    monkeypatch.setattr(wp, "_pick_tile", pick)
    gw = jax.grad(
        lambda k_, x_, b_: jnp.sum(wp.wino_rows_conv3x3(x_, k_, b_) ** 2), (0, 1, 2)
    )(k, x, b)
    gd = jax.grad(
        lambda k_, x_, b_: jnp.sum(direct_conv3x3(x_, k_, b_) ** 2), (0, 1, 2)
    )(k, x, b)
    assert (cout, cin) in calls  # the swapped direction was consulted
    for a, bb in zip(gd, gw):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_conv3x3_pallas_winograd_dispatch(interpret_env, monkeypatch):
    from generative_detection_tpu.models.blocks import Conv3x3

    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 8)), jnp.float32)
    mod = Conv3x3(8)
    params = mod.init(jax.random.PRNGKey(0), x)
    y_direct = mod.apply(params, x)
    monkeypatch.setenv("GDT_WINOGRAD", "pallas")
    y_win = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_win), np.asarray(y_direct), rtol=3e-5, atol=3e-5
    )


def test_conv3x3_auto_gate_routes_by_shape(interpret_env, monkeypatch):
    """GDT_WINOGRAD=auto takes the Pallas F(4,3) path only in the measured
    winning band (32 <= min(H,W), max(H,W) <= 128 — docs/BENCH.md "Winograd
    conv family") and XLA direct conv outside it."""
    from generative_detection_tpu.models import blocks

    calls = []

    def spy(x, k, b, dt, m_out):
        calls.append((x.shape[1], x.shape[2], m_out))
        return direct_conv3x3(x, k, b, dtype=dt)

    monkeypatch.setattr(blocks, "wino_rows_conv3x3", spy)
    monkeypatch.setenv("GDT_WINOGRAD", "auto")
    rng = np.random.default_rng(4)
    for h, expect_wino in ((64, True), (128, True), (16, False), (256, False)):
        x = jnp.asarray(rng.normal(size=(1, h, h, 8)), jnp.float32)
        mod = blocks.Conv3x3(8)
        params = mod.init(jax.random.PRNGKey(0), x)
        calls.clear()
        mod.apply(params, x)
        assert bool(calls) == expect_wino, (h, calls)
        if expect_wino:
            assert calls == [(h, h, 4)]


@pytest.mark.parametrize("m_out", [2, 4])
def test_wino_wgrad_kernel_matches_direct(interpret_env, m_out):
    from generative_detection_tpu.ops.winograd_pallas import wino_wgrad

    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    k = jnp.zeros((3, 3, 4, 6), jnp.float32)

    dk_ref = jax.grad(
        lambda k_: jnp.sum(direct_conv3x3(z, k_, None) * dy)
    )(k)
    dk = wino_wgrad(z, dy, jnp.float32, m_out)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-4, atol=2e-4)


# ---- Fused GroupNorm+SiLU -> row-Winograd (interpret mode) -----------------


@pytest.mark.parametrize("m_out", [2, 4])
def test_gn_silu_wino_matches_reference(interpret_env, m_out):
    from generative_detection_tpu.ops.fused_conv import gn_silu_conv_reference
    from generative_detection_tpu.ops.winograd_pallas import gn_silu_wino_conv3x3

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ref = gn_silu_conv_reference(x, gamma, beta, k, b, num_groups=4)
    got = gn_silu_wino_conv3x3(x, gamma, beta, k, b, jnp.float32, m_out, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("m_out", [2, 4])
def test_gn_silu_wino_gradients_match_reference(interpret_env, m_out):
    """All five input cotangents (x, gamma, beta, kernel, bias) of the fused
    custom_vjp — wino dgrad for dz, the fused in-kernel wgrad, and the XLA
    GN+SiLU pullback — match autodiff through the XLA composite."""
    from generative_detection_tpu.ops.fused_conv import gn_silu_conv_reference
    from generative_detection_tpu.ops.winograd_pallas import gn_silu_wino_conv3x3

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    gref = jax.grad(
        lambda *a: jnp.sum(gn_silu_conv_reference(*a, num_groups=4) ** 2),
        (0, 1, 2, 3, 4),
    )(x, gamma, beta, k, b)
    gfused = jax.grad(
        lambda *a: jnp.sum(gn_silu_wino_conv3x3(*a, jnp.float32, m_out, 4) ** 2),
        (0, 1, 2, 3, 4),
    )(x, gamma, beta, k, b)
    for r, f in zip(gref, gfused):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r), rtol=5e-4, atol=5e-4)


def test_gn_silu_wino_wgrad_xla_fallback(interpret_env, monkeypatch):
    """GDT_WINOGRAD_WGRAD=xla routes dW through the recomputed-activation XLA
    path; gradients stay correct."""
    from generative_detection_tpu.ops.fused_conv import gn_silu_conv_reference
    from generative_detection_tpu.ops.winograd_pallas import gn_silu_wino_conv3x3

    monkeypatch.setenv("GDT_WINOGRAD_WGRAD", "xla")
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    gref = jax.grad(
        lambda *a: jnp.sum(gn_silu_conv_reference(*a, num_groups=4) ** 2),
        (0, 1, 2, 3, 4),
    )(x, gamma, beta, k, b)
    gfused = jax.grad(
        lambda *a: jnp.sum(gn_silu_wino_conv3x3(*a, jnp.float32, 4, 4) ** 2),
        (0, 1, 2, 3, 4),
    )(x, gamma, beta, k, b)
    for r, f in zip(gref, gfused):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("mode", ["remat", "xladz"])
def test_gn_silu_wino_bwd_modes_match_reference(interpret_env, monkeypatch, mode):
    """GDT_WINOGRAD_BWD=remat (full vjp of the XLA composite) and =xladz
    (XLA direct dgrad for dz) produce the same five gradients as autodiff
    through the reference composite."""
    from generative_detection_tpu.ops.fused_conv import gn_silu_conv_reference
    from generative_detection_tpu.ops.winograd_pallas import gn_silu_wino_conv3x3

    monkeypatch.setenv("GDT_WINOGRAD_BWD", mode)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    gref = jax.grad(
        lambda *a: jnp.sum(gn_silu_conv_reference(*a, num_groups=4) ** 2),
        (0, 1, 2, 3, 4),
    )(x, gamma, beta, k, b)
    gfused = jax.grad(
        lambda *a: jnp.sum(gn_silu_wino_conv3x3(*a, jnp.float32, 4, 4) ** 2),
        (0, 1, 2, 3, 4),
    )(x, gamma, beta, k, b)
    for r, f in zip(gref, gfused):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r), rtol=5e-4, atol=5e-4)


def test_resnet_block_fused_wino_dispatch(interpret_env, monkeypatch):
    """GDT_WINOGRAD=fused routes in-band ResnetBlock norm+conv pairs through
    the fused GN+SiLU+Winograd op (out-of-band shapes stay on the unfused
    XLA composite), and the block output matches the unfused lowering."""
    from generative_detection_tpu.models import blocks

    calls = []
    real = blocks.gn_silu_wino_conv3x3

    def spy(x, gamma, beta, k, b, dt, m_out, *a, **kw):
        calls.append((x.shape[1], x.shape[2], m_out))
        return real(x, gamma, beta, k, b, dt, m_out, *a, **kw)

    monkeypatch.setattr(blocks, "gn_silu_wino_conv3x3", spy)
    rng = np.random.default_rng(9)
    for h, expect_fused in ((64, True), (16, False)):
        x = jnp.asarray(rng.normal(size=(1, h, h, 32)), jnp.float32)
        mod = blocks.ResnetBlock(32)
        params = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.delenv("GDT_WINOGRAD", raising=False)
        y_ref = mod.apply(params, x)
        monkeypatch.setenv("GDT_WINOGRAD", "fused")
        calls.clear()
        y_fused = mod.apply(params, x)
        assert (len(calls) == 2) == expect_fused, (h, calls)
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_ref), rtol=5e-4, atol=5e-4
        )

"""Subpixel (phase-decomposed) upsample-conv equals the direct formulation.

The decoder's nearest-2x + 3x3 SAME conv (ref: ldm Upsample, consumed via
src/modules/autoencodermodules/feat_decoder.py) factors exactly into a 2x2
conv at the low resolution with four tap-summed phase kernels
(ops/upsample.py). These tests pin the algebraic identity in fp32 and the
module-level dispatch (same params, both env paths).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.ops.upsample import (
    phase_kernel,
    reference_upsample_conv,
    subpixel_upsample_conv,
)


@pytest.mark.parametrize("h,w,cin,cout", [(8, 8, 16, 16), (5, 7, 8, 12)])
def test_subpixel_matches_reference_fp32(h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = reference_upsample_conv(x, k, b)
    got = subpixel_upsample_conv(x, k, b)
    assert got.shape == (2, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_phase_kernel_shape_and_tap_sums():
    k = jnp.arange(3 * 3 * 2 * 4, dtype=jnp.float32).reshape(3, 3, 2, 4)
    p = phase_kernel(k)
    assert p.shape == (2, 2, 2, 16)  # (2, 2, Cin, 4 * Cout)
    # phase (0,0): rows (K0, K1+K2), cols likewise; corner tap [1,1] of P00
    # must be (K[1,1]+K[1,2]+K[2,1]+K[2,2]).
    expect = k[1, 1] + k[1, 2] + k[2, 1] + k[2, 2]
    np.testing.assert_allclose(np.asarray(p[1, 1, :, :4]), np.asarray(expect))


def test_gradients_match_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def loss_ref(k_, x_):
        return jnp.sum(reference_upsample_conv(x_, k_, b) ** 2)

    def loss_sub(k_, x_):
        return jnp.sum(subpixel_upsample_conv(x_, k_, b) ** 2)

    gk_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(k, x)
    gk_sub, gx_sub = jax.grad(loss_sub, argnums=(0, 1))(k, x)
    np.testing.assert_allclose(np.asarray(gk_sub), np.asarray(gk_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_sub), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)


def test_upsample_module_paths_share_params(monkeypatch):
    from generative_detection_tpu.models.blocks import Upsample

    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 8)), jnp.float32)
    monkeypatch.setenv("GDT_SUBPIXEL_UP", "0")
    mod = Upsample()
    params = mod.init(jax.random.PRNGKey(0), x)
    # identical param tree to the historical nn.Conv(name="conv") layout
    assert set(params["params"]) == {"conv"}
    assert set(params["params"]["conv"]) == {"kernel", "bias"}
    assert params["params"]["conv"]["kernel"].shape == (3, 3, 8, 8)
    y_direct = mod.apply(params, x)
    monkeypatch.setenv("GDT_SUBPIXEL_UP", "1")
    y_sub = mod.apply(params, x)
    assert y_sub.shape == (1, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_direct), rtol=2e-5, atol=2e-5)

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_detection_tpu.ops import (
    group_norm,
    resize_bilinear,
    resize_nearest,
    sigmoid_focal_loss,
    single_head_attention,
)
from generative_detection_tpu.ops.attention import _attention_reference
from generative_detection_tpu.ops.norm import _gn_reference


def _np_group_norm(x, gamma, beta, groups, eps):
    b, h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(b, h * w, groups, cg)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = (xg - mean) / np.sqrt(var + eps)
    return y.reshape(b, h, w, c) * gamma + beta


def test_group_norm_reference_matches_numpy(rng):
    x = rng.normal(size=(2, 8, 8, 128)).astype(np.float32)
    gamma = rng.normal(size=(128,)).astype(np.float32) + 1.0
    beta = rng.normal(size=(128,)).astype(np.float32)
    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
    want = _np_group_norm(x, gamma, beta, 32, 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_group_norm_silu_fusion(rng):
    x = rng.normal(size=(1, 4, 4, 128)).astype(np.float32)
    gamma = np.ones((128,), np.float32)
    beta = np.zeros((128,), np.float32)
    got = np.asarray(
        group_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), act="silu")
    )
    plain = _np_group_norm(x, gamma, beta, 32, 1e-6)
    want = plain / (1.0 + np.exp(-plain))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_group_norm_pallas_interpret_matches_reference(rng, monkeypatch):
    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    got = np.asarray(group_norm(x, gamma, beta, act="silu", use_pallas=True))
    want = np.asarray(_gn_reference(x, gamma, beta, 32, 1e-6, "silu"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_group_norm_custom_vjp_grads_match_reference(rng, monkeypatch):
    # pallas fwd (interpret) + closed-form bwd must match XLA autodiff grads
    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(128,)).astype(np.float32) + 1.0)
    beta = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))

    def loss_pallas(x_, g_, b_):
        return jnp.sum(group_norm(x_, g_, b_, act="silu", use_pallas=True) * co)

    def loss_ref(x_, g_, b_):
        return jnp.sum(_gn_reference(x_, g_, b_, 32, 1e-6, "silu") * co)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4)


def test_attention_reference_matches_numpy_softmax(rng):
    q = rng.normal(size=(2, 16, 32)).astype(np.float32)
    k = rng.normal(size=(2, 16, 32)).astype(np.float32)
    v = rng.normal(size=(2, 16, 32)).astype(np.float32)
    got = np.asarray(single_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    logits = np.einsum("blc,bmc->blm", q, k) / np.sqrt(32.0)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum("blm,bmc->blc", w, v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_chunked_attention_matches_reference(rng):
    from generative_detection_tpu.ops.attention import _attention_chunked

    q = jnp.asarray(rng.normal(size=(1, 2048, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2048, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2048, 32)).astype(np.float32))
    got = np.asarray(_attention_chunked(q, k, v))
    want = np.asarray(_attention_reference(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # gradients flow through the rematerialized chunks
    g = jax.grad(lambda a: jnp.sum(_attention_chunked(a, k, v) ** 2))(q)
    gr = jax.grad(lambda a: jnp.sum(_attention_reference(a, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=1e-3, atol=1e-4)


def test_flash_attention_interpret_matches_reference(rng, monkeypatch):
    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")
    q = jnp.asarray(rng.normal(size=(1, 256, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 256, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 256, 128)).astype(np.float32))
    got = np.asarray(single_head_attention(q, k, v, use_pallas=True))
    want = np.asarray(_attention_reference(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_attention_non_divisor_block_lengths(rng, monkeypatch):
    """L that the default block sizes do NOT divide (e.g. 640 = 5*128): the
    block must snap to a divisor of L — a non-divisor block truncates the
    grid and returns uninitialized tail rows (silent corruption)."""
    from generative_detection_tpu.ops.attention import _snap_block

    assert _snap_block(640, 256) == 128
    assert _snap_block(640, 512) == 128
    assert _snap_block(768, 512) == 384
    assert _snap_block(4096, 256) == 256
    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")
    for l in (640, 384):
        q = jnp.asarray(rng.normal(size=(1, l, 128)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, l, 128)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, l, 128)).astype(np.float32))
        got = np.asarray(single_head_attention(q, k, v, use_pallas=True))
        want = np.asarray(_attention_reference(q, k, v))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_custom_attention_fwd_bwd_matches_reference(rng):
    """The one-pass custom-vjp flash kernel (interpret mode): forward and all
    three input grads vs plain autodiff over the reference formulation, at a
    multi-q-block shape (L=512 > block_q is exercised on TPU; here L=256 with
    block_q=128 forces q_steps > 1 through the same grid logic)."""
    from generative_detection_tpu.ops import attention as attn_mod

    q = jnp.asarray(rng.normal(size=(2, 256, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 256, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 256, 128)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    fn = attn_mod._make_attention_custom(128, True)  # q_steps = 2
    got = np.asarray(fn(q, k, v))
    want = np.asarray(_attention_reference(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_new(q_, k_, v_):
        return jnp.sum(fn(q_, k_, v_) * co)

    def loss_ref(q_, k_, v_):
        return jnp.sum(_attention_reference(q_, k_, v_) * co)

    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-3, atol=1e-4)


def test_custom_attention_is_default_dispatch(rng, monkeypatch):
    """GDT_ATTN_IMPL default routes the Pallas path through the custom
    kernel; =lib restores the library flash kernel (interpret mode follows
    the same selection)."""
    from unittest import mock

    from generative_detection_tpu.ops import attention as attn_mod

    q = jnp.asarray(rng.normal(size=(1, 256, 128)).astype(np.float32))
    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("GDT_ATTN_IMPL", raising=False)
    with mock.patch.object(
        attn_mod, "_attention_custom", wraps=attn_mod._attention_custom
    ) as m:
        got = single_head_attention(q, q, q, use_pallas=True)
        m.assert_called_once()
    want = np.asarray(_attention_reference(q, q, q))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    monkeypatch.setenv("GDT_ATTN_IMPL", "lib")
    with mock.patch.object(attn_mod, "_attention_custom") as m:
        single_head_attention(q, q, q, use_pallas=True)
        m.assert_not_called()


def _np_mmcv_focal(logits, targets, gamma=2.0, alpha=0.25):
    n, c = logits.shape
    onehot = np.eye(c + 1)[targets][:, :c]
    p = 1.0 / (1.0 + np.exp(-logits))
    pt = (1 - p) * onehot + p * (1 - onehot)
    fw = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt**gamma
    bce = -(onehot * np.log(p + 1e-12) + (1 - onehot) * np.log(1 - p + 1e-12))
    return (bce * fw).mean()


def test_sigmoid_focal_loss_matches_mmcv_semantics(rng):
    logits = rng.normal(size=(8, 11)).astype(np.float32) * 2
    targets = rng.integers(0, 11, size=(8,))
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    want = _np_mmcv_focal(logits, targets)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sigmoid_focal_loss_background_column():
    # mmcv: a label == num_classes maps to an all-zero row. With 11 classes
    # the background label 10 stays a real one-hot column; label 11 would be
    # all-negative.
    logits = jnp.zeros((1, 11))
    l10 = float(sigmoid_focal_loss(logits, jnp.asarray([10])))
    l11 = float(sigmoid_focal_loss(logits, jnp.asarray([11])))
    assert l10 != pytest.approx(l11)


def test_resize_bilinear_matches_pil(rng):
    from PIL import Image

    img = (rng.uniform(0, 255, size=(64, 48, 3))).astype(np.float32)
    pil = Image.fromarray(img.astype(np.uint8))
    want = np.asarray(
        pil.resize((96, 128), resample=Image.Resampling.BILINEAR), dtype=np.float32
    )
    got = np.asarray(resize_bilinear(jnp.asarray(img.astype(np.uint8).astype(np.float32)), 128, 96))
    # PIL uses the same align_corners=False convention; uint8 rounding gives
    # small differences.
    assert np.abs(got - want).mean() < 1.0


def test_resize_nearest_shapes(rng):
    img = rng.normal(size=(2, 10, 12, 1)).astype(np.float32)
    out = resize_nearest(jnp.asarray(img), 20, 24)
    assert out.shape == (2, 20, 24, 1)


def test_resize_bilinear_identity(rng):
    img = rng.normal(size=(8, 8, 3)).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(img), 8, 8))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_batched_crop_resize_device_pipeline(rng):
    from generative_detection_tpu.ops import batched_crop_resize

    frames = rng.integers(0, 255, size=(2, 64, 96, 3)).astype(np.uint8)
    centers = np.asarray([[48.0, 32.0], [10.0, 10.0]], np.float32)
    sizes = np.asarray([32.0, 40.0], np.float32)
    out = np.asarray(
        batched_crop_resize(jnp.asarray(frames), jnp.asarray(centers), jnp.asarray(sizes), 32)
    )
    assert out.shape == (2, 32, 32, 3)
    # identity case: crop size == out size, fully inside -> exact pixels
    want = frames[0, 16:48, 32:64].astype(np.float32) / 255.0
    np.testing.assert_allclose(out[0], want, atol=1e-5)
    # second crop extends out of frame -> zero-padded top-left
    assert out[1, 0, 0].max() == 0.0
    assert np.isfinite(out).all()


def test_gn_silu_conv_fused_matches_reference(rng):
    """ops.gn_silu_conv Pallas kernel vs the XLA composite (interpret mode),
    values + all five gradients, both vjp variants."""
    import os

    os.environ["GDT_PALLAS_INTERPRET"] = "1"
    try:
        from generative_detection_tpu.ops.fused_conv import (
            gn_silu_conv,
            gn_silu_conv_reference,
        )

        x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 128, 256)).astype(np.float32) * 0.05)
        bias = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))

        want = gn_silu_conv_reference(x, gamma, beta, w, bias)
        for save_act in (False, True):
            got = gn_silu_conv(
                x, gamma, beta, w, bias, use_pallas=True, save_activation=save_act
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
            )

            def loss(fn):
                return jax.grad(
                    lambda *a: jnp.sum(fn(*a) ** 2), argnums=(0, 1, 2, 3, 4)
                )

            gp = loss(
                lambda *a: gn_silu_conv(*a, use_pallas=True, save_activation=save_act)
            )(x, gamma, beta, w, bias)
            gr = loss(gn_silu_conv_reference)(x, gamma, beta, w, bias)
            for a, b in zip(gp, gr):
                scale = float(jnp.max(jnp.abs(b))) + 1e-9
                assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5
    finally:
        os.environ.pop("GDT_PALLAS_INTERPRET", None)


def test_resnet_block_fuse_param_compatible(rng):
    """fuse=True/False ResnetBlocks share one parameter tree and agree
    numerically (XLA composite fallback on CPU)."""
    from generative_detection_tpu.models.blocks import ResnetBlock

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    b0 = ResnetBlock(64, fuse=False)
    b1 = ResnetBlock(64, fuse=True)
    params = b0.init(jax.random.PRNGKey(0), x)["params"]
    p1 = b1.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p1)
    a = b0.apply({"params": params}, x)
    b = b1.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_group_norm_chunked_matches_reference(rng, monkeypatch):
    """Streamed (chunked) GN kernels for VMEM-overflow shapes: forward and
    custom backward vs the XLA reference, interpret mode. Shape chosen above
    _MAX_BLOCK_ELEMENTS so the single-shot kernel cannot take it."""
    from generative_detection_tpu.ops import norm as norm_mod

    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("GDT_GN_CHUNKED", "1")
    shape = (2, 48, 48, 256)  # 589k elements/row > 512k limit
    assert shape[1] * shape[2] * shape[3] > norm_mod._MAX_BLOCK_ELEMENTS
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(256,)).astype(np.float32) + 1.0)
    beta = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    got = np.asarray(group_norm(x, gamma, beta, act="silu", use_pallas=True))
    want = np.asarray(_gn_reference(x, gamma, beta, 32, 1e-6, "silu"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_pallas(x_, g_, b_):
        return jnp.sum(group_norm(x_, g_, b_, act="silu", use_pallas=True) * co)

    def loss_ref(x_, g_, b_):
        return jnp.sum(_gn_reference(x_, g_, b_, 32, 1e-6, "silu") * co)

    got_g = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    want_g = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for g, w in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4)


def test_group_norm_chunked_opt_in_only(rng, monkeypatch):
    """Without GDT_GN_CHUNKED the overflow shape takes the XLA reference
    (measured: XLA wins composed on v5e — same policy as the fused conv)."""
    from unittest import mock

    from generative_detection_tpu.ops import norm as norm_mod

    monkeypatch.setenv("GDT_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("GDT_GN_CHUNKED", raising=False)
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 256)).astype(np.float32))
    gamma = jnp.asarray(np.ones(256, np.float32))
    beta = jnp.asarray(np.zeros(256, np.float32))
    with mock.patch.object(norm_mod, "_make_gn_chunked_custom_vjp") as m:
        group_norm(x, gamma, beta, act="silu", use_pallas=True)
        m.assert_not_called()


def test_group_norm_xla_custom_vjp_matches_reference(rng, monkeypatch):
    """The saved-stats XLA custom-vjp GN (the no-Pallas production path):
    forward and all three grads vs plain autodiff over the reference form,
    with and without the fused SiLU."""
    from generative_detection_tpu.ops import norm as norm_mod

    monkeypatch.delenv("GDT_GN_XLA_VJP", raising=False)
    for act in (None, "silu"):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(size=(128,)).astype(np.float32) + 1.0)
        beta = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        co = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

        fn = norm_mod._make_gn_xla_custom_vjp(32, 1e-6, act)
        got_y = np.asarray(fn(x, gamma, beta))
        want_y = np.asarray(_gn_reference(x, gamma, beta, 32, 1e-6, act))
        np.testing.assert_allclose(got_y, want_y, rtol=1e-4, atol=1e-5)

        def loss_new(x_, g_, b_, fn=fn):
            return jnp.sum(fn(x_, g_, b_) * co)

        def loss_ref(x_, g_, b_, act=act):
            return jnp.sum(_gn_reference(x_, g_, b_, 32, 1e-6, act) * co)

        got = jax.grad(loss_new, argnums=(0, 1, 2))(x, gamma, beta)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4)


def test_group_norm_xla_custom_vjp_is_opt_in(rng, monkeypatch):
    """The custom-vjp XLA GN measured even with plain autodiff in the full
    step (docs/BENCH.md round 4), so it must stay opt-in: default routes
    through plain autodiff; GDT_GN_XLA_VJP=1 enables it."""
    from unittest import mock

    from generative_detection_tpu.ops import norm as norm_mod

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 128)).astype(np.float32))
    gamma = jnp.asarray(np.ones(128, np.float32))
    beta = jnp.asarray(np.zeros(128, np.float32))
    monkeypatch.delenv("GDT_GN_XLA_VJP", raising=False)
    with mock.patch.object(norm_mod, "_make_gn_xla_custom_vjp") as m:
        group_norm(x, gamma, beta, use_pallas=False)
        m.assert_not_called()
    monkeypatch.setenv("GDT_GN_XLA_VJP", "1")
    with mock.patch.object(
        norm_mod, "_make_gn_xla_custom_vjp", wraps=norm_mod._make_gn_xla_custom_vjp
    ) as m:
        group_norm(x, gamma, beta, use_pallas=False)
        m.assert_called_once()

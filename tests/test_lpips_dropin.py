"""Verified drop-in path for pretrained LPIPS weights (VERDICT r2 #8).

The pretrained VGG16+linear-head weights (ref contperceptual.py:143-145)
cannot be downloaded in this environment, so the load path must guarantee
that a future weight file is purely a config change: it either round-trips
byte-exactly into the parameter tree or fails with an actionable error
(checksum, key-set, and shape validation).
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _synthetic_npz(tmp_path, rng, mutate=None):
    """Write a converter-layout npz with random arrays shaped like the
    initialized LPIPS tree; returns (path, flat_dict, init_params)."""
    import flax

    from generative_detection_tpu.models.lpips import LPIPS

    model = LPIPS()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    flat_shapes = {
        "/".join(k): v.shape
        for k, v in flax.traverse_util.flatten_dict(params).items()
    }
    from generative_detection_tpu.models.lpips import EXPECTED_NPZ_KEYS

    flat = {
        k: rng.normal(size=flat_shapes[k]).astype(np.float32)
        for k in sorted(EXPECTED_NPZ_KEYS)
    }
    if mutate:
        mutate(flat)
    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **flat)
    return path, flat, params


def test_roundtrip_byte_exact(tmp_path, rng):
    """Every npz array lands in the merged tree bit-for-bit."""
    import flax

    from generative_detection_tpu.models.lpips import load_lpips_weights

    path, flat, params = _synthetic_npz(tmp_path, rng)
    merged = load_lpips_weights(params, str(path))
    got = {
        "/".join(k): np.asarray(v)
        for k, v in flax.traverse_util.flatten_dict(merged).items()
    }
    for k, v in flat.items():
        assert got[k].tobytes() == v.tobytes(), k


def test_checksum_sidecar_and_mismatch(tmp_path, rng):
    from generative_detection_tpu.models.lpips import load_lpips_weights

    path, _, params = _synthetic_npz(tmp_path, rng)
    digest = hashlib.sha256(path.read_bytes()).hexdigest()

    # explicit arg, correct -> loads
    load_lpips_weights(params, str(path), expected_sha256=digest)
    # sidecar file, correct -> loads
    (tmp_path / "lpips_vgg.npz.sha256").write_text(digest + "\n")
    load_lpips_weights(params, str(path))
    # wrong checksum -> actionable failure
    (tmp_path / "lpips_vgg.npz.sha256").write_text("0" * 64)
    with pytest.raises(ValueError, match="checksum mismatch"):
        load_lpips_weights(params, str(path))


def test_wrong_layout_rejected(tmp_path, rng):
    from generative_detection_tpu.models.lpips import load_lpips_weights

    def drop_one(flat):
        del flat["lin4/kernel"]
        flat["unexpected/key"] = np.zeros((1,), np.float32)

    path, _, params = _synthetic_npz(tmp_path, rng, mutate=drop_one)
    with pytest.raises(ValueError, match="converter layout"):
        load_lpips_weights(params, str(path))


def test_wrong_shape_rejected(tmp_path, rng):
    from generative_detection_tpu.models.lpips import load_lpips_weights

    def reshape_one(flat):
        flat["vgg/conv1/kernel"] = np.zeros((3, 3, 3, 32), np.float32)

    path, _, params = _synthetic_npz(tmp_path, rng, mutate=reshape_one)
    with pytest.raises(ValueError, match="shape"):
        load_lpips_weights(params, str(path))


def _naive_tap(a_, b_, w_):
    from generative_detection_tpu.models.lpips import _normalize_tensor

    d_ = jnp.square(_normalize_tensor(a_) - _normalize_tensor(b_))
    return jnp.mean(jnp.einsum("bhwc,co->bhwo", d_, w_[0, 0]), axis=(1, 2), keepdims=True)


def test_tap_distance_matches_naive_normalize_form(rng):
    """The fused expanded-square tap distance (round-4 perf lever) must equal
    the naive normalize->diff->square->1x1-conv->spatial-mean form (values
    and all grads) on generic inputs, including forward values at all-zero
    pixels."""
    from generative_detection_tpu.models.lpips import _tap_distance

    a = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    b = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    a[0, 0, 0, :] = 0.0  # all-zero pixel in one input
    b[1, 3, 2, :] = 0.0
    a[1, 5, 5, :] = 0.0  # all-zero in BOTH at the same pixel
    b[1, 5, 5, :] = 0.0
    w = rng.normal(size=(1, 1, 64, 1)).astype(np.float32) ** 2

    aj, bj, wj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)
    got = np.asarray(_tap_distance(aj, bj, wj))
    want = np.asarray(_naive_tap(aj, bj, wj))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # gradients agree on inputs with no degenerate pixels
    a2 = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    g_new = jax.grad(
        lambda *args: jnp.sum(_tap_distance(*args)), argnums=(0, 1, 2)
    )(a2, b2, wj)
    g_old = jax.grad(
        lambda *args: jnp.sum(_naive_tap(*args)), argnums=(0, 1, 2)
    )(a2, b2, wj)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(np.asarray(gn), np.asarray(go), rtol=1e-4, atol=1e-5)


def test_tap_distance_gradient_finite_at_zero_pixels(rng):
    """At an all-zero ReLU pixel the naive/reference form emits NaN
    gradients (sqrt'(0)=inf times a zero cotangent) — a real training
    hazard. The fused form's safe-sqrt ``where`` keeps every gradient
    finite while taking the EXACT reference normalization whenever
    ||a|| > 0 (docstring rationale in models/lpips.py)."""
    from generative_detection_tpu.models.lpips import _tap_distance

    a = rng.normal(size=(1, 4, 4, 32)).astype(np.float32)
    b = rng.normal(size=(1, 4, 4, 32)).astype(np.float32)
    a[0, 1, 1, :] = 0.0
    w = np.ones((1, 1, 32, 1), np.float32)
    aj, bj, wj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)

    g_naive = jax.grad(lambda x: jnp.sum(_naive_tap(x, bj, wj)))(aj)
    assert not np.all(np.isfinite(np.asarray(g_naive)))  # documents the hazard
    g_fused = jax.grad(lambda x: jnp.sum(_tap_distance(x, bj, wj)))(aj)
    assert np.all(np.isfinite(np.asarray(g_fused)))


def test_tap_distance_exact_at_tiny_norms(rng):
    """Tiny-but-nonzero tap norms (||a|| ~ 1e-6) must take the EXACT
    reference x/(||x||+eps) path — the earlier variance-floor draft
    (sqrt(a2 + 1e-12)) misnormalized this regime by up to ~sqrt(2) (a ~30%
    error in the normalized magnitude); the safe-sqrt form has no
    divergence regime."""
    from generative_detection_tpu.models.lpips import _tap_distance

    a = (rng.normal(size=(1, 4, 4, 32)) * 1e-6).astype(np.float32)
    b = rng.normal(size=(1, 4, 4, 32)).astype(np.float32)
    b[0, 2, 2, :] = (rng.normal(size=32) * 3e-7).astype(np.float32)  # tiny both
    w = (rng.normal(size=(1, 1, 32, 1)) ** 2).astype(np.float32)
    aj, bj, wj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)
    got = np.asarray(_tap_distance(aj, bj, wj))
    want = np.asarray(_naive_tap(aj, bj, wj))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    g_new = jax.grad(lambda x: jnp.sum(_tap_distance(x, bj, wj)))(aj)
    g_old = jax.grad(lambda x: jnp.sum(_naive_tap(x, bj, wj)))(aj)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_old), rtol=1e-4, atol=1e-6
    )


def test_tap_distance_gradient_finite_below_norm_floor(rng):
    """0 < ||a|| << 3e-9: the expanded backward's 1/na^4 terms would reach
    ~1e40 (f32 inf) without the norm floor — the floor caps them and cuts
    the sqrt cotangent, so gradients stay finite where the factored
    reference form survives but a floor-less expansion overflows."""
    from generative_detection_tpu.models.lpips import _tap_distance

    a = (rng.normal(size=(1, 4, 4, 32)) * 1e-10).astype(np.float32)
    b = rng.normal(size=(1, 4, 4, 32)).astype(np.float32)
    w = (rng.normal(size=(1, 1, 32, 1)) ** 2).astype(np.float32)
    aj, bj, wj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)
    val = np.asarray(_tap_distance(aj, bj, wj))
    assert np.all(np.isfinite(val))
    for arg in (0, 1):
        g = jax.grad(
            lambda x, arg=arg: jnp.sum(
                _tap_distance(*((x, bj) if arg == 0 else (aj, x)), wj)
            )
        )(aj if arg == 0 else bj)
        assert np.all(np.isfinite(np.asarray(g))), f"grad arg{arg} not finite"

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

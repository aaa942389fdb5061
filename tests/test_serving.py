"""Serving export: serialize -> deserialize -> run roundtrip."""

import jax
import numpy as np
import pytest

from generative_detection_tpu.serving import export_detector, load_detector
from tests.test_models import small_model


def test_export_roundtrip(rng):
    m = small_model()
    net_params, _ = m.init_variables(jax.random.PRNGKey(0), batch_size=2)
    hmin = np.full((11,), 0.5, np.float32)
    hmax = np.full((11,), 4.0, np.float32)
    blob = export_detector(m, net_params, hmin, hmax, batch=2)
    assert isinstance(blob, bytes) and len(blob) > 1000

    fn = load_detector(blob)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    boxes, cls, score = fn(
        x,
        np.full((2,), 1266.0, np.float32),
        np.broadcast_to(np.asarray([800.0, 450.0], np.float32), (2, 2)),
        np.full((2,), 100.0, np.float32),
        np.broadcast_to(np.asarray([820.0, 460.0], np.float32), (2, 2)),
        np.full((2,), 2.56, np.float32),
    )
    assert boxes.shape == (2, 7)
    assert cls.shape == (2,)
    assert np.all(np.isfinite(np.asarray(boxes)))
    # deterministic: exported artifact matches the live function
    from generative_detection_tpu.serving import make_detector_fn
    import jax.numpy as jnp

    live = make_detector_fn(m, net_params, jnp.asarray(hmin), jnp.asarray(hmax), 32)
    b2, c2, s2 = live(
        jnp.asarray(x),
        jnp.full((2,), 1266.0),
        jnp.broadcast_to(jnp.asarray([800.0, 450.0]), (2, 2)),
        jnp.full((2,), 100.0),
        jnp.broadcast_to(jnp.asarray([820.0, 460.0]), (2, 2)),
        jnp.full((2,), 2.56),
    )
    # separate compilations of the same graph; default serving dtype is
    # bfloat16 (the measured winner), so reassociation drift sits at bf16
    # rounding, not fp32
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(b2), rtol=3e-2, atol=5e-2)

    # the conservative fp32 opt-out keeps the old tight agreement
    blob32 = export_detector(m, net_params, hmin, hmax, batch=2, dtype="float32")
    b32 = np.asarray(load_detector(blob32)(x, *[np.asarray(a) for a in (
        np.full((2,), 1266.0, np.float32),
        np.broadcast_to(np.asarray([800.0, 450.0], np.float32), (2, 2)),
        np.full((2,), 100.0, np.float32),
        np.broadcast_to(np.asarray([820.0, 460.0], np.float32), (2, 2)),
        np.full((2,), 2.56, np.float32),
    )])[0])
    live32 = make_detector_fn(
        m, net_params, jnp.asarray(hmin), jnp.asarray(hmax), 32, dtype="float32"
    )
    b2_32, _, _ = live32(
        jnp.asarray(x),
        jnp.full((2,), 1266.0),
        jnp.broadcast_to(jnp.asarray([800.0, 450.0]), (2, 2)),
        jnp.full((2,), 100.0),
        jnp.broadcast_to(jnp.asarray([820.0, 460.0]), (2, 2)),
        jnp.full((2,), 2.56),
    )
    np.testing.assert_allclose(b32, np.asarray(b2_32), rtol=1e-3, atol=1e-4)
    # NO bf16-vs-fp32 box agreement assert: with RANDOM weights the 3D box
    # translation is ill-conditioned (depth recovery multiplies tiny pose
    # logits by focal/patch scale, so bf16 rounding legitimately moves a
    # center by meters). Cross-dtype fidelity on real weights is an
    # eval-level metric (eval.py PSNR / detection mAP), not a unit assert;
    # here we only require the bf16 path to be finite and self-consistent
    # (the export-vs-live checks above).
    assert np.all(np.isfinite(b32))


def test_serve_dtype_resolution(monkeypatch):
    """"auto" -> bfloat16 (the measured winner), GDT_SERVE_DTYPE overrides,
    None/"float32" keep fp32."""
    import jax.numpy as jnp

    from generative_detection_tpu.serving import _resolve_serve_dtype

    monkeypatch.delenv("GDT_SERVE_DTYPE", raising=False)
    assert _resolve_serve_dtype("auto") == jnp.bfloat16
    assert _resolve_serve_dtype(None) is None
    assert _resolve_serve_dtype("float32") is None
    assert _resolve_serve_dtype(jnp.float16) == jnp.float16
    monkeypatch.setenv("GDT_SERVE_DTYPE", "float32")
    assert _resolve_serve_dtype("auto") is None
    monkeypatch.setenv("GDT_SERVE_DTYPE", "bfloat16")
    assert _resolve_serve_dtype("auto") == jnp.bfloat16


def _detector_args(rng, b):
    return (
        rng.normal(size=(b, 32, 32, 3)).astype(np.float32),
        np.full((b,), 1266.0, np.float32),
        np.broadcast_to(np.asarray([800.0, 450.0], np.float32), (b, 2)).copy(),
        np.full((b,), 100.0, np.float32),
        np.broadcast_to(np.asarray([820.0, 460.0], np.float32), (b, 2)).copy(),
        np.full((b,), 2.56, np.float32),
    )


def test_export_batch_polymorphic(rng):
    """batch=None exports ONE artifact usable at any batch size
    (jax.export symbolic batch dim)."""
    m = small_model()
    net_params, _ = m.init_variables(jax.random.PRNGKey(0), batch_size=2)
    hmin = np.full((11,), 0.5, np.float32)
    hmax = np.full((11,), 4.0, np.float32)
    blob = export_detector(m, net_params, hmin, hmax, batch=None)
    fn = load_detector(blob)
    for b in (1, 3, 8):
        boxes, cls, score = fn(*_detector_args(rng, b))
        assert boxes.shape == (b, 7) and cls.shape == (b,)
        assert np.all(np.isfinite(np.asarray(boxes)))


def test_sharded_serving_on_virtual_mesh(rng):
    """The deserialized blob runs DATA-PARALLEL over the 8-device virtual
    mesh (shard_map per-device calls of the polymorphic artifact), and the
    sharded result matches the single-device call."""
    from generative_detection_tpu.parallel import create_mesh
    from generative_detection_tpu.serving import shard_detector

    m = small_model()
    net_params, _ = m.init_variables(jax.random.PRNGKey(0), batch_size=2)
    hmin = np.full((11,), 0.5, np.float32)
    hmax = np.full((11,), 4.0, np.float32)
    blob = export_detector(m, net_params, hmin, hmax, batch=None)

    mesh = create_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.size == 8
    fn_sharded = shard_detector(blob, mesh)
    args = _detector_args(rng, 16)  # 2 patches per device
    boxes_s, cls_s, score_s = fn_sharded(*args)
    # output really is batch-sharded over the mesh
    assert len(boxes_s.sharding.device_set) == 8

    fn_single = load_detector(blob)
    boxes_1, cls_1, score_1 = fn_single(*args)
    np.testing.assert_allclose(
        np.asarray(boxes_s), np.asarray(boxes_1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(cls_s), np.asarray(cls_1))

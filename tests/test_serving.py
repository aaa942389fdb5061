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
    # separate compilations of the same graph; allow tiny reassociation drift
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(b2), rtol=1e-3, atol=1e-4)

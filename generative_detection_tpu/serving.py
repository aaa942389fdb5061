"""Serving export: the per-patch 3D detector as a portable StableHLO artifact.

The reference has no deployment story (its eval.py doesn't even exist); this
framework targets production serving, so the full inference pipeline —
patches -> encode -> pose decode (mode) -> 3D box recovery — is exported via
``jax.export`` into a self-contained serialized function that any JAX runtime
(or XLA-compatible server) can load and execute without the Python model
code. Weights are baked into the artifact.

Usage:
    blob = export_detector(model, net_params, hmin_table, hmax_table, batch=8)
    open("detector.bin", "wb").write(blob)
    # later / elsewhere:
    fn = load_detector(open("detector.bin", "rb").read())
    out = fn(patches, focal, pp, patch_size, center, resampling)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from .eval.inference import recover_boxes


def _resolve_serve_dtype(dtype):
    """Serving compute dtype. ``"auto"`` (the default) resolves via
    ``GDT_SERVE_DTYPE`` and defaults to **bfloat16** — the measured-best
    composition of the round-5 serving sweep on TPU v5e
    (``tools/bench_serving.py --sweep``, docs/BENCH.md "Inference
    composition sweep": bf16 beat fp32 on BOTH legs — detector 492 vs 459
    p/s, full reconstruction 245 vs 217 p/s — while the opt-in kernel
    combos lost composed). ``None``/``"float32"`` keeps the net untouched
    (fp32); any dtype/str selects that dtype."""
    if dtype == "auto":
        dtype = os.environ.get("GDT_SERVE_DTYPE", "bfloat16")
    if dtype is None or dtype == "float32":
        return None
    return jnp.dtype(dtype).type if isinstance(dtype, str) else dtype


def make_detector_fn(
    model,
    net_params,
    hmin_table,
    hmax_table,
    patch_out: int = 256,
    params_as_arg: bool = False,
    dtype="auto",
):
    """Close the model into a pure patches->boxes function. Weights are
    captured as constants by design here (the artifact must be
    self-contained); for in-process use pass ``params_as_arg=True`` — the
    returned function then takes ``(net_params, rgb, ...)`` so the weights
    stay jit arguments (baked constants inflate the compile payload,
    eval.py's lesson on remote-compile backends).

    ``dtype`` sets the net's compute dtype (params stay fp32 — flax casts
    at use sites). The default ``"auto"`` is bfloat16, the measured serving
    winner (see ``_resolve_serve_dtype``); pass ``None``/``"float32"`` (or
    set ``GDT_SERVE_DTYPE=float32``) for the conservative fp32 path."""

    # forward-only net: identical params, serving compute dtype.
    # NOTE: the serving artifact is exported as portable StableHLO, so keep
    # the XLA lowering there (Pallas custom calls are backend-pinned) unless
    # serving on the same TPU generation.
    dtype = _resolve_serve_dtype(dtype)
    net = model.net if dtype is None else model.net.clone(dtype=dtype)

    def _detect(params, rgb, focal, principal_point, patch_size, patch_center, resampling):
        posterior, pose_feat = net.apply(
            {"params": params}, rgb, method=net.encode
        )
        dec_pose, _ = net.apply(
            {"params": params},
            pose_feat,
            False,  # mode path: deterministic detector
            method=net._decode_pose,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
        rec = recover_boxes(
            dec_pose,
            focal_length=focal,
            principal_point=principal_point,
            patch_size=patch_size,
            patch_center=patch_center,
            resampling_factor=resampling,
            hmin_table=hmin_table,
            hmax_table=hmax_table,
            patch_out=patch_out,
        )
        return rec["boxes_3d"], rec["class_id"], rec["score"]

    if params_as_arg:
        return _detect

    def detect(rgb, focal, principal_point, patch_size, patch_center, resampling):
        return _detect(
            net_params, rgb, focal, principal_point, patch_size, patch_center, resampling
        )

    return detect


def export_detector(
    model,
    net_params,
    hmin_table,
    hmax_table,
    batch: Optional[int] = 8,
    input_size: Optional[int] = None,
    platforms=None,
    dtype="auto",
) -> bytes:
    """Serialize the detector to a StableHLO blob.

    batch: a fixed batch size, or ``None`` for a BATCH-POLYMORPHIC artifact
    (``jax.export`` symbolic dimension): one blob serves any batch size —
    including per-device shards of a data-parallel serving mesh (see
    ``shard_detector``) — instead of one export per deployment shape.

    dtype: compute dtype baked into the artifact; the default ``"auto"``
    (bfloat16, the measured serving winner) stays portable — it lowers to
    plain StableHLO ops, no backend-pinned custom calls. Pass
    ``"float32"`` for a full-precision artifact.
    """
    size = input_size or getattr(model, "input_size", 256)
    detect = make_detector_fn(
        model, net_params, jnp.asarray(hmin_table), jnp.asarray(hmax_table),
        size, dtype=dtype,
    )
    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = batch
    args = (
        jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
    )
    exported = jax.export.export(jax.jit(detect), platforms=platforms)(*args)
    return bytes(exported.serialize())


def load_detector(blob: bytes):
    """Deserialize an exported detector into a callable."""
    exported = jax.export.deserialize(bytearray(blob))

    def call(*args):
        return exported.call(*[jnp.asarray(a) for a in args])

    return call


def shard_detector(blob: bytes, mesh, axis: str = "data"):
    """Data-parallel serving of a deserialized artifact over a device mesh.

    Each device runs the exported function on its local batch shard
    (``shard_map``; the artifact must be batch-polymorphic, or exported with
    ``batch == global_batch // mesh.size``). Inputs are global arrays (or
    host arrays, device_put automatically); outputs come back batch-sharded.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    exported = jax.export.deserialize(bytearray(blob))
    spec = P(axis)
    in_specs = (spec,) * 6
    f = jax.jit(
        jax.shard_map(
            lambda *a: exported.call(*a),
            mesh=mesh,
            in_specs=in_specs,
            out_specs=spec,
            check_vma=False,
        )
    )
    sharding = NamedSharding(mesh, spec)

    def call(*args):
        return f(*[jax.device_put(jnp.asarray(a), sharding) for a in args])

    return call

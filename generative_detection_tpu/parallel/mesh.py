"""Device mesh & sharding helpers — the framework's comm layer.

The reference's distribution story is 4-GPU DDP over NCCL, fully implicit in
PyTorch Lightning (ref train.py:162, configs/...yaml:137; SURVEY §2.3/§5.8).
The TPU-native equivalent is a named ``jax.sharding.Mesh`` with the batch
sharded over a ``data`` axis: under ``jit``, XLA inserts the gradient
all-reduce (psum over ICI) and turns batch means into global means — there is
no hand-written collective in the hot path. Metric reduction ("sync_dist")
falls out of the same mechanism.

Multi-chip testing without hardware: build the same mesh over
``xla_force_host_platform_device_count`` virtual CPU devices (tests/conftest,
``__graft_entry__.dryrun_multichip``).

The mesh is 1-D ``data`` for parity with the reference (its only axis), but
helpers accept extra axes (e.g. ``("data", "model")``) so tensor-parallel
shardings can be layered on without touching call sites.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Device-put a host batch dict with the batch dim sharded over ``axis``.

    Multi-process (multi-host) runs: each process passes its LOCAL shard of
    the global batch and the pieces are assembled into one global array
    (the DDP per-rank batch contract, ref train.py:162). Single-process runs
    device_put the whole batch directly.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicated_scalar(value, mesh: Mesh, dtype=None):
    """Place a host scalar replicated over the mesh.

    Use this for values that feed jitted-step arguments whose other leaves
    are mesh-attached (e.g. overriding ``TrainState.step``): a bare
    ``jnp.asarray`` scalar carries an empty sharding, which differs from the
    step OUTPUT's mesh-attached aval — the next call would then retrace and
    compile a second copy of the (large) step executable. Multi-controller
    processes must assemble global arrays from process-local data;
    single-process placement is a plain device_put.
    """
    arr = np.asarray(value, dtype)
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, arr)
    return jax.device_put(arr, sharding)


def local_batch_size(global_batch_size: int, mesh: Mesh, axis: str = "data") -> int:
    n = mesh.shape[axis]
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by mesh axis "
            f"'{axis}' size {n}"
        )
    return global_batch_size // n

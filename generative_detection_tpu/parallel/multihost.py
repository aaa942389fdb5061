"""Multi-host (multi-slice / DCN) support.

The reference scales across processes with SLURM srun + Lightning DDP
(ref README.md:58, train.py:162). The TPU-native analogue: one JAX process
per host, ``jax.distributed.initialize`` for cross-host coordination, the
same ``Mesh`` spanning all global devices, batch sharded over the data axis
by *process* (each host feeds its local shard via
``jax.make_array_from_process_local_data``). Gradient psum rides ICI within a
slice and DCN across slices — laid out automatically by XLA because the mesh
axis is ordered over global devices.

Single-host runs are unaffected (initialize() is a no-op there).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Environment markers that identify a genuine multi-process launch. On a real
# TPU pod the TPU runtime exports worker topology; under SLURM srun (the
# reference's launcher, ref README.md:58) task variables appear; and
# JAX_COORDINATOR_ADDRESS is jax.distributed's own contract. An explicit
# coordinator address always means "join"; worker-list vars only count when
# they imply MORE THAN ONE worker (single-chip runtimes export e.g.
# TPU_WORKER_HOSTNAMES=localhost, which is not a cluster).
_COORDINATOR_MARKERS = (
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)
_WORKER_LIST_MARKERS = (
    "TPU_WORKER_HOSTNAMES",
    "TPU_PROCESS_ADDRESSES",
)


def should_initialize() -> bool:
    """Whether to attempt joining a distributed cluster at startup.

    Behavior matrix:
    - ``GDT_MULTIHOST=1``  -> always attempt (manual override);
    - ``GDT_MULTIHOST=0``  -> never attempt (manual opt-out);
    - otherwise            -> attempt iff the launch environment implies a
      multi-process world: an explicit coordinator address, a TPU worker
      list with >1 entries, or an srun-launched step with >1 tasks
      (``SLURM_STEP_NUM_TASKS`` — NOT the allocation-level ``SLURM_NTASKS``:
      a bare ``python train.py`` inside ``salloc -n 4`` is a single process
      and must not block on peers that will never connect). Plain
      single-host runs match none of these, so startup never blocks on
      coordinator discovery; real pods export multi-entry topology
      unconditionally, so no user flag is needed there.
    """
    override = os.environ.get("GDT_MULTIHOST")
    if override == "1":
        return True
    if override == "0":
        return False
    if any(os.environ.get(v) for v in _COORDINATOR_MARKERS):
        return True
    for v in _WORKER_LIST_MARKERS:
        if len([h for h in os.environ.get(v, "").split(",") if h]) > 1:
            return True
    try:
        return int(os.environ.get("SLURM_STEP_NUM_TASKS", "1")) > 1
    except ValueError:
        return False


def maybe_initialize() -> None:
    """Join the cluster when launch-environment markers say one exists;
    ``initialize()`` itself is still a safe no-op on failure."""
    if should_initialize():
        initialize()


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (env-driven when args omitted:
    honors TPU metadata / MEGASCALE / JAX_COORDINATOR_ADDRESS)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logging.info(
            "jax.distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    except Exception as e:  # single-host / no coordinator
        logging.debug("jax.distributed.initialize skipped: %s", e)


def is_main_process() -> bool:
    """host-0 I/O gating (replaces Lightning rank_zero_only,
    ref callbacks.py:10,128,140)."""
    return jax.process_index() == 0


def global_batch_from_local(
    local_batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data"
):
    """Assemble a globally-sharded batch from each process's local shard."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )

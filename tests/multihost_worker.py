"""Worker for the 2-process multi-host test (not a pytest module).

Each process joins a jax.distributed CPU cluster (2 virtual devices per
process -> 4 global), instantiates the tiny model, runs TWO fused train
steps over the global mesh with each process feeding only its LOCAL batch
shard, and prints the losses. The parent test asserts both ranks computed
identical, finite global losses and that only rank 0 wrote artifacts.

This exercises the real multi-host wiring (the DDP analogue of ref
train.py:162, README.md:58): jax.distributed init, per-process data shards
(`parallel.shard_batch` -> make_array_from_process_local_data), gradient
psum over the global mesh, and host-0 I/O gating.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
workdir = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gdt_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generative_detection_tpu.config import load_yaml, instantiate_from_config
from generative_detection_tpu.parallel import create_mesh, shard_batch
from generative_detection_tpu.parallel.multihost import is_main_process
from generative_detection_tpu.train import (
    create_train_state,
    make_optimizers,
    make_train_step,
)
from generative_detection_tpu.train.checkpoint import CheckpointManager

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cfg = load_yaml(os.path.join(root, "configs/autoencoder/pose/tiny_cpu.yaml"))
model = instantiate_from_config(cfg["model"])
model.learning_rate = 1e-4

assert jax.process_count() == nproc, jax.process_count()
mesh = create_mesh()  # all 4 global devices
opt_ae, opt_disc = make_optimizers(model.learning_rate, grad_clip=1.0)

local_bs = 2  # per-process shard; global batch = 4
global_bs = local_bs * nproc

def _barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Coordination-service barrier (control plane only). The Gloo data plane
    has a hard 30s key-exchange deadline, so both processes must finish their
    (CPU-contended, possibly minutes-long) XLA compiles BEFORE the first
    collective executes — AOT-compile, then meet here."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_ms)


with mesh:
    state = create_train_state(
        model, jax.random.PRNGKey(0), global_bs, opt_ae, opt_disc, mesh=mesh
    )
    step_fn = jax.jit(make_train_step(model, opt_ae, opt_disc, phase="full"))

    from generative_detection_tpu.parallel import replicated_scalar

    losses = []
    for i in range(2):
        rng = np.random.default_rng(100 + i)  # same batch content per step on
        batch = model.example_batch(global_bs)  # both ranks; each feeds a slice
        batch["patch"] = rng.normal(size=(global_bs, 32, 32, 3)).astype(np.float32)
        cls = np.resize(np.asarray([0, 10], np.int32), global_bs)
        batch["class_id"] = cls
        batch["original_class_id"] = cls
        # PRODUCTION order (Trainer.fit -> _device_prefetch): each process
        # slices its RAW loader shard first, then runs prepare_batch on the
        # local shard — so rescale_minmax normalizes per-rank exactly like a
        # DDP rank normalizes its local GPU batch (ref autoencoder.py:434).
        raw_local = jax.tree.map(
            lambda x: x[pid * local_bs : (pid + 1) * local_bs], batch
        )
        local = model.prepare_batch(raw_local)
        sharded = shard_batch(local, mesh)
        # mesh-attached step scalar (multi-controller-aware helper): a bare
        # jnp scalar would force a mid-loop recompile
        state = state.replace(step=replicated_scalar(10 + i, mesh, np.int32))
        if i == 0:
            step_fn.lower(state, sharded).compile()  # local, no collectives
            _barrier("gdt_mh_compiled")
        state, metrics = step_fn(state, sharded)
        losses.append(
            (float(np.asarray(metrics["aeloss"])), float(np.asarray(metrics["discloss"])))
        )

# checkpointing is COLLECTIVE (orbax): every process calls save into the
# SHARED directory; orbax gates actual writes to the primary host.
shared_ckpt = os.path.join(os.path.dirname(workdir), "shared_ckpt")
mgr = CheckpointManager(shared_ckpt, monitor=None)
mgr.save_last(2, state)
mgr.close()

# non-orbax artifact I/O is host-0 gated (metrics/images/run dirs)
if is_main_process():
    with open(os.path.join(workdir, "metrics.jsonl"), "w") as f:
        f.write("{}\n")

print(
    f"MHOK pid={pid} main={is_main_process()} "
    f"losses={';'.join(f'{a:.6f},{d:.6f}' for a, d in losses)}",
    flush=True,
)

# meet before interpreter exit: the rank-0-only checkpoint write makes the
# ranks finish far apart, and jax's implicit shutdown barrier (short
# deadline) would kill the slower one.
_barrier("gdt_mh_done")
jax.distributed.shutdown()

"""Worker for the 2-process multi-host FIT test (not a pytest module).

The per-step worker (``multihost_worker.py``) drives the fused step by hand;
this one runs the REAL production path end-to-end — ``Trainer.fit`` over a
2-process jax.distributed CPU cluster (2 virtual devices per process -> 4
global) with the per-process loader shards the DataModule derives from the
JAX runtime, then a COLLECTIVE orbax restore round-trip into a fresh state.
The DDP analogue being replaced is ref train.py:162 (Lightning
``strategy=ddp`` + SLURM srun, README.md:58) with Lightning's own
fit/checkpoint loop.

Prints one ``MHFIT`` line the parent asserts on: rank, main-process flag,
the logged train losses, and the restored step/params agreement.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
workdir = sys.argv[4]  # per-rank scratch; parent dir is the SHARED logdir

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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generative_detection_tpu.config import instantiate_from_config, load_yaml
from generative_detection_tpu.parallel import shard_batch
from generative_detection_tpu.parallel.multihost import is_main_process
from generative_detection_tpu.train import create_train_state
from generative_detection_tpu.train.checkpoint import CheckpointManager
from generative_detection_tpu.train.loop import Trainer
from generative_detection_tpu.train.metrics import MetricsLogger


def _barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Coordination-service barrier (control plane only): the Gloo data plane
    has a hard ~30s key-exchange deadline, so both processes AOT-compile the
    step programs BEFORE the first collective executes — see
    multihost_worker.py for the full rationale."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_ms)


root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cfg = load_yaml(os.path.join(root, "configs/autoencoder/pose/tiny_cpu.yaml"))
model = instantiate_from_config(cfg["model"])
model.learning_rate = 1e-4
# Val length 32 (config: 8): with 2 process shards and per-process bs 8 the
# val loader then yields FULL batches identical in shape to train batches —
# so the mid-fit validate() hits the AOT-compiled eval program below instead
# of triggering a fresh (minutes-long, CPU-contended) collective compile on
# each rank independently, which can skew past Gloo's ~30s key-exchange
# deadline and kill one rank (the failure mode this worker exists to avoid).
cfg["data"]["params"]["validation"]["params"]["length"] = 32
data = instantiate_from_config(cfg["data"])

shared_logdir = os.path.dirname(workdir)  # one logdir => one orbax ckpt tree
logger = MetricsLogger(save_dir=workdir) if pid == 0 else None
trainer = Trainer(
    model,
    logdir=shared_logdir,
    max_epochs=100,
    max_steps=4,
    limit_val_batches=1,
    check_val_every_n_epoch=2,  # one multi-host validate() mid-fit
    callbacks=[],
    logger=logger,
    log_every_n_steps=1,
    step_counting="batch",
)
assert jax.process_count() == nproc

# ---- Pre-fit warm-up: compile AND execute every collective program fit()
# will run, with the ranks barrier-aligned around the executions.
#
# Why execution, not just AOT compile: Gloo initializes its cross-host
# context at the FIRST collective execution via a coordination-service
# key exchange with a hard ~30s deadline. On this 1-CPU box in-fit
# recompiles can skew the two ranks by minutes (the persistent compile
# cache reloads as recompiles when the sandbox host changes), so the
# context must be established while the ranks are barrier-synchronized —
# the same discipline as multihost_worker.py, extended to the fit loop's
# full program set (both train phases + the val eval step). The executions
# below also populate the in-process jit call caches of the EXACT jit
# objects fit() uses (fit's _build_fns rebuild is suppressed), so fit's
# own steps dispatch without recompiling.
trainer._build_fns()
data.setup()
batch = next(iter(data.train_dataloader()))
with trainer.mesh:
    state0 = create_train_state(
        model, jax.random.PRNGKey(trainer.seed), data.batch_size,
        trainer._opt_ae, trainer._opt_disc, mesh=trainer.mesh,
    )
    host, meta = model.prepare_batch_host(batch)
    prepared = model._prepare_jit()(
        shard_batch(host, trainer.mesh), meta, trainer.mesh.shape["data"]
    )
    # compile first (slow, skew-tolerant: no collectives execute)...
    for phase in ("pretrain", "full"):
        trainer._train_fns[phase].lower(state0, prepared).compile()
    val_batch = next(iter(data.val_dataloader()))
    vhost, vmeta = model.prepare_batch_host(val_batch)
    vprep = model._prepare_jit()(
        shard_batch(vhost, trainer.mesh), vmeta, trainer.mesh.shape["data"]
    )
    trainer._eval_fn_for("val").lower(
        state0, vprep, jax.random.PRNGKey(0)
    ).compile()
    _barrier("gdt_mhfit_compiled")
    # ...then execute once per program, ranks aligned: gloo contexts form
    # here. The train steps donate arg 0, so feed throwaway state copies.
    import jax.numpy as jnp

    def _copy_state(s):
        return jax.tree.map(lambda x: x + jnp.zeros((), x.dtype), s)

    for phase in ("pretrain", "full"):
        _s, _m = trainer._train_fns[phase](_copy_state(state0), prepared)
        jax.block_until_ready(_m["aeloss"])
    _em = trainer._eval_fn_for("val")(state0, vprep, jax.random.PRNGKey(0))
    jax.block_until_ready(list(_em.values())[0])
_barrier("gdt_mhfit_warm")

# fit() rebuilds the step jits unconditionally; suppress that so it keeps
# the warm jit objects above (the optimizers are already built and the lr
# hasn't changed — semantics identical, minus the recompile).
trainer._build_fns = lambda *a, **k: None

trainer.fit(data)

# losses from the logged stream exist only on rank 0; ranks compare the
# STATE instead (identical by grad-psum construction) via a checksum
leaf_sum = float(
    np.asarray(
        jax.jit(
            lambda s: sum(
                jax.numpy.sum(jax.numpy.abs(x).astype(jax.numpy.float32))
                for x in jax.tree.leaves(s.net_params)
            )
        )(trainer.state)
    )
)

# ---- collective restore round-trip: fresh state <- shared orbax tree ----
with trainer.mesh:
    fresh = create_train_state(
        model, jax.random.PRNGKey(7), data.batch_size,
        trainer._opt_ae, trainer._opt_disc, mesh=trainer.mesh,
    )
    mgr = CheckpointManager(trainer.ckptdir, monitor=trainer.monitor)
    restored = mgr.restore(fresh)
    mgr.close()
restored_step = int(np.asarray(restored.step))
match = all(
    np.allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(trainer.state.net_params),
        jax.tree.leaves(restored.net_params),
    )
)

print(
    f"MHFIT pid={pid} main={is_main_process()} "
    f"fit_step={int(np.asarray(trainer.state.step))} "
    f"restored_step={restored_step} params_match={match} "
    f"leaf_sum={leaf_sum:.6f}",
    flush=True,
)

_barrier("gdt_mhfit_done")
jax.distributed.shutdown()

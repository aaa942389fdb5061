"""Train state & optimizer construction.

Replaces the Lightning/optimizer plumbing of the reference
(``configure_optimizers``, src/models/autoencoder.py:365-377): two
Adam(b1=0.5, b2=0.9) optimizers — one over every autoencoder/pose parameter,
one over the discriminator — with Lightning-style global-norm gradient
clipping (configs/...yaml:140) and optional gradient accumulation
(train.py:376-381) via ``optax.MultiSteps``.

Faithful detail: the reference's AE optimizer covers encoder, decoder, the
three 1x1 quant convs and both pose MLPs — i.e. *all* net params — and does
NOT include the loss's learned ``logvar`` (it stays at its init forever);
LPIPS weights are frozen. The discriminator optimizer covers exactly
``loss.discriminator``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # batch counter (int32)
    net_params: Any
    loss_params: Any  # {'perceptual': frozen, 'discriminator': trained, 'logvar': frozen}
    opt_ae_state: Any
    opt_disc_state: Any
    rng: jax.Array


def make_optimizers(
    learning_rate: float,
    grad_clip: Optional[float] = 1.0,
    accumulate_grad_batches: int = 1,
    b1: float = 0.5,
    b2: float = 0.9,
    eps: float = 1e-8,
) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    def build():
        chain = []
        if grad_clip is not None and grad_clip > 0:
            chain.append(optax.clip_by_global_norm(grad_clip))
        chain.append(optax.adam(learning_rate, b1=b1, b2=b2, eps=eps))
        tx = optax.chain(*chain)
        if accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
        return tx

    return build(), build()


def zero1_leaf_spec(shape, n: int, axis_name: str = "data"):
    """PartitionSpec sharding the LARGEST divisible axis of ``shape`` over
    the mesh axis — ZeRO-1 optimizer-state partitioning. Leaves with no
    axis divisible by ``n`` (scalars, tiny vectors) stay replicated."""
    from jax.sharding import PartitionSpec

    best = None
    for i, d in enumerate(shape):
        if d % n == 0 and d >= n and (best is None or d > shape[best]):
            best = i
    if best is None:
        return PartitionSpec()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return PartitionSpec(*spec)


def create_train_state(
    model,
    rng: jax.Array,
    batch_size: int,
    opt_ae: optax.GradientTransformation,
    opt_disc: optax.GradientTransformation,
    mesh=None,
    zero1: bool = False,
    fsdp: bool = False,
) -> TrainState:
    """Initialize the full train state under ONE jit.

    Eager flax init dispatches hundreds of tiny ops — on a tunneled backend
    that is ~1 s of round-trip each (measured: 200+ s of a bench run was
    param init). One jitted program compiles once, hits the persistent
    executable cache on later runs, and initializes in milliseconds.

    ``mesh``: when given, the state comes out REPLICATED over the mesh, so
    the first train-step call sees the same input shardings as every later
    call — without it the step compiles twice (unsharded-input variant for
    call 1, step-output shardings for call 2+; two ~85 MB executables).

    ``zero1``: shard both Adam states (mu/nu + MultiSteps accumulators) over
    the ``data`` mesh axis — ZeRO stage 1. Params and grads stay replicated
    (the DP step already psums grads); only the optimizer moments, which are
    never consumed across shards, are partitioned: 2/3 of optimizer memory
    divides by the mesh size. XLA's sharding propagation turns the update
    into compute-on-shard + all-gather of the param delta — the idiomatic
    GSPMD formulation (annotate shardings, let XLA insert collectives).

    ``fsdp``: ZeRO stage 3 — shard the PARAMETERS too (net, loss — including
    the frozen perceptual weights, where the memory lives at scale), plus
    both Adam states as under ``zero1``. ALL per-parameter memory then
    divides by the mesh size; XLA inserts just-in-time all-gathers at each
    weight's use site and keeps grads/updates on-shard. Update math is
    unchanged (same caveat as ZeRO-1: reduction order differs by layout).
    Callers must pin the step's ``out_shardings`` to this state's layout,
    exactly as for ``zero1`` (Trainer._build_fns does).
    """

    def _init(rng_):
        init_rng, state_rng = jax.random.split(rng_)
        net_params, loss_params = model.init_variables(init_rng, batch_size=batch_size)
        opt_ae_state = opt_ae.init(net_params)
        opt_disc_state = opt_disc.init(loss_params["discriminator"])
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            net_params=net_params,
            loss_params=loss_params,
            opt_ae_state=opt_ae_state,
            opt_disc_state=opt_disc_state,
            rng=state_rng,
        )

    if mesh is None:
        return jax.jit(_init)(rng)

    from jax.sharding import NamedSharding, PartitionSpec

    repl = NamedSharding(mesh, PartitionSpec())
    if not (zero1 or fsdp) or mesh.shape.get("data", 1) <= 1:
        return jax.jit(_init, out_shardings=repl)(rng)

    n = mesh.shape["data"]
    abstract = jax.eval_shape(_init, rng)

    def opt_ns(x):
        return NamedSharding(mesh, zero1_leaf_spec(x.shape, n))

    param_ns = opt_ns if fsdp else (lambda _: repl)
    shardings = TrainState(
        step=repl,
        net_params=jax.tree.map(param_ns, abstract.net_params),
        loss_params=jax.tree.map(param_ns, abstract.loss_params),
        opt_ae_state=jax.tree.map(opt_ns, abstract.opt_ae_state),
        opt_disc_state=jax.tree.map(opt_ns, abstract.opt_disc_state),
        rng=repl,
    )
    return jax.jit(_init, out_shardings=shardings)(rng)

"""Sharded training step: data parallel × tensor (channel) parallel.

The reference trains on one GPU with batch=1 (``train_rcnn.py``,
``tests/r_unet_test.py``).  Here the train step is a single ``jax.jit`` over
a mesh: the batch is sharded on ``data``, large conv kernels are sharded on
``model`` over their out-feature axis, and XLA inserts the psum/all-gather
collectives (gradient reduction rides the ICI ring automatically from the
sharding annotations — no hand-written NCCL/MPI as in CUDA-land).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hcunet_tpu.parallel.mesh import DATA_AXIS, batch_sharding, shard_params


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_unet_loss_fn(model, loss_fn):
    """Wrap a flax model + loss into ``(params, stats, batch) -> (loss, stats)``.

    ``batch`` is ``(image, mask, pwl)`` channels-last.
    """

    def fn(params, batch_stats, batch):
        image, mask, pwl = batch
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            image,
            train=True,
            mutable=["batch_stats"],
        )
        return loss_fn(out, mask, pwl), updates["batch_stats"]

    return fn


def make_sharded_train_step(
    loss_with_stats: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    params_example,
) -> Tuple[Callable, Callable]:
    """Build ``(init_fn, step_fn)`` jitted over ``mesh``.

    ``loss_with_stats(params, stats, batch) -> (loss, new_stats)``.
    Parameters get model-axis shardings from their shapes; batches are
    sharded on the data axis; everything else is replicated.
    """
    p_shard = shard_params(params_example, mesh)
    replicated = NamedSharding(mesh, P())
    b_shard = batch_sharding(mesh)

    def init_fn(params, batch_stats):
        params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), params, p_shard
        )
        batch_stats = jax.device_put(batch_stats, replicated)
        opt_state = tx.init(params)
        return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))

    @jax.jit
    def step_fn(state: TrainState, batch):
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, b_shard), batch
        )

        def lf(p):
            return loss_with_stats(p, state.batch_stats, batch)

        (loss, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree_util.tree_map(
            lambda x, s: jax.lax.with_sharding_constraint(x, s), new_params, p_shard
        )
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            loss,
        )

    return init_fn, step_fn

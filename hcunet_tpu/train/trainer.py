"""Training engines.

The reference shipped no U-Net training loop (it lived in stripped
notebooks — SURVEY.md §0); the recipe survives in its losses, dataloaders
and the RDCNet loop in ``tests/r_unet_test.py:19-57``.  This module provides
the actual engines:

* :class:`UNetTrainer` — U-Net (or any flax model with the same variable
  collections) on Stack-style ``(image, mask, pwl)`` samples with the
  pwl-weighted BCE (+ optional dice), Adam, jitted steps, metrics logging
  and checkpointing.
* :class:`RecurrentTrainer` — the r-unet/RDCNet recipe: pwl-BCE on the
  probability channel + MSE on the vector channels
  (``tests/r_unet_test.py:51-54``).

Both run single-device by default and scale through
``hcunet_tpu.parallel.train`` when given a mesh.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hcunet_tpu.train.losses import cross_entropy, dice, mse_loss
from hcunet_tpu.utils.logging import Metrics, get_logger

log = get_logger(__name__)


@dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    epochs: int = 100
    loss_method: str = "pixel"
    dice_weight: float = 0.0
    gamma: Optional[float] = None  # ExponentialLR-style per-EPOCH decay
    steps_per_epoch: int = 1  # converts gamma to a per-step schedule
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 50
    log_every: int = 1


def _make_tx(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.gamma is not None:
        sched = optax.exponential_decay(
            cfg.learning_rate,
            transition_steps=max(cfg.steps_per_epoch, 1),
            decay_rate=cfg.gamma,
            staircase=True,
        )
    else:
        sched = cfg.learning_rate
    if cfg.weight_decay:
        return optax.adamw(sched, weight_decay=cfg.weight_decay)
    return optax.adam(sched)


class UNetTrainer:
    def __init__(
        self, model, variables: Dict, cfg: TrainConfig = TrainConfig(),
        mesh=None,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` — when given, the train step is
        built by :func:`hcunet_tpu.parallel.train.make_sharded_train_step`:
        the batch shards over the ``data`` axis, large conv kernels over
        ``model``, and XLA inserts the gradient psum over ICI.  ``fit``
        then groups ``data``-axis-size samples into each global batch."""
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = _make_tx(cfg)
        self.metrics = Metrics()
        if mesh is not None:
            from hcunet_tpu.parallel.mesh import DATA_AXIS
            from hcunet_tpu.parallel.train import make_sharded_train_step

            self.data_size = int(mesh.shape.get(DATA_AXIS, 1))
            init_fn, step_fn = make_sharded_train_step(
                self._make_loss_with_stats(), self.tx, mesh, self.params
            )
            self._init_fn = init_fn
            self._state = init_fn(self.params, self.batch_stats)
            self.params = self._state.params
            self.batch_stats = self._state.batch_stats
            self.opt_state = self._state.opt_state
            self._sharded_step = step_fn
        else:
            self.data_size = 1
            self.opt_state = self.tx.init(self.params)
            self._step = self._build_step()

    def _make_loss_with_stats(self):
        from hcunet_tpu.parallel.train import make_unet_loss_fn

        cfg = self.cfg

        def loss_fn(out, mask, pwl):
            loss = cross_entropy(out, mask, pwl, method=cfg.loss_method)
            if cfg.dice_weight:
                loss = loss + cfg.dice_weight * dice(out, mask)
            return loss

        return make_unet_loss_fn(self.model, loss_fn)

    def _build_step(self):
        model, cfg = self.model, self.cfg

        @jax.jit
        def step(params, batch_stats, opt_state, image, mask, pwl):
            def loss_fn(p):
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    image,
                    train=True,
                    mutable=["batch_stats"],
                )
                loss = cross_entropy(out, mask, pwl, method=cfg.loss_method)
                if cfg.dice_weight:
                    loss = loss + cfg.dice_weight * dice(out, mask)
                return loss, updates["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        return step

    def train_step(self, image, mask, pwl) -> float:
        if self.mesh is not None:
            self._state, loss = self._sharded_step(
                self._state, (image, mask, pwl)
            )
            self.params = self._state.params
            self.batch_stats = self._state.batch_stats
            self.opt_state = self._state.opt_state
            return float(loss)
        self.params, self.batch_stats, self.opt_state, loss = self._step(
            self.params, self.batch_stats, self.opt_state, image, mask, pwl
        )
        return float(loss)

    @property
    def variables(self) -> Dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def _iter_batches(self, dataset):
        """Yield global batches: single samples normally; groups of
        ``data``-axis-size samples stacked along the batch dim when training
        over a mesh (wrapping to fill the last group, so every step has a
        shardable batch)."""
        n = len(dataset)
        if self.data_size <= 1:
            for i in range(n):
                yield dataset[i]
            return
        for g0 in range(0, n, self.data_size):
            samples = [
                dataset[(g0 + k) % n] for k in range(self.data_size)
            ]
            yield tuple(
                np.concatenate([np.asarray(s[j]) for s in samples], axis=0)
                for j in range(len(samples[0]))
            )

    def fit(self, dataset, epochs: Optional[int] = None) -> List[float]:
        """``dataset``: indexable of ``(image, mask, pwl)`` channels-last
        batches.  Returns per-epoch summed losses (the reference trainer's
        console metric, ``train_fastercnn_func.py:51-62``)."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        summed: List[float] = []
        for e in range(epochs):
            t0 = time.perf_counter()
            total = 0.0
            for image, mask, pwl in self._iter_batches(dataset):
                total += self.train_step(
                    jnp.asarray(image), jnp.asarray(mask), jnp.asarray(pwl)
                )
            summed.append(total)
            self.metrics.write(
                epoch=e, summed_loss=total,
                avg_loss=total / max(len(dataset), 1),
                epoch_seconds=time.perf_counter() - t0,
            )
            if cfg.log_every and e % cfg.log_every == 0:
                log.info(
                    "epoch %d | SL %.6f | AL %.6f | %.2fs",
                    e, total, total / max(len(dataset), 1),
                    time.perf_counter() - t0,
                )
            if (
                cfg.checkpoint_path
                and cfg.checkpoint_every
                and (e + 1) % cfg.checkpoint_every == 0
            ):
                self.save(cfg.checkpoint_path)
        return summed

    def save(self, path: str, config=None, hyperparameters: Optional[Dict] = None):
        from hcunet_tpu.utils.checkpoint import save_checkpoint

        cfg_obj = config if config is not None else getattr(self.model, "config")
        hp = dict(
            learning_rate=self.cfg.learning_rate,
            epochs=self.cfg.epochs,
            loss_method=self.cfg.loss_method,
        )
        hp.update(hyperparameters or {})
        save_checkpoint(path, self.variables, cfg_obj, hp)

    def save_training_state(self, path: str) -> None:
        """Full resume state: variables + optimizer state.

        The reference never checkpointed optimizer state (SURVEY.md §5.4 —
        'training resume = re-load weights and go'); production training
        needs exact resume, so Adam moments are included.
        """
        from flax import serialization

        blob = serialization.to_bytes(
            {"variables": self.variables, "opt_state": self.opt_state}
        )
        with open(path, "wb") as f:
            f.write(blob)

    def load_training_state(self, path: str) -> None:
        from flax import serialization

        template = {"variables": self.variables, "opt_state": self.opt_state}
        with open(path, "rb") as f:
            state = serialization.from_bytes(template, f.read())
        self.params = state["variables"]["params"]
        self.batch_stats = state["variables"].get("batch_stats", {})
        self.opt_state = state["opt_state"]
        if self.mesh is not None:
            # re-place params/stats with their mesh shardings, and the
            # restored optimizer state with the shardings a fresh init gives
            # its leaves (Adam moments inherit the param shardings) — the
            # resumed trajectory is then identical to an uninterrupted run
            # (tested on the virtual mesh:
            # test_unet_trainer_mesh_resume_matches_uninterrupted)
            from jax.sharding import NamedSharding, PartitionSpec

            template = self._init_fn(self.params, self.batch_stats)
            replicated = NamedSharding(self.mesh, PartitionSpec())

            def _target(t):
                # Adam moments inherit the params' NamedShardings; scalar
                # leaves (e.g. the Adam count) come out of tx.init on the
                # default device — committing that single-device placement
                # would conflict with the 8-device params, so replicate.
                s = t.sharding
                return s if isinstance(s, NamedSharding) else replicated

            opt_state = jax.tree_util.tree_map(
                lambda x, t: jax.device_put(jnp.asarray(x), _target(t)),
                self.opt_state, template.opt_state,
            )
            self._state = template._replace(opt_state=opt_state)
            self.params = self._state.params
            self.batch_stats = self._state.batch_stats
            self.opt_state = self._state.opt_state


class RecurrentTrainer(UNetTrainer):
    """r-unet/RDCNet recipe: out[..., 0] is the probability channel trained
    with pwl-BCE; out[..., 2:5] are the vector channels trained with MSE
    (``tests/r_unet_test.py:51-54``)."""

    def _make_loss_with_stats(self):
        model, cfg = self.model, self.cfg

        def fn(params, batch_stats, batch):
            image, mask, pwl, vec = batch
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
                out, updates = model.apply(
                    variables, image, train=True, mutable=["batch_stats"]
                )
                new_stats = updates["batch_stats"]
            else:
                out = model.apply(variables, image)
                new_stats = batch_stats
            loss = cross_entropy(
                out[..., 0:1], mask, pwl, method=cfg.loss_method
            )
            loss = loss + mse_loss(out[..., 2:5], vec)
            return loss, new_stats

        return fn

    def _build_step(self):
        model, cfg = self.model, self.cfg

        @jax.jit
        def step(params, batch_stats, opt_state, image, mask, pwl, vec):
            def loss_fn(p):
                variables = {"params": p}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                    out, updates = model.apply(
                        variables, image, train=True, mutable=["batch_stats"]
                    )
                    new_stats = updates["batch_stats"]
                else:
                    out = model.apply(variables, image)
                    new_stats = batch_stats
                prob = out[..., 0:1]
                vecs = out[..., 2:5]
                loss = cross_entropy(prob, mask, pwl, method=cfg.loss_method)
                loss = loss + mse_loss(vecs, vec)
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        return step

    def train_step(self, image, mask, pwl, vec) -> float:  # type: ignore[override]
        if self.mesh is not None:
            self._state, loss = self._sharded_step(
                self._state,
                (jnp.asarray(image), jnp.asarray(mask), jnp.asarray(pwl),
                 jnp.asarray(vec)),
            )
            self.params = self._state.params
            self.batch_stats = self._state.batch_stats
            self.opt_state = self._state.opt_state
            return float(loss)
        self.params, self.batch_stats, self.opt_state, loss = self._step(
            self.params, self.batch_stats, self.opt_state,
            jnp.asarray(image), jnp.asarray(mask), jnp.asarray(pwl),
            jnp.asarray(vec),
        )
        return float(loss)

    def fit(self, dataset, epochs: Optional[int] = None) -> List[float]:  # type: ignore[override]
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        summed: List[float] = []
        for e in range(epochs):
            total = 0.0
            for image, mask, pwl, com, vec in self._iter_batches(dataset):
                total += self.train_step(image, mask, pwl, vec)
            summed.append(total)
            self.metrics.write(epoch=e, summed_loss=total)
        return summed

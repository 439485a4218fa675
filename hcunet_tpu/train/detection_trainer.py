"""Detection trainer — the ``hcat.train.frcnn`` contract
(``hcat/train/train_fastercnn_func.py:8-70``) rebuilt for the JAX detector.

Semantics preserved: epoch loop over a Section-style dataset (batch of 1),
nan/inf input guards that raise, the four torchvision loss terms summed with
``loss_classifier`` scaled, Adam + per-epoch exponential LR decay, per-epoch
summed/average loss reporting.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hcunet_tpu.models.detection import Detector
from hcunet_tpu.utils.logging import Metrics, get_logger

log = get_logger(__name__)


@dataclass
class DetectionTrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    gamma: float = 0.997  # ExponentialLR per epoch
    epochs: int = 5000
    classifier_scale: float = 3.0  # train_rcnn.py:64 'scale'
    max_gt: int = 64  # static padding for ground-truth boxes
    # Alternative schedule (beyond the reference's ExponentialLR): linear
    # warmup to ``learning_rate`` then cosine decay over ``total_steps``.
    schedule: str = "exp"  # "exp" | "cosine"
    warmup_steps: int = 0
    total_steps: int = 0  # required for schedule="cosine"


class DetectionTrainer:
    def __init__(
        self,
        detector: Detector,
        variables: Dict,
        cfg: DetectionTrainConfig = DetectionTrainConfig(),
        steps_per_epoch: int = 1,
        mesh=None,
        batch_size: Optional[int] = None,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` — when given, the train step is
        built by :func:`hcunet_tpu.parallel.train.make_sharded_train_step`:
        a global batch of images shards over the ``data`` axis (one
        reference-semantics B=1 loss per sample via ``vmap``, gradients
        averaged by XLA's psum over ICI), large conv kernels shard over
        ``model``.  ``batch_size`` (default: the mesh's data-axis size, or 1
        without a mesh) turns on batched stepping even single-device — the
        data-parallel trajectory is tested identical to it.  With batching,
        the per-epoch ExponentialLR semantics need ``steps_per_epoch`` =
        ceil(len(dataset)/batch_size).  Reference: the batch=1 epoch loop of
        ``hcat/train/train_fastercnn_func.py:18-49`` — batching/sharding is
        the TPU-native scaling lever the reference lacks."""
        self.det = detector
        self.cfg = cfg
        self.variables = variables
        self.mesh = mesh
        if cfg.schedule == "cosine":
            if cfg.total_steps <= 0:
                raise ValueError("schedule='cosine' requires total_steps > 0")
            sched = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=cfg.learning_rate,
                warmup_steps=max(cfg.warmup_steps, 1),
                decay_steps=cfg.total_steps,
            )
        else:
            sched = optax.exponential_decay(
                cfg.learning_rate,
                transition_steps=max(steps_per_epoch, 1),
                decay_rate=cfg.gamma,
                staircase=True,
            )
        self.tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
        self.metrics = Metrics()
        self._state = None
        if mesh is not None:
            from hcunet_tpu.parallel.mesh import DATA_AXIS
            from hcunet_tpu.parallel.train import make_sharded_train_step

            self.batch_size = batch_size or int(mesh.shape.get(DATA_AXIS, 1))
            init_fn, step_fn = make_sharded_train_step(
                self._make_batched_loss(), self.tx, mesh, self._params()
            )
            trunk_stats = variables["trunk"].get("batch_stats", {})
            self._state = init_fn(self._params(), trunk_stats)
            self.opt_state = self._state.opt_state
            self._sharded_step = step_fn
            self._sync_from_state()
        else:
            self.batch_size = batch_size or 1
            self.opt_state = self.tx.init(self._params())
            self._step = self._build_step()
            self._batched_step = None  # built on first train_step_batch

    def _params(self):
        return {
            "trunk": self.variables["trunk"]["params"],
            "head": self.variables["head"]["params"],
        }

    def _with_params(self, params):
        v = {
            "trunk": dict(self.variables["trunk"]),
            "head": dict(self.variables["head"]),
        }
        v["trunk"]["params"] = params["trunk"]
        v["head"]["params"] = params["head"]
        return v

    def _sync_from_state(self):
        self.variables = self._with_params(self._state.params)
        self.variables["trunk"]["batch_stats"] = self._state.batch_stats
        self.opt_state = self._state.opt_state

    def _make_batched_loss(self):
        """``(params, trunk_stats, batch) -> (mean loss, mean new stats)``
        with ``batch = (images [B,H,W,3], boxes [B,G,4], labels [B,G],
        valid [B,G])``.  Each sample runs the reference's B=1 loss
        (``train_fastercnn_func.py:33-43`` semantics, classifier scaled)
        under ``vmap``; running BN stats average across the batch."""
        det, cfg = self.det, self.cfg

        def single(params, trunk_stats, image, boxes, labels, valid):
            variables = {
                "trunk": {"params": params["trunk"], "batch_stats": trunk_stats},
                "head": {"params": params["head"]},
            }
            losses, updates = det.losses(
                variables, image[None], boxes, labels, valid, train=True
            )
            total = 0.0
            for k, v in losses.items():
                if k == "loss_classifier":
                    v = v * cfg.classifier_scale
                total = total + v
            return total, updates.get("batch_stats", trunk_stats)

        def loss_with_stats(params, trunk_stats, batch):
            images, boxes, labels, valid = batch
            totals, stats = jax.vmap(
                lambda im, bx, lb, vd: single(params, trunk_stats, im, bx, lb, vd)
            )(images, boxes, labels, valid)
            new_stats = jax.tree_util.tree_map(
                lambda s: s.mean(axis=0), stats
            )
            return totals.mean(), new_stats

        return loss_with_stats

    def _build_batched_step(self):
        """Single-device jitted step over a [B, ...] batch — the unsharded
        twin of the mesh step (used for trajectory-parity testing and for
        B>1 training without a mesh)."""
        loss_with_stats = self._make_batched_loss()

        @jax.jit
        def step(params, trunk_stats, opt_state, images, boxes, labels, valid):
            def lf(p):
                return loss_with_stats(
                    p, trunk_stats, (images, boxes, labels, valid)
                )

            (total, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(
                params
            )
            upd, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, upd)
            return params, new_stats, opt_state, total

        return step

    def _build_step(self):
        det, cfg = self.det, self.cfg

        @jax.jit
        def step(params, trunk_stats, opt_state, image, boxes, labels, valid):
            def loss_fn(p):
                variables = {
                    "trunk": {"params": p["trunk"], "batch_stats": trunk_stats},
                    "head": {"params": p["head"]},
                }
                losses, updates = det.losses(
                    variables, image, boxes, labels, valid, train=True
                )
                total = 0.0
                for k, v in losses.items():
                    if k == "loss_classifier":
                        v = v * cfg.classifier_scale
                    total = total + v
                new_stats = updates.get("batch_stats", trunk_stats)
                return total, (losses, new_stats)

            (total, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            upd, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, upd)
            return params, new_stats, opt_state, total, losses

        return step

    def _pad_gt(self, boxes, labels):
        if len(labels) > self.cfg.max_gt:
            raise ValueError(
                f"sample has {len(labels)} ground-truth boxes but max_gt="
                f"{self.cfg.max_gt}; raise DetectionTrainConfig.max_gt — "
                f"silently dropping boxes would train them as background"
            )
        n = len(labels)
        pb = np.zeros((self.cfg.max_gt, 4), np.float32)
        pl = np.zeros((self.cfg.max_gt,), np.int32)
        pv = np.zeros((self.cfg.max_gt,), bool)
        pb[:n] = np.asarray(boxes, np.float32)[:n]
        pl[:n] = np.asarray(labels, np.int32)[:n]
        pv[:n] = True
        return pb, pl, pv

    @staticmethod
    def _guard_finite(image):
        if bool(jnp.isnan(image).sum() > 0):
            raise ValueError("image is nan")
        if bool(jnp.isinf(image).sum() > 0):
            raise ValueError("image is inf")

    def train_step_batch(self, images, targets) -> float:
        """One optimizer step on a batch: ``images`` [B, H, W, 3];
        ``targets`` a list of B ``{'boxes', 'labels'}`` dicts.  Returns the
        batch-mean summed loss.  Rides the mesh when one was given."""
        images = jnp.asarray(images, jnp.float32)
        self._guard_finite(images)
        padded = [self._pad_gt(t["boxes"], t["labels"]) for t in targets]
        pb = jnp.asarray(np.stack([p[0] for p in padded]))
        pl = jnp.asarray(np.stack([p[1] for p in padded]))
        pv = jnp.asarray(np.stack([p[2] for p in padded]))

        if self._state is not None:
            self._state, total = self._sharded_step(
                self._state, (images, pb, pl, pv)
            )
            self._sync_from_state()
            return float(total)

        if self._batched_step is None:
            self._batched_step = self._build_batched_step()
        params = self._params()
        trunk_stats = self.variables["trunk"].get("batch_stats", {})
        params, new_stats, self.opt_state, total = self._batched_step(
            params, trunk_stats, self.opt_state, images, pb, pl, pv
        )
        self.variables = self._with_params(params)
        self.variables["trunk"]["batch_stats"] = new_stats
        return float(total)

    def train_step(self, image, boxes, labels) -> float:
        """``image``: [1, H, W, 3]; ``boxes``: [N, 4]; ``labels``: [N]."""
        if self._state is not None:
            if self.batch_size != 1:
                raise ValueError(
                    "mesh trainer steps on global batches of "
                    f"{self.batch_size}; use train_step_batch/fit"
                )
            return self.train_step_batch(
                jnp.asarray(image, jnp.float32),
                [{"boxes": boxes, "labels": labels}],
            )
        image = jnp.asarray(image, jnp.float32)
        self._guard_finite(image)
        pb, pl, pv = self._pad_gt(boxes, labels)

        params = self._params()
        trunk_stats = self.variables["trunk"].get("batch_stats", {})
        params, new_stats, self.opt_state, total, losses = self._step(
            params, trunk_stats, self.opt_state, image,
            jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(pv),
        )
        self.variables = self._with_params(params)
        self.variables["trunk"]["batch_stats"] = new_stats
        return float(total)

    def _iter_batches(self, dataset):
        """Yield ``(images [B,H,W,3], [targets])`` groups of ``batch_size``
        samples (wrapping to fill the last group so every step has a full —
        and mesh-shardable — batch); B=1 passthrough otherwise."""
        n = len(dataset)
        for g0 in range(0, n, self.batch_size):
            samples = [dataset[(g0 + k) % n] for k in range(self.batch_size)]
            shapes = {np.asarray(im).shape[1:3] for im, _ in samples}
            if len(shapes) > 1:
                raise ValueError(
                    "batch_size>1 stacks images into one [B,H,W,3] array, "
                    f"but the dataset yields mixed sizes {sorted(shapes)}; "
                    "crop/resize to a common size (e.g. random_crop) or "
                    "train with batch_size=1 (per-sample dispatch handles "
                    "any size)"
                )
            images = np.concatenate(
                [
                    np.asarray(im)[..., :3]
                    if im.shape[-1] > 3 else np.asarray(im)
                    for im, _ in samples
                ],
                axis=0,
            )
            yield images, [t for _, t in samples]

    def fit(self, dataset, epochs: Optional[int] = None) -> List[float]:
        epochs = epochs if epochs is not None else self.cfg.epochs
        summed_losses: List[float] = []
        prev_sum = 0.0
        for e in range(epochs):
            t0 = time.perf_counter()
            total = 0.0
            if self.batch_size > 1:
                for images, targets in self._iter_batches(dataset):
                    total += self.train_step_batch(images, targets)
            else:
                for i in range(len(dataset)):
                    image, target = dataset[i]
                    total += self.train_step(
                        image[..., :3] if image.shape[-1] > 3 else image,
                        target["boxes"], target["labels"],
                    )
            summed_losses.append(total)
            self.metrics.write(epoch=e, summed_loss=total)
            log.info(
                "epoch %d | PSL %.6f | SL %.6f | TE %.2fs",
                e, prev_sum, total, time.perf_counter() - t0,
            )
            prev_sum = total
        return summed_losses

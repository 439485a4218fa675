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
    ):
        self.det = detector
        self.cfg = cfg
        self.variables = variables
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
        self.opt_state = self.tx.init(self._params())
        self.metrics = Metrics()
        self._step = self._build_step()

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

    def train_step(self, image, boxes, labels) -> float:
        """``image``: [1, H, W, 3]; ``boxes``: [N, 4]; ``labels``: [N]."""
        image = jnp.asarray(image, jnp.float32)
        if bool(jnp.isnan(image).sum() > 0):
            raise ValueError("image is nan")
        if bool(jnp.isinf(image).sum() > 0):
            raise ValueError("image is inf")
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

        params = self._params()
        trunk_stats = self.variables["trunk"].get("batch_stats", {})
        params, new_stats, self.opt_state, total, losses = self._step(
            params, trunk_stats, self.opt_state, image,
            jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(pv),
        )
        self.variables = self._with_params(params)
        self.variables["trunk"]["batch_stats"] = new_stats
        return float(total)

    def fit(self, dataset, epochs: Optional[int] = None) -> List[float]:
        epochs = epochs if epochs is not None else self.cfg.epochs
        summed_losses: List[float] = []
        prev_sum = 0.0
        for e in range(epochs):
            t0 = time.perf_counter()
            total = 0.0
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

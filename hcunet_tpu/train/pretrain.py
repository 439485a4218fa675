"""Backbone pretraining — the detector's substitute for ImageNet weights.

The reference gets ImageNet features for free
(``fasterrcnn_resnet50_fpn(pretrained_backbone=True)``,
``hcat/rcnn.py:14``); this environment has no egress, so the framework
provides two paths to a non-random backbone:

1. **Port real torchvision weights** when a state_dict is available —
   ``hcunet_tpu.utils.port_torchvision.resnet50_variables_from_torchvision``
   (oracle-tested against a name-identical torch re-implementation).
2. **Synthetic pretraining** (this module): train the ResNet trunk on a
   procedurally generated shape/texture classification task (discs,
   rings, squares, stripe gratings at random scales/intensities on noisy
   backgrounds — crude but enough to push the early filters toward
   edges/blobs, which is what the hair-cell detector reuses).  The trained
   trunk saves to a msgpack file that ``Detector`` variables can be seeded
   from via :func:`seed_detector_backbone`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_CLASSES = 4  # disc, ring, square, stripes


def synthetic_shapes_batch(
    rng: np.random.Generator, n: int, hw: Tuple[int, int] = (64, 64)
) -> Tuple[np.ndarray, np.ndarray]:
    """Images [n, H, W, 3] float in [0,1]; labels [n] in 0..3."""
    H, W = hw
    yy, xx = np.mgrid[0:H, 0:W]
    images = rng.normal(0.3, 0.08, (n, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, N_CLASSES, n)
    for i in range(n):
        cy, cx = rng.uniform(H * 0.3, H * 0.7), rng.uniform(W * 0.3, W * 0.7)
        r = rng.uniform(6, min(H, W) * 0.3)
        amp = rng.uniform(0.4, 0.7)
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        if labels[i] == 0:  # disc
            m = (d < r).astype(np.float32)
        elif labels[i] == 1:  # ring
            m = ((d < r) & (d > r * 0.6)).astype(np.float32)
        elif labels[i] == 2:  # square
            m = (
                (np.abs(yy - cy) < r * 0.8) & (np.abs(xx - cx) < r * 0.8)
            ).astype(np.float32)
        else:  # stripes
            theta = rng.uniform(0, np.pi)
            period = rng.uniform(4, 12)
            phase = (xx * np.cos(theta) + yy * np.sin(theta)) / period
            m = ((np.sin(2 * np.pi * phase) > 0) & (d < r * 1.4)).astype(
                np.float32
            )
        chan = rng.dirichlet(np.ones(3)) * 3.0
        images[i] += (m * amp)[..., None] * chan[None, None, :].astype(np.float32)
    return images.clip(0, 1), labels.astype(np.int32)


def pretrain_backbone(
    steps: int = 200,
    batch: int = 16,
    lr: float = 1e-3,
    width: int = 64,
    hw: Tuple[int, int] = (64, 64),
    seed: int = 0,
    log_every: int = 50,
    progress=print,
) -> Dict:
    """Train a ResNet trunk on the synthetic shape task; returns its flax
    variables (params + batch_stats) ready for :func:`seed_detector_backbone`.
    """
    import optax

    from hcunet_tpu.models.resnet import ResNet

    import flax.linen as nn

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            feats = ResNet(width=width, name="body")(x, train)
            pooled = feats["c5"].mean(axis=(1, 2))
            return nn.Dense(N_CLASSES, name="probe")(pooled)

    model = Classifier()
    rng = np.random.default_rng(seed)
    x0, _ = synthetic_shapes_batch(rng, 2, hw)
    variables = model.init(jax.random.PRNGKey(seed), jnp.asarray(x0), train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(logits)
            loss = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (updates["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, acc

    for i in range(steps):
        images, labels = synthetic_shapes_batch(rng, batch, hw)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, jnp.asarray(images), jnp.asarray(labels)
        )
        if log_every and (i + 1) % log_every == 0:
            progress(
                f"pretrain step {i + 1}/{steps}: loss {float(loss):.3f} "
                f"acc {float(acc):.2f}"
            )
    return {
        "params": params["body"],
        "batch_stats": batch_stats["body"],
    }


def save_backbone(path: str, backbone_variables: Dict) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(backbone_variables))


def load_backbone(path: str, template: Optional[Dict] = None) -> Dict:
    from flax import serialization

    with open(path, "rb") as f:
        raw = f.read()
    if template is not None:
        return serialization.from_bytes(template, raw)
    return serialization.msgpack_restore(raw)


def seed_detector_backbone(detector_variables: Dict, backbone: Dict) -> Dict:
    """Return detector variables whose trunk body is replaced by the
    pretrained backbone (shapes must match; everything else unchanged)."""
    import copy

    out = copy.deepcopy(jax.tree.map(lambda x: x, detector_variables))
    tgt_p = out["trunk"]["params"]["body"]
    tgt_s = out["trunk"]["batch_stats"]["body"]

    def _check(a, b, path=""):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"backbone shape mismatch at {path}: "
                f"{np.shape(a)} vs {np.shape(b)}"
            )

    jax.tree.map(_check, backbone["params"], tgt_p)
    jax.tree.map(_check, backbone["batch_stats"], tgt_s)
    out["trunk"]["params"]["body"] = backbone["params"]
    out["trunk"]["batch_stats"]["body"] = backbone["batch_stats"]
    return out

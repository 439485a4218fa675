"""``hcat.train`` — the training subpackage
(``/root/reference/hcat/train/__init__.py``: ``from .train_fastercnn_func
import train as frcnn``), as imported by the drivers: ``import hcat.train``
(``train_rcnn.py:7``), ``from hcat.train import train_utils``
(``preprocess_manual_masks.py:10``).
"""

from typing import List, Tuple

from hcat.train import train_utils  # noqa: F401


def frcnn(model, dataloader, optimizer=None, scheduler=None,
          epochs: int = 100, lr: float = 1e-5, gamma: float = 0.997,
          device=None, scale: float = 1.0) -> Tuple[object, List[float]]:
    """``hcat.train.frcnn`` (``train_fastercnn_func.py:8-70``): epoch loop
    over a Section-style dataset with the reference's loss-dict summing
    (``loss_classifier`` scaled by ``scale``), Adam + per-epoch
    ExponentialLR.  Returns ``(model, summed_losses)`` like the reference
    (``train_rcnn.py:68``).

    ``model`` is the facade detector from :func:`hcat.rcnn`.  Documented
    divergence: ``optimizer``/``scheduler``/``device`` are accepted and
    ignored — JAX owns the optimizer; the recipe is configured by the
    explicit ``lr``/``gamma``/``scale`` arguments the reference driver
    passes alongside them (``train_rcnn.py:59-68``).
    """
    from hcunet_tpu.train.detection_trainer import (
        DetectionTrainConfig,
        DetectionTrainer,
    )

    trainer = DetectionTrainer(
        model.detector,
        model.variables,
        DetectionTrainConfig(
            learning_rate=lr, gamma=gamma, classifier_scale=scale,
            epochs=epochs,
        ),
        steps_per_epoch=max(len(dataloader), 1),
    )
    summed_losses = trainer.fit(dataloader, epochs=epochs)
    # push the trained weights back into the serving facade
    model.variables = trainer.variables
    return model, summed_losses


__all__ = ["frcnn", "train_utils"]

"""``hcat.dataloader`` — the reference's datasets
(``/root/reference/hcat/dataloader.py``), as imported by the R-CNN train
driver: ``from hcat import dataloader`` (``train_rcnn.py:6``).

Same contracts: :class:`Stack` loads ``X.tif``/``X.mask.tif``/``X.pwl.tif``
triplets, :class:`Section` parses PASCAL-VOC ``*.xml`` box annotations
(OHC1/2/3 + IHC, optional ``simple_class`` collapse), and
:class:`RecursiveStack` adds ``X.labels.com.tif`` + ``X.labels.vector.pkl``.
The reference's stale README alias ``dataloader.stack`` is intentionally
NOT provided (the class was always ``Stack``, ``dataloader.py:17``).
"""

from hcunet_tpu.data.datasets import (  # noqa: F401
    RecursiveStack,
    Section,
    Stack,
)

__all__ = ["Stack", "Section", "RecursiveStack"]

"""Visualization helpers (matplotlib) — ``hcat/utils.py:369-460`` rebuilds.

All functions draw onto the current matplotlib axes and return it; nothing
calls ``plt.show()`` so they compose in scripts and notebooks.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def imshow_denormalized(image: np.ndarray, mean: float = 0.5, std: float = 0.5):
    """Denormalize ((x*std)+mean) and display a [H, W, C<=3] image
    (``utils.py:369-377``)."""
    import matplotlib.pyplot as plt

    img = np.clip(np.asarray(image) * std + mean, 0, 1)
    plt.imshow(img if img.ndim == 2 or img.shape[-1] > 1 else img[..., 0])
    return plt.gca()


_CLASS_COLORS = ["k", "r", "b", "y", "w"]


def show_box_pred(
    image2d: np.ndarray,
    candidates: Dict[str, np.ndarray],
    threshold: float = 0.9,
):
    """Overlay detection boxes colored by class on a 2D image
    (``utils.py:380-418``).  Boxes are (x1, y1, x2, y2) in array axes."""
    import matplotlib.pyplot as plt

    img = np.asarray(image2d)
    if img.min() < 0:
        img = np.clip(img * 0.5 + 0.5, 0, 1)
    plt.imshow(img, origin="lower", cmap="Greys_r")
    boxes = np.asarray(candidates["boxes"]).reshape(-1, 4)
    scores = np.asarray(candidates.get("scores", np.ones(len(boxes))))
    labels = np.asarray(candidates.get("labels", np.ones(len(boxes), int)))
    for box, score, lab in zip(boxes, scores, labels):
        if score < threshold:
            continue
        c = _CLASS_COLORS[int(lab) % len(_CLASS_COLORS)]
        x1, y1, x2, y2 = box
        # array axis 0 is vertical in imshow; boxes store (dim0, dim1)
        plt.plot([y1, y2], [x1, x1], c, lw=0.5)
        plt.plot([y1, y2], [x2, x2], c, lw=0.5)
        plt.plot([y1, y1], [x1, x2], c, lw=0.5)
        plt.plot([y2, y2], [x1, x2], c, lw=0.5)
    return plt.gca()


def construct_instance_mask(cells: Sequence, base_mask: np.ndarray) -> np.ndarray:
    """Rebuild an instance volume from HairCell crops
    (``utils.py:447-460``)."""
    out = np.zeros(base_mask.shape, np.int32)
    for i, cell in enumerate(cells):
        if getattr(cell, "is_bad", False):
            continue
        x1, y1, z1, x2, y2, z2 = cell.image_coords
        out[x1:x2, y1:y2, z1:z2][out[x1:x2, y1:y2, z1:z2] == 0] = i + 1
    return out


def labels_to_rgb(labels: np.ndarray) -> np.ndarray:
    """Colorize an instance label image with deterministic per-id colors
    (uses :func:`hcunet_tpu.analysis.export.color_from_ind`)."""
    from hcunet_tpu.analysis.export import color_from_ind

    ids = np.unique(labels)
    lut = np.zeros((int(ids.max()) + 1 if len(ids) else 1, 4))
    for i in ids:
        if i:
            lut[int(i)] = np.clip(color_from_ind(int(i)), 0, 1)
    return lut[labels]

"""Result exports: CSV and QA renders.

Rebuilds ``hcat/utils.py:515-540`` (``cells_to_csv``) and
``hcat/validate/render_size.py`` (size-outlier QA tif).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def cells_to_csv(all_cells: List, file_name: str) -> None:
    import pandas as pd

    df = pd.DataFrame(
        {
            "center": [c.center for c in all_cells],
            "unique_id": [c.unique_id for c in all_cells],
            "percent_location": [c.distance_from_apex for c in all_cells],
            "mean_gfp": [c.gfp_stats.get("mean") for c in all_cells],
            "volume": [c.volume for c in all_cells],
        }
    )
    df = df.sort_values(by=["percent_location"])
    df.to_csv(file_name)


def render_size(
    unique_mask: np.ndarray,
    out_path: Optional[str] = "size_validation.tif",
    small: int = 5000,
    large: int = 15000,
) -> np.ndarray:
    """Paint cells into 3 classes by voxel count: too-small (<small) = 1,
    too-big (>large) = 3, normal = 2 (``render_size.py:6-24``).

    ``unique_mask``: [X, Y, Z] int labels.  Returns the class volume and
    writes a multipage tif when ``out_path`` is given.
    """
    ids, counts = np.unique(unique_mask, return_counts=True)
    lut = np.zeros(int(ids.max()) + 1 if len(ids) else 1, np.uint8)
    for i, c in zip(ids, counts):
        if i == 0:
            continue
        lut[int(i)] = 1 if c < small else (3 if c > large else 2)
    classes = lut[unique_mask]
    if out_path:
        from hcunet_tpu.data.tiff import imwrite

        # save as [Z, Y, X] pages like the reference's tif exports
        imwrite(out_path, np.transpose(classes, (2, 1, 0)))
    return classes


def mask_to_lines(labels: np.ndarray) -> np.ndarray:
    """Interior-pixel detector for outline-only overlays
    (``hcat/utils.py:463-501``): True where a pixel equals all four in-plane
    neighbors — vectorized instead of the reference's numba prange loops."""
    interior = np.zeros(labels.shape, bool)
    core = labels[1:-1, 1:-1, :]
    same = (
        (core == labels[:-2, 1:-1, :])
        & (core == labels[2:, 1:-1, :])
        & (core == labels[1:-1, :-2, :])
        & (core == labels[1:-1, 2:, :])
        & (core != 0)
    )
    interior[1:-1, 1:-1, :] = same
    return interior


def color_from_ind(i: int) -> np.ndarray:
    """Deterministic pseudo-random RGBA for a label id
    (``hcat/utils.py:504-512``)."""
    rng = np.random.default_rng(i)
    return rng.random(4) / 0.5

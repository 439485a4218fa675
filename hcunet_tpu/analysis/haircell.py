"""HairCell domain object — per-cell geometry + fluorescence statistics.

Rebuild of ``hcat/haircell.py``: volume estimate from voxel count at the
fixed confocal voxel size (289nm × 289nm × 1000nm — the reference flags its
own constant as suspect at ``haircell.py:21-24``; kept configurable here),
per-channel mean/std/median over the mask for DAPI/GFP/Myo7a/Actin with the
``(x·0.5)+0.5`` un-normalization when the crop came from a normalized image,
an ``is_bad`` flag for sub-2-voxel masks, and tonotopic placement against
the cochlear spline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

CHANNELS = ("dapi", "gfp", "myo7a", "actin")

# (289 nm)^2 x 1000 nm per voxel, in m^3 — haircell.py:20
VOXEL_VOLUME_M3 = 1000e-9 * (289e-9) ** 2


@dataclass
class HairCell:
    image_coords: Sequence[int]  # [x1, y1, z1, x2, y2, z2]
    center: Sequence[float]  # [x, y, z] in whole-image coords
    unique_id: int
    type: Optional[str] = None
    is_bad: bool = False
    volume: float = 0.0
    signal_stats: Dict[str, Dict[str, float]] = field(default_factory=dict)
    gfp_stats: Dict[str, float] = field(default_factory=dict)
    distance_from_apex: Optional[float] = None
    frequency: Optional[list] = None

    @classmethod
    def from_crop(
        cls,
        image_coords,
        center,
        image: np.ndarray,
        mask: np.ndarray,
        id: int,
        type: Optional[str] = None,
        voxel_volume_m3: float = VOXEL_VOLUME_M3,
    ) -> "HairCell":
        """``image``: [X, Y, Z, C] crop (channels-last); ``mask``: [X, Y, Z]
        bool/int crop of this cell's voxels."""
        image = np.asarray(image)
        mask = np.asarray(mask) > 0
        cell = cls(list(image_coords), list(center), int(id), type)
        cell.volume = float(mask.sum()) * voxel_volume_m3

        bad = mask.sum() <= 1
        cell.is_bad = bool(bad)
        nan_stats = {"mean": np.nan, "std": np.nan, "median": np.nan}
        for i, ch in enumerate(CHANNELS[: image.shape[-1]]):
            cell.signal_stats[ch] = (
                nan_stats if bad else cls._stats(image[..., i], mask)
            )
        gfp_idx = min(1, image.shape[-1] - 1)
        cell.gfp_stats = nan_stats if bad else cls._stats(image[..., gfp_idx], mask)
        return cell

    @staticmethod
    def _stats(channel: np.ndarray, mask: np.ndarray) -> Dict[str, float]:
        vals = channel[mask]
        if channel.min() < 0:  # undo (x-0.5)/0.5 normalization
            vals = vals * 0.5 + 0.5
        return {
            "mean": float(vals.mean()),
            "std": float(vals.std()),
            "median": float(np.median(vals)),
            "num_samples": int(vals.shape[0]),
        }

    def set_frequency(self, cochlea_curve: np.ndarray, percentage: np.ndarray):
        """Nearest spline point → percent position along the cochlea
        (``haircell.py:44-60``)."""
        x = cochlea_curve[0, :]
        y = cochlea_curve[1, :]
        dist = np.sqrt((self.center[1] - x) ** 2 + (self.center[0] - y) ** 2)
        i = int(np.argmin(dist))
        self.distance_from_apex = float(percentage[i])
        self._closest_place = cochlea_curve[:, i]
        self.frequency = [self._closest_place, self.distance_from_apex]


def generate_cell_objects(
    image: np.ndarray,
    unique_mask: np.ndarray,
    x_ind_chunk: int = 0,
    y_ind_chunk: int = 0,
    progress=None,
) -> List[HairCell]:
    """Extract a :class:`HairCell` per label (``hcat/segment.py:508-560``).

    ``image``: [X, Y, Z, C]; ``unique_mask``: [X, Y, Z] int labels.
    The per-label bbox is found with one ``find_objects`` pass instead of the
    reference's full-volume boolean scans per cell.
    """
    from scipy import ndimage as ndi

    if unique_mask.ndim != 3:
        raise ValueError(f"expected [X,Y,Z] labels, got {unique_mask.shape}")
    cells: List[HairCell] = []
    max_id = int(unique_mask.max())
    if max_id == 0:
        return cells
    # integer stacks stay raw until here (they cross the device tunnel at
    # their native width); rescale to [0,1] at crop granularity — only the
    # boxed voxels pay the conversion, not the whole chunk
    from hcunet_tpu.data.transforms import integer_unit_scale

    int_scale = (
        integer_unit_scale(image.dtype)
        if np.issubdtype(image.dtype, np.integer) else None
    )
    slices = ndi.find_objects(unique_mask, max_label=max_id)
    for label_id, slc in enumerate(slices, start=1):
        if slc is None:
            continue
        xs, ys, zs = slc
        # reference uses exclusive max coords for the crop (segment.py:552-553)
        x0, x1 = xs.start, xs.stop - 1
        y0, y1 = ys.start, ys.stop - 1
        z0, z1 = zs.start, zs.stop - 1
        mask_crop = unique_mask[x0:x1, y0:y1, z0:z1] == label_id
        img_crop = image[x0:x1, y0:y1, z0:z1, :]
        if int_scale is not None:
            img_crop = img_crop.astype(np.float32) / int_scale
        center = [
            x0 + (x1 - x0) / 2 + x_ind_chunk,
            y0 + (y1 - y0) / 2 + y_ind_chunk,
            (z1 - z0) / 2,
        ]
        cells.append(
            HairCell.from_crop(
                [x0, y0, z0, x1, y1, z1], center, img_crop, mask_crop, label_id
            )
        )
        if progress:
            progress(f"cell {label_id}/{max_id}")
    return cells

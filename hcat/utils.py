"""``hcat.utils`` — the reference's utility surface
(``/root/reference/hcat/utils.py``), as imported by the drivers:
``from hcat.utils import cells_to_csv`` (``loop_main.py:4``),
``from hcat import utils as u`` (``train_rcnn.py:6``),
``from hcat import mask as m, utils, segment`` (``valscripts/main_func.py:3``).

Direct re-exports where signatures already match; thin layout adapters
where the reference speaks torch channels-first.  Array-layout notes per
function; everything computes on the TPU-native engines.
"""

from typing import Dict, List, Optional, Tuple

import numpy as np

# signature-identical re-exports ---------------------------------------------
from hcunet_tpu.analysis.cochlea import get_cochlear_length  # noqa: F401
from hcunet_tpu.analysis.export import (  # noqa: F401
    cells_to_csv,
    color_from_ind,
    mask_to_lines,
)
from hcunet_tpu.analysis.viz import construct_instance_mask  # noqa: F401
from hcunet_tpu.core.shapes import calculate_indexes  # noqa: F401
from hcunet_tpu.infer.candidates import merge_cell_candidates  # noqa: F401


def pad_image_with_reflections(image, pad_size: Tuple[int, ...] = (30, 30, 6)):
    """``utils.py:33-74``: mirror-pad a ``[B, C, X, Y, Z]`` volume on all
    spatial faces.  Accepts numpy or cpu torch tensors; returns the same
    kind.  Keeps the reference's even-pad requirement."""
    for pad in pad_size:
        if pad % 2 != 0:
            raise ValueError("Padding must be divisible by 2")
    from hcunet_tpu.core.padding import reflection_pad_np

    is_torch = type(image).__module__.startswith("torch")
    arr = image.detach().cpu().numpy() if is_torch else np.asarray(image)
    out = np.moveaxis(
        reflection_pad_np(np.moveaxis(arr, 1, -1), pad_size), -1, 1
    )
    if is_torch:
        import torch

        return torch.from_numpy(np.ascontiguousarray(out))
    return out


def reconstruct_mask(path: str) -> np.ndarray:
    """``utils.py:256-292``: reassemble the semantic mask from chunk spills
    under ``path``; returns ``[1, 1, X, Y, Z]`` like the reference."""
    from hcunet_tpu.infer.chunks import reconstruct_mask as _rm

    return np.asarray(_rm(path))[None, None]


def reconstruct_segmented(path: str) -> np.ndarray:
    """``utils.py:294-333``: reassemble the instance mask from chunk spills
    (instance ids re-numbered across chunks); ``[1, 1, X, Y, Z]``."""
    from hcunet_tpu.infer.chunks import reconstruct_segmented as _rs

    return np.asarray(_rs(path))[None, None]


def _image_chw_to_hwc(image) -> np.ndarray:
    arr = (
        image.detach().cpu().numpy()
        if type(image).__module__.startswith("torch") else np.asarray(image)
    )
    if arr.ndim == 3 and arr.shape[0] in (1, 3, 4):
        arr = np.moveaxis(arr, 0, -1)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    return arr


def imshow(inp):
    """``utils.py:369-377``: denormalize ((x*0.5)+0.5) and plot."""
    from hcunet_tpu.analysis.viz import imshow_denormalized

    return imshow_denormalized(_image_chw_to_hwc(inp))


def show_box_pred(image, output, thr: float = 0.90):
    """``utils.py:380-418``: overlay detection boxes colored by class.
    ``image``: ``[C, H, W]`` (torch layout) or ``[H, W(, C)]``; ``output``:
    a torchvision-style LIST of result dicts (``output[0]`` is used, as in
    the reference) or a single candidates dict."""
    from hcunet_tpu.analysis.viz import show_box_pred as _sbp

    cand = output[0] if isinstance(output, (list, tuple)) else output
    cand = {
        k: (v.detach().cpu().numpy()
            if type(v).__module__.startswith("torch") else np.asarray(v))
        for k, v in cand.items()
    }
    return _sbp(_image_chw_to_hwc(image), cand, threshold=thr)


def show_box_pred_simple(image, boxes):
    """``utils.py:421-444``: box overlay without scores/classes."""
    b = np.asarray(boxes, np.float32).reshape(-1, 4)
    return show_box_pred(
        image,
        {"boxes": b, "scores": np.ones(len(b), np.float32),
         "labels": np.ones(len(b), np.int32)},
        thr=0.0,
    )


__all__ = [
    "pad_image_with_reflections",
    "calculate_indexes",
    "get_cochlear_length",
    "reconstruct_mask",
    "reconstruct_segmented",
    "merge_cell_candidates",
    "imshow",
    "show_box_pred",
    "show_box_pred_simple",
    "construct_instance_mask",
    "mask_to_lines",
    "color_from_ind",
    "cells_to_csv",
]

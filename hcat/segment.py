"""``hcat.segment`` — the inference-engine surface
(``/root/reference/hcat/segment.py``), as imported by the valscripts
driver: ``from hcat import mask as m, utils, segment``
(``valscripts/main_func.py:3``).

The four pipeline functions are the facade versions (reference signatures,
torch channels-first layout); the vector-clustering pair speaks the
reference's array contracts directly.
"""

import numpy as np

from hcunet_tpu.compat import (  # noqa: F401
    generate_cell_objects,
    generate_unique_segmentation_mask_from_probability,
    predict_cell_candidates,
    predict_segmentation_mask,
)
from hcunet_tpu.infer.vector_cluster import hist3d  # noqa: F401


def pixel_vec_to_cell(vector, mask, num_peaks: int = 100,
                      mask_threshold: float = 0.2) -> np.ndarray:
    """``segment.py:563-658``: cluster per-pixel center-offset votes into
    instance labels.  Accepts the reference's torch layouts — ``vector``
    ``[1, 3, X, Y, Z]`` (channels (z, y, x)) or channels-last
    ``[X, Y, Z, 3]``; ``mask`` ``[X, Y, Z]`` probability (extra leading
    1-dims squeezed).  Returns ``[X, Y, Z]`` int labels."""
    from hcunet_tpu.infer.vector_cluster import pixel_vec_to_cell as _pvc

    vec = np.asarray(
        vector.detach().cpu().numpy()
        if type(vector).__module__.startswith("torch") else vector
    )
    if vec.ndim == 5:  # [B, 3, X, Y, Z] torch layout
        vec = np.moveaxis(vec[0], 0, -1)
    elif vec.ndim == 4 and vec.shape[0] == 3 and vec.shape[-1] != 3:
        vec = np.moveaxis(vec, 0, -1)  # [3, X, Y, Z]
    m = np.asarray(
        mask.detach().cpu().numpy()
        if type(mask).__module__.startswith("torch") else mask
    )
    while m.ndim > 3:
        m = m[0]
    return _pvc(vec, m, num_peaks=num_peaks, mask_threshold=mask_threshold)


__all__ = [
    "predict_segmentation_mask",
    "predict_cell_candidates",
    "generate_unique_segmentation_mask_from_probability",
    "generate_cell_objects",
    "pixel_vec_to_cell",
    "hist3d",
]

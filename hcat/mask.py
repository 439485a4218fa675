"""``hcat.mask`` — the chunk spill record
(``/root/reference/hcat/mask.py:5-45``), imported by the valscripts driver
as ``from hcat import mask as m``.

:class:`Part` is this framework's chunk record
(:class:`hcunet_tpu.infer.chunks.Part`): same role (per-chunk semantic +
instance masks with a global top-left ``loc`` and null-compression for
empty masks), spilled as npz instead of pickle.  Construct via
``Part.create(mask, segmented_mask, loc)``; masks are ``[X, Y, Z]``
channels-dropped (the reference stored ``[1, 1, X, Y, Z]`` torch tensors).
"""

from hcunet_tpu.infer.chunks import Part  # noqa: F401

__all__ = ["Part"]

"""``hcat.haircell`` — the per-cell domain object
(``/root/reference/hcat/haircell.py:6-102``), imported by the study-level
validation driver as ``from hcat import haircell`` (``validate.py:7``,
whose pickle module-rename shim maps legacy ``haircell`` pickles here).

:class:`HairCell` carries the same surface: ``image_coords``, ``center``,
``unique_id``, per-channel dapi/gfp/myo7a/actin stats with
un-normalization, ``volume``, ``is_bad``, ``set_frequency``.
"""

from hcunet_tpu.analysis.haircell import HairCell  # noqa: F401

__all__ = ["HairCell"]

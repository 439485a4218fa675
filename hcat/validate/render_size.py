"""``hcat.validate.render_size``
(``/root/reference/hcat/validate/render_size.py:6-24``): paint cells into
three classes by voxel count and save ``size_validation.tif``."""

from hcunet_tpu.analysis.export import render_size  # noqa: F401

__all__ = ["render_size"]

"""``hcat.unet`` — the generic U-Net builder module
(``/root/reference/hcat/unet.py``), as imported by the valscripts driver:
``from hcat.unet import Unet_Constructor as GUnet``
(``valscripts/main_func.py:1``).

``Unet_Constructor`` is the facade class (constructor kwargs, torch array
layout, ``forward``/``save``/``load`` — including real reference ``.unet``
checkpoint loading) backed by the TPU-native
:class:`hcunet_tpu.models.unet.UNet`.
"""

from hcunet_tpu.compat import unet as Unet_Constructor  # noqa: F401

__all__ = ["Unet_Constructor"]

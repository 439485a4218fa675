"""``hcat.rcnn`` — the detection-head factory
(``/root/reference/hcat/rcnn.py:7-21``): ``rcnn(path)`` returns a
torchvision-contract detector (``model(images)`` → list of
``{'boxes','labels','scores'}``), accepting this framework's checkpoints
or a torchvision ``fasterrcnn_resnet50_fpn`` ``.pth`` state dict.
"""

from hcunet_tpu.compat import rcnn  # noqa: F401

__all__ = ["rcnn"]

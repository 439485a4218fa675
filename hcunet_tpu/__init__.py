"""hcunet_tpu — a TPU-native framework for confocal z-stack hair-cell analysis.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of wisamreid/HcUnet
(`hcat`): valid-convolution 2D/3D U-Nets, recurrent variants, a detection
head, tiled whole-cochlea inference with instance watershed, fluorescence
analytics and tonotopic mapping — designed for TPU meshes rather than a
single CUDA GPU.

Layers (cf. SURVEY.md §1):
    core/      shape algebra, padding, RNG plumbing
    ops/       kernels: conv blocks, NMS, RoIAlign, EDT, watershed, morphology
    models/    UNet, RecursiveUnet, RDCNet, detection head
    data/      tif datasets + pure-function transforms
    train/     losses, target generators, optax train loops
    infer/     batched tiled inference, instance segmentation, pipeline
    parallel/  mesh + spatial sharding + data parallel
    analysis/  HairCell stats, cochlear spline, CSV/QA exports
"""

__version__ = "0.1.0"

from hcunet_tpu.config import (
    DetectorConfig,
    PipelineConfig,
    RDCNetConfig,
    RUNetConfig,
    TileConfig,
    UNetConfig,
    WatershedConfig,
)

__all__ = [
    "DetectorConfig",
    "PipelineConfig",
    "RDCNetConfig",
    "RUNetConfig",
    "TileConfig",
    "UNetConfig",
    "WatershedConfig",
    "__version__",
    # facade (lazy) — mirrors the reference's hcat/__init__.py exports
    "UNet",
    "Detector",
    "analyze",
    "predict_segmentation_mask",
    "predict_cell_candidates",
    "generate_unique_segmentation_mask",
    "generate_cell_objects",
    "Segmenter",
    "compile_serving_apply",
    "compile_recurrent_apply",
]

_LAZY = {
    "UNet": ("hcunet_tpu.models.unet", "UNet"),
    "Detector": ("hcunet_tpu.models.detection", "Detector"),
    "analyze": ("hcunet_tpu.infer.pipeline", "analyze"),
    "predict_segmentation_mask": ("hcunet_tpu.infer.tiling", "predict_segmentation_mask"),
    "predict_cell_candidates": ("hcunet_tpu.infer.detect", "predict_cell_candidates"),
    "generate_unique_segmentation_mask": (
        "hcunet_tpu.infer.instance",
        "generate_unique_segmentation_mask",
    ),
    "generate_cell_objects": ("hcunet_tpu.analysis.haircell", "generate_cell_objects"),
    "Segmenter": ("hcunet_tpu.infer.serving", "Segmenter"),
    "compile_serving_apply": ("hcunet_tpu.infer.compile", "compile_serving_apply"),
    "compile_recurrent_apply": (
        "hcunet_tpu.infer.compile_recurrent",
        "compile_recurrent_apply",
    ),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'hcunet_tpu' has no attribute {name!r}")

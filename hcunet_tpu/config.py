"""Typed configuration for the whole framework.

The reference has no config system: behavior is set by module constants
(``hcat/__init__.py:18-30``), GPU/CPU-memory-keyed tile tables buried inside
functions (``hcat/segment.py:48-57,159-168,237-242``) and hard-coded paths.
Here every knob is a dataclass field; the memory-keyed auto-tiling idea
survives as :func:`auto_tile_config`, an auto-tuner over TPU HBM.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UNetConfig:
    """Architecture of the valid-conv U-Net (reference ``hcat/unet.py:15-123``).

    ``kernel1``/``kernel2`` mirror the reference's ``{'conv1':…, 'conv2':…}``
    per-step kernel dicts.  ``reference_skip_bug`` reproduces the reference's
    ``y = crop(x, y)`` behavior (``unet.py:313``) which replaces the skip
    connection with a copy of the upsampled tensor — useful only for
    numerical-parity tests against the PyTorch reference.
    """

    image_dimensions: int = 3
    in_channels: int = 4
    out_channels: int = 1
    feature_sizes: Tuple[int, ...] = (16, 32, 64, 128)
    kernel1: Tuple[int, ...] = (3, 3, 2)
    kernel2: Tuple[int, ...] = (3, 3, 1)
    upsample_kernel: Tuple[int, ...] = (8, 8, 2)
    max_pool_kernel: Tuple[int, ...] = (2, 2, 1)
    upsample_stride: Tuple[int, ...] = (2, 2, 1)
    dilation: int = 1
    groups: int = 2
    reference_skip_bug: bool = False

    def __post_init__(self):
        if self.image_dimensions not in (2, 3):
            raise ValueError(
                f"does not support {self.image_dimensions} dimensional images"
            )
        if len(self.feature_sizes) < 2:
            raise ValueError(
                f"the number of features must be at least 2, "
                f"not {len(self.feature_sizes)}"
            )
        for a, b in zip(self.feature_sizes[:-1], self.feature_sizes[1:]):
            if a * 2 != b:
                raise ValueError(
                    f"feature sizes must be multiples of two from each other: "
                    f"{a}*2 != {b}"
                )

    @classmethod
    def production_3d(cls) -> "UNetConfig":
        """The shipped inference architecture (``hcat/main.py:46-55``)."""
        return cls()

    @classmethod
    def readme_2d(cls) -> "UNetConfig":
        """The README quickstart config (``README.md:12-22``) — 2D.

        Note the reference cannot actually instantiate this (its ``Up``
        rejects ``ConvTranspose2d``); we support it.
        """
        return cls(
            image_dimensions=2,
            in_channels=4,
            out_channels=1,
            feature_sizes=(8, 16, 32, 64, 128),
            kernel1=(3, 3),
            kernel2=(3, 3),
            upsample_kernel=(2, 2),
            max_pool_kernel=(2, 2),
            upsample_stride=(2, 2),
            dilation=1,
            groups=1,
        )

    def shape_kwargs(self) -> Dict:
        """kwargs for :func:`hcunet_tpu.core.shapes.unet_output_shape`."""
        return dict(
            n_levels=len(self.feature_sizes),
            kernel1=self.kernel1,
            kernel2=self.kernel2,
            pool=self.max_pool_kernel,
            up_kernel=self.upsample_kernel,
            up_stride=self.upsample_stride,
        )


@dataclass(frozen=True)
class RUNetConfig:
    """RecursiveUnet (``hcat/r_unet.py:38-160``): GRU-style recurrence over a
    2-level same-padding U-Net, fixed timesteps."""

    in_channels: int = 4
    out_channels: int = 5
    channels: Tuple[int, int, int] = (16, 32, 64)
    kernel: Tuple[int, int, int] = (3, 3, 3)
    upsample_kernel: Tuple[int, int, int] = (6, 6, 5)
    max_pool_kernel: Tuple[int, int, int] = (2, 2, 1)
    upsample_stride: Tuple[int, int, int] = (2, 2, 1)
    timesteps: int = 10


@dataclass(frozen=True)
class RDCNetConfig:
    """RDCNet (``hcat/r_unet.py:207-227``)."""

    in_channels: int = 4
    out_channels: int = 5
    complexity: int = 10
    timesteps: int = 10


@dataclass(frozen=True)
class DetectorConfig:
    """Faster R-CNN style detector (``hcat/rcnn.py:7-21`` contract)."""

    num_classes: int = 3
    max_detections: int = 500
    min_size: int = 256
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 512
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    roi_align_output: int = 7


# ---------------------------------------------------------------------------
# Inference / post-processing configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TileConfig:
    """Tiled inference geometry.

    ``eval_size`` is the trusted output core per tile; ``pad`` the halo added
    on every face.  ``batch`` is how many tiles are evaluated per device step
    (the reference always uses 1 — ``hcat/segment.py:83-99``)."""

    eval_size: Tuple[int, ...] = (300, 300, 10)
    pad: Tuple[int, ...] = (128, 128, 10)
    batch: int = 4
    reference_exact_grid: bool = False


@dataclass(frozen=True)
class WatershedConfig:
    """Instance segmentation constants (``hcat/__init__.py:18-30``).

    ``backend`` selects the per-tile implementation:

    * ``"fused"`` (default) — one native call per tile
      (``native/watershed.cpp:instance_tile3d``): virtual z-expansion,
      chamfer mask dilation, flood.  Bit-identical labels to
      ``"materialized"`` (tested), ~none of its memory traffic.
    * ``"materialized"`` — the python path that literally builds the
      z-expanded float64 volumes like the reference
      (``hcat/segment.py:444-450``); kept as the parity oracle.
    * ``"device"`` — everything on the TPU inside one jit
      (``ops/watershed_jax.py`` bounded-iteration minimax-path relaxation,
      ``device_iters`` steps).  Approximate on plateau tie-breaks; for
      TPU-resident pipelines where the host hop dominates.
    """

    connectivity: int = 1
    compactness: float = 0.01
    expand_mask: int = 15
    expand_z: int = 5
    z_tolerance: int = 2
    mask_prob_threshold: float = 0.5
    cell_prob_threshold: float = 0.25
    seed_background_below: float = 0.15
    distance_floor: float = 0.2
    backend: str = "fused"
    device_iters: int = 96
    # host threads flooding tiles concurrently (the native op releases the
    # GIL).  Write-backs stay in tile order, so the output is IDENTICAL at
    # any worker count.  0 = auto (cpu_count - 1, min 1); 1 = serial.
    tile_workers: int = 0


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end ``analyze`` settings (``hcat/main.py:20-236``)."""

    numchunks: int = 3
    gaussian_sigma: float = 3.0
    prob_floor: float = 0.25
    prob_scale: float = 10.0
    normalize_mean: Tuple[float, ...] = (0.5, 0.5, 0.5, 0.5)
    normalize_std: Tuple[float, ...] = (0.5, 0.5, 0.5, 0.5)
    # dtype the probability map rides device→host in.  "float32" (default)
    # is the exact reference/round-2 behavior.  The host↔device link is the
    # pipeline's binding constraint on a remote-tunnel TPU (measured: h2d
    # 41.5 MB/s, d2h 17.3 MB/s, and the two directions SERIALIZE — see
    # BASELINE.md "tunnel link characterization"), so halving the prob-map
    # bytes converts ~1:1 into end-to-end wall time.  Two opt-in diets:
    # * "uint16" — fixed-point over the epilogue's static [0, prob_scale]
    #   range: 2 B/voxel, max abs error prob_scale/(2·65535) ≈ 7.6e-5
    #   (≈7.6e-6 in probability units — below any watershed-relevant
    #   precision; dominates bfloat16 at identical bytes).  Preferred.
    # * "uint8" — 1 B/voxel, max abs error prob_scale/510 ≈ 0.0196
    #   (≈2e-3 in probability units).  At the characterized link the
    #   remaining prob_d2h (1208 MB/production run) halves again: ~35 s
    #   off the 187 s serialized-link floor ≈ 19% steady-state — worth it
    #   only when that quantization is acceptable for the study; cells
    #   within ~2e-3 probability of a threshold can flip.
    # * "bfloat16" — 2 B/voxel, ~3 significant digits (~2e-3 rel near 1.0).
    #   Kept for round-3 measurement lineage.
    # Opt in for throughput-sensitive deployments (the bench and the
    # production-scale runner do; advisor r3 #3 flagged lossy-by-default).
    prob_transfer_dtype: str = "float32"
    # zlib-compress the per-chunk spill files (lossless either way — this
    # never changes outputs, only disk vs CPU).  Off by default: deflate
    # costs seconds per production chunk inside the host-side chunk tail
    # and inflate costs again at reconstruct, on a pipeline whose steady
    # state is host-CPU-bound; the reference's pickle spill was
    # uncompressed too (``hcat/mask.py:17``, ``main.py:189-191``).  Turn on
    # when work_dir disk is scarcer than CPU.
    spill_compress: bool = False
    detection_channels: Tuple[int, ...] = (0, 2, 3)
    unet: UNetConfig = field(default_factory=UNetConfig.production_3d)
    tiles: TileConfig = field(default_factory=TileConfig)
    watershed: WatershedConfig = field(default_factory=WatershedConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)


# ---------------------------------------------------------------------------
# HBM auto-tuner (successor of the reference's GPU-memory tile tables)
# ---------------------------------------------------------------------------


def device_hbm_bytes() -> Optional[int]:
    """Total HBM of device 0, or None off-accelerator."""
    import jax

    try:
        d = jax.devices()[0]
        stats = d.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return None


def auto_tile_config(
    unet: UNetConfig,
    hbm_bytes: Optional[int] = None,
    z_extent: int = 15,
    bytes_per_elem: int = 2,  # bf16 inference
) -> TileConfig:
    """Pick tile geometry from the network's shrink and available HBM.

    Replaces the reference's hand lookup tables keyed on {4,6,8,11} GB GPUs
    (``hcat/segment.py:48-57``):

    * the halo is the *measured* valid-conv shrink of the architecture
      (rounded up to a multiple of 8), not a guessed constant — the
      reference's PAD=128 wastes ~2.5x compute vs the actual (50,50,4);
    * the tile side and batch are chosen so the first-level activation
      footprint fits a conservative fraction of HBM, preferring more tiles
      per dispatch (amortizes dispatch latency) over bigger tiles.
    """
    from hcunet_tpu.core.shapes import unet_shrinkage

    if hbm_bytes is None:
        hbm_bytes = device_hbm_bytes() or 16 * 2**30
    budget = int(hbm_bytes * 0.5)

    tz = min(z_extent, 15)

    def shrink_at(side: int, pad_xy: int, pad_z: int):
        probe = (side + 2 * pad_xy, side + 2 * pad_xy)
        if unet.image_dimensions == 3:
            probe = probe + (tz + 2 * pad_z,)
        try:
            return unet_shrinkage(probe, **unet.shape_kwargs())
        except ValueError:
            return (64, 64, 8)

    # shrink depends (mildly) on the input size via pooling floors — iterate
    # to a fixed point at a representative tile side.
    pad_xy, pad_z = 48, 4 if unet.image_dimensions == 3 else 0
    for _ in range(3):
        s = shrink_at(512, pad_xy, pad_z)
        new_xy = -(-max(s[0], s[1]) // 8) * 8
        new_z = s[2] if unet.image_dimensions == 3 else 0
        if (new_xy, new_z) == (pad_xy, pad_z):
            break
        pad_xy, pad_z = new_xy, new_z

    best = TileConfig(
        eval_size=(128, 128, tz), pad=(pad_xy, pad_xy, pad_z), batch=1
    )
    c1 = unet.feature_sizes[0]
    # side capped at 384: batching tiles amortizes dispatch better than
    # growing tiles, and larger batched tiles crash the TPU compiler's
    # scratch allocation on 16 GB parts (measured: 624^2x23 x6 fails).
    for side in (256, 384):
        in_side = side + 2 * pad_xy
        in_z = tz + 2 * pad_z
        # ~4 first-level-sized tensors alive per tile through the pipeline
        per_tile = in_side * in_side * in_z * c1 * bytes_per_elem * 4
        batch = min(6, max(1, budget // max(per_tile, 1)))
        if per_tile <= budget:
            best = TileConfig(
                eval_size=(side, side, tz),
                pad=(pad_xy, pad_xy, pad_z),
                batch=int(batch),
            )
    return best


# ---------------------------------------------------------------------------
# (De)serialization — configs are persisted inside checkpoints, mirroring the
# reference's model_specification dict (``hcat/unet.py:76-88``).
# ---------------------------------------------------------------------------

_CONFIG_TYPES = {
    "UNetConfig": UNetConfig,
    "RUNetConfig": RUNetConfig,
    "RDCNetConfig": RDCNetConfig,
    "DetectorConfig": DetectorConfig,
    "TileConfig": TileConfig,
    "WatershedConfig": WatershedConfig,
    "PipelineConfig": PipelineConfig,
}


def config_to_dict(cfg) -> Dict:
    d = dataclasses.asdict(cfg)
    d["__type__"] = type(cfg).__name__
    return d


def _rebuild(cls, d: Dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if isinstance(v, dict):
            sub = _CONFIG_TYPES.get(v.get("__type__", f.type.replace('"', "")))
            if sub is None and f.type in _CONFIG_TYPES:
                sub = _CONFIG_TYPES[f.type]
            if sub is not None:
                v = _rebuild(sub, v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def config_from_dict(d: Dict):
    if "__type__" not in d:
        raise ValueError("missing __type__ tag")
    d = json.loads(json.dumps(d))  # deep copy; tuples become lists, fixed below
    return _rebuild(_CONFIG_TYPES[d["__type__"]], d)

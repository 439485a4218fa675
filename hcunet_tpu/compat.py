"""``hcat``-compatible facade — the reference's public API, spelled the
reference's way.

A user of wisamreid/HcUnet drives it as::

    from hcat import unet, rcnn, analyze
    from hcat import predict_segmentation_mask, predict_cell_candidates

(``/root/reference/hcat/__init__.py:1-5``).  This module provides the same
names with the same call signatures and the reference's torch array layout
(``[B, C, X, Y(, Z)]`` channels-first), implemented on the TPU-native
engines.  It is a *convenience shim* for migration: new code should use the
first-class APIs (:mod:`hcunet_tpu.infer`, :mod:`hcunet_tpu.models`), which
are channels-last, explicitly configured, and mesh-aware.

Differences that cannot be papered over are documented per function; the
module-level watershed/threshold constants (``hcat/__init__.py:18-30``) are
re-exported under their reference names (including the reference's
``__conectivity__`` spelling) and sourced from :class:`WatershedConfig` so
they cannot drift.
"""

from __future__ import annotations

import zipfile
from typing import Dict, List, Optional

import numpy as np

from hcunet_tpu.config import (
    DetectorConfig,
    PipelineConfig,
    TileConfig,
    UNetConfig,
    WatershedConfig,
)

_WS = WatershedConfig()

# ``hcat/__init__.py:18-30`` — the reference's entire config system, same
# names (and the same ``conectivity`` typo), same values.
__conectivity__ = _WS.connectivity
__compactness__ = _WS.compactness
__expand_mask__ = _WS.expand_mask
__expand_z__ = _WS.expand_z
__z_tolerance__ = _WS.z_tolerance
__mask_prob_threshold__ = _WS.mask_prob_threshold
__cell_prob_threshold__ = _WS.cell_prob_threshold


def _to_channels_last(x: np.ndarray) -> np.ndarray:
    """[B, C, *spatial] (torch) -> [B, *spatial, C] (ours)."""
    return np.moveaxis(np.asarray(x), 1, -1)


def _to_channels_first(x: np.ndarray) -> np.ndarray:
    return np.moveaxis(np.asarray(x), -1, 1)


class unet:
    """Drop-in spelling of ``hcat.unet`` (= ``Unet_Constructor``,
    ``hcat/unet.py:15-123``): same constructor kwargs, torch array layout,
    ``forward``/``save``/``load`` methods.

    Weights live in ``self.variables`` (flax collections) and the compute
    runs the TPU-native :class:`hcunet_tpu.models.unet.UNet`.  ``.cuda()``/
    ``.to()``/``.cpu()`` are accepted no-ops — placement is JAX's job.
    """

    def __init__(
        self,
        image_dimensions: int = 2,
        in_channels: int = 3,
        out_channels: int = 2,
        feature_sizes=(32, 64, 128, 256, 512, 1024),
        kernel=(3, 3),
        upsample_kernel=(2, 2),
        max_pool_kernel=(2, 2),
        upsample_stride=2,
        dilation=1,
        groups=1,
        *,
        seed: int = 0,
    ):
        # the reference accepts each conv param as a value or a
        # {'conv1':…, 'conv2':…} dict (``unet.py:59-64``)
        if isinstance(kernel, dict):
            k1, k2 = tuple(kernel["conv1"]), tuple(kernel["conv2"])
        else:
            k1 = k2 = tuple(kernel)
        if isinstance(dilation, dict):
            dilation = dilation["conv1"]
        if isinstance(groups, dict):
            groups = groups["conv1"]
        if isinstance(upsample_stride, int):
            upsample_stride = (upsample_stride,) * image_dimensions
        cfg = UNetConfig(
            image_dimensions=image_dimensions,
            in_channels=in_channels,
            out_channels=out_channels,
            feature_sizes=tuple(feature_sizes),
            kernel1=k1,
            kernel2=k2,
            upsample_kernel=tuple(upsample_kernel),
            max_pool_kernel=tuple(max_pool_kernel),
            upsample_stride=tuple(upsample_stride),
            dilation=int(dilation),
            groups=int(groups),
        )
        self._build(cfg, seed)
        self._training = False

    def _build(self, cfg: UNetConfig, seed: int = 0, variables=None):
        import jax

        from hcunet_tpu.models.unet import init_unet

        self.config = cfg
        if variables is None:
            self.model, self.variables = init_unet(
                cfg, jax.random.PRNGKey(seed)
            )
        else:
            from hcunet_tpu.models.unet import UNet

            self.model = UNet(cfg)
            self.variables = variables
        self._eval_apply = jax.jit(
            lambda v, t: self.model.apply(v, t, train=False)
        )

    # -- torch-Module surface ------------------------------------------------

    def forward(self, x) -> np.ndarray:
        """``x``: [B, C, X, Y(, Z)] (numpy / jax / cpu torch tensor) →
        numpy of the valid-conv output, same layout.  In ``train()`` mode
        the BatchNorm running stats update, like a torch forward."""
        t = _to_channels_last(x).astype(np.float32)
        if self._training:
            out, upd = self.model.apply(
                self.variables, t, train=True, mutable=["batch_stats"]
            )
            self.variables = {
                "params": self.variables["params"],
                "batch_stats": upd["batch_stats"],
            }
        else:
            out = self._eval_apply(self.variables, t)
        return _to_channels_first(np.asarray(out))

    __call__ = forward

    def train(self, mode: bool = True):
        self._training = bool(mode)
        return self

    def eval(self):
        return self.train(False)

    def to(self, _device=None):
        return self

    cuda = cpu = to

    # -- checkpointing (``unet.py:145-196``) ---------------------------------

    def save(self, filename: str, hyperparameters: Optional[Dict] = None):
        """Checkpoint with config + source snapshot, like the reference's
        ``save`` (``unet.py:145-165``) — written in this framework's zip
        format (msgpack weights; no pickle)."""
        from hcunet_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(filename, self.variables, self.config,
                        hyperparameters=hyperparameters)

    def load(self, filename: str, to_cuda: bool = True):
        """Rebuild the architecture from the stored spec, then restore
        weights — accepts BOTH this framework's checkpoints and actual
        reference ``.unet`` files (``torch.save`` blobs, ported through
        :func:`hcunet_tpu.utils.port_torch.load_reference_unet_file`).
        Returns the stored hyperparameters, like ``unet.py:167-196``."""
        hyper: Optional[Dict] = None
        is_native = False
        try:
            with zipfile.ZipFile(filename) as z:
                is_native = "variables.msgpack" in z.namelist()
        except zipfile.BadZipFile:
            pass
        if is_native:
            from hcunet_tpu.utils.checkpoint import load_checkpoint

            cfg, variables, hyper = load_checkpoint(filename)
        else:
            from hcunet_tpu.utils.port_torch import load_reference_unet_file

            cfg, variables, hyper = load_reference_unet_file(filename)
        self._build(cfg, variables=variables)
        self._training = False
        return hyper


class _CompatRCNN:
    """torchvision-contract detector: ``model(images)`` → list of
    ``{'boxes' [N,4], 'labels' [N], 'scores' [N]}`` with boxes in image
    axes (x = width), exactly what ``hcat/segment.py:192-199`` consumes."""

    def __init__(self, detector, variables):
        import jax

        self.detector = detector
        self.variables = variables
        self._detect = jax.jit(detector.detect)

    def __call__(self, images) -> List[Dict[str, np.ndarray]]:
        arr = np.stack([np.asarray(im, np.float32) for im in images]) \
            if isinstance(images, (list, tuple)) else np.asarray(images, np.float32)
        if arr.ndim != 4:
            raise ValueError(f"expected [B, 3, H, W] images, got {arr.shape}")
        out = self._detect(self.variables, _to_channels_last(arr))
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        labels = np.asarray(out["labels"])
        valid = np.asarray(out["valid"])
        results = []
        for b in range(arr.shape[0]):
            v = valid[b]
            results.append(
                {
                    "boxes": boxes[b][v].astype(np.float32),
                    "labels": labels[b][v].astype(np.int64),
                    "scores": scores[b][v].astype(np.float32),
                }
            )
        return results

    def eval(self):
        return self

    def train(self, mode: bool = True):  # torchvision-detector parity
        if mode:
            raise ValueError(
                "compat rcnn serves inference; use "
                "hcunet_tpu.train.detection_trainer for training"
            )
        return self

    def to(self, _device=None):
        return self

    cuda = cpu = to


def rcnn(path: Optional[str] = None, *, config: Optional[DetectorConfig] = None,
         backbone: str = "resnet50", seed: int = 0, image_hw=(512, 512)):
    """``hcat.rcnn`` (``hcat/rcnn.py:7-21``): build the production detection
    head, optionally restoring a checkpoint.

    ``path`` accepts this framework's detector checkpoints OR a torchvision
    ``fasterrcnn_resnet50_fpn`` ``.pth`` state dict (the reference's format),
    ported via :mod:`hcunet_tpu.utils.port_torchvision`.
    """
    import jax

    from hcunet_tpu.models.detection import Detector

    cfg = config or DetectorConfig()
    det = Detector(cfg, backbone=backbone)
    if path is None:
        variables = det.init(jax.random.PRNGKey(seed), tuple(image_hw))
    else:
        is_native = False
        try:
            with zipfile.ZipFile(path) as z:
                is_native = "variables.msgpack" in z.namelist()
        except zipfile.BadZipFile:
            pass
        if is_native:
            from hcunet_tpu.utils.checkpoint import load_checkpoint

            _cfg, variables, _h = load_checkpoint(path)
        else:
            import torch

            from hcunet_tpu.utils.port_torchvision import (
                detector_variables_from_torchvision,
            )

            sd = torch.load(path, map_location="cpu", weights_only=True)
            variables = detector_variables_from_torchvision(sd)
    return _CompatRCNN(det, variables)


def predict_segmentation_mask(unet_model, image, device=None,
                              use_probability_map: bool = False,
                              mask_cell_prob_threshold: float = 0.5,
                              *, tile_cfg: Optional[TileConfig] = None):
    """``hcat.predict_segmentation_mask`` (``hcat/segment.py:21-136``):
    tiled semantic segmentation of a whole [1, C, X, Y, Z] volume.

    ``device`` is accepted and ignored (JAX owns placement).  Tile geometry
    comes from the HBM auto-tuner instead of the reference's GPU-memory
    lookup table (``segment.py:48-57``) — same role, measured not guessed.
    Returns numpy [1, 1, X, Y, Z]: float32 probabilities when
    ``use_probability_map`` else uint8 {0, 1}.
    """
    import jax

    from hcunet_tpu.config import auto_tile_config
    from hcunet_tpu.infer import tiling

    model, variables, cfg = (
        unet_model.model, unet_model.variables, unet_model.config
    )
    apply_fn = jax.tree_util.Partial(
        lambda v, t: model.apply(v, t, train=False), variables
    )
    vol = _to_channels_last(image).astype(np.float32)
    out = tiling.predict_segmentation_mask(
        apply_fn, vol, cfg, tile_cfg or auto_tile_config(cfg),
        use_probability_map=use_probability_map,
        mask_cell_prob_threshold=mask_cell_prob_threshold,
    )
    return _to_channels_first(np.asarray(out))


def predict_cell_candidates(image, model, candidate_list=None,
                            initial_coords=(0, 0)) -> Dict[str, np.ndarray]:
    """``hcat.predict_cell_candidates`` (``hcat/segment.py:139-218``):
    per-z-plane tiled detection over a [1, C>=3, X, Y, Z] volume, NMS-merged
    into ``candidate_list`` — boxes come back in array axes with per-box
    ``z_level``, the contract the instance stage consumes."""
    from hcunet_tpu.infer import detect
    from hcunet_tpu.infer.candidates import merge_cell_candidates

    vol = _to_channels_last(image).astype(np.float32)[0]  # [X, Y, Z, C]
    new = detect.predict_cell_candidates(
        vol, model.detector, model.variables, initial_coords=initial_coords
    )
    if candidate_list is not None and len(candidate_list.get("scores", [])):
        # reference merge semantics (``utils.py:336-366``): the new boxes
        # were already offset by initial_coords above
        return merge_cell_candidates(candidate_list, new)
    return new


def generate_unique_segmentation_mask_from_probability(
    predicted_semantic_mask: np.ndarray,
    predicted_cell_candidate_list: Dict[str, np.ndarray],
    image=None,
    cell_prob_threshold: float = __cell_prob_threshold__,
    mask_prob_threshold: float = __mask_prob_threshold__,
):
    """``hcat.generate_unique_segmentation_mask_from_probability``
    (``hcat/segment.py:221-505``): detection-seeded instance watershed.
    ``image`` is accepted for signature parity (the reference only uses it
    to size host tiles; tile geometry here comes from host RAM directly).
    Returns ``(unique_mask, seed)``."""
    from hcunet_tpu.infer.instance import generate_unique_segmentation_mask

    sem = np.asarray(predicted_semantic_mask)
    while sem.ndim > 3:  # accept [1, 1, X, Y, Z] / [1, X, Y, Z]
        sem = sem[0]
    cfg = WatershedConfig(
        cell_prob_threshold=cell_prob_threshold,
        mask_prob_threshold=mask_prob_threshold,
    )
    return generate_unique_segmentation_mask(
        np.ascontiguousarray(sem), predicted_cell_candidate_list, cfg
    )


def generate_cell_objects(image, unique_mask, cell_candidates=None,
                          x_ind_chunk: int = 0, y_ind_chunk: int = 0):
    """``hcat.generate_cell_objects`` (``hcat/segment.py:508-560``):
    one :class:`HairCell` per instance label.  ``image`` is the torch-layout
    [B, C, X, Y, Z] chunk; ``cell_candidates`` is accepted for signature
    parity (unused, as in the reference)."""
    from hcunet_tpu.analysis.haircell import generate_cell_objects as _gen

    vol = _to_channels_last(image)[0]  # [X, Y, Z, C]
    return _gen(vol, np.asarray(unique_mask),
                x_ind_chunk=x_ind_chunk, y_ind_chunk=y_ind_chunk)


def analyze(path=None, numchunks: int = 3, save_plots: bool = False,
            show_plots: bool = False, path_chunk_storage: Optional[str] = None,
            *, unet_model: Optional[unet] = None, faster_rcnn=None,
            volume: Optional[np.ndarray] = None,
            tiles: Optional[TileConfig] = None,
            watershed: Optional[WatershedConfig] = None,
            fit_cochlea: bool = True,
            write_all_cells_pkl: bool = True):
    """``hcat.analyze`` (``hcat/main.py:20-236``) with the reference's
    signature and return contract ``(mask, unique_mask, cell_list)`` —
    masks come back ``[1, 1, X, Y, Z]`` like the reference's
    ``reconstruct_mask`` (``hcat/utils.py:279``).

    The reference hard-codes its checkpoint paths (``main.py:57-66``); pass
    the models instead: ``unet_model`` (a :class:`unet`, e.g. after
    ``.load('Aug21_chris.unet')``) and optionally ``faster_rcnn`` (from
    :func:`rcnn`).  ``show_plots`` is accepted and ignored (headless);
    ``save_plots`` writes the size-QA tif like the reference.

    Documented divergence: the returned cell list is ALL cells.  The
    reference returns ``cell_list`` — the *last chunk's* cells only
    (``main.py:156,236``; the full list exists there solely as the
    ``all_cells.pkl`` side effect) — which no caller can want.

    Like the reference (``main.py:219``), the full cell list is pickled to
    ``./all_cells.pkl`` in the current directory — ``loop_main.py:58``
    depends on it for CSV export.  Pass ``write_all_cells_pkl=False`` to
    suppress the side effect.
    """
    import jax

    from hcunet_tpu.config import auto_tile_config
    from hcunet_tpu.infer.pipeline import analyze as _analyze

    if path_chunk_storage is None:
        # the reference raises NotADirectoryError here (``main.py:22-23``)
        raise NotADirectoryError("Specify a path to chunk storage.")
    if unet_model is None:
        raise ValueError(
            "pass unet_model= (the reference hard-codes its checkpoint "
            "path at hcat/main.py:57; this facade takes the model instead)"
        )
    model, variables = unet_model.model, unet_model.variables
    unet_apply = jax.tree_util.Partial(
        lambda v, t: model.apply(v, t, train=False), variables
    )
    det = det_vars = None
    if faster_rcnn is not None:
        det, det_vars = faster_rcnn.detector, faster_rcnn.variables
    res = _analyze(
        path=path, volume=volume, unet_apply=unet_apply, detector=det,
        detector_variables=det_vars,
        cfg=PipelineConfig(
            numchunks=numchunks, unet=unet_model.config,
            tiles=tiles or auto_tile_config(unet_model.config),
            watershed=watershed or WatershedConfig(),
        ),
        work_dir=path_chunk_storage, save_plots=save_plots,
        fit_cochlea=fit_cochlea,
    )
    if write_all_cells_pkl:
        # the reference unconditionally pickles the accumulated cell list
        # to ./all_cells.pkl in the CURRENT directory (``main.py:219``) —
        # the batch driver (``loop_main.py:58-59``) chdirs into the
        # analysis folder first, then reloads this file for CSV export.
        import pickle

        with open("all_cells.pkl", "wb") as f:
            pickle.dump(res.cells, f)
    return (
        np.asarray(res.mask)[None, None],
        np.asarray(res.unique_mask)[None, None],
        res.cells,
    )


__all__ = [
    "unet",
    "rcnn",
    "analyze",
    "predict_segmentation_mask",
    "predict_cell_candidates",
    "generate_unique_segmentation_mask_from_probability",
    "generate_cell_objects",
    "__conectivity__",
    "__compactness__",
    "__expand_mask__",
    "__expand_z__",
    "__z_tolerance__",
    "__mask_prob_threshold__",
    "__cell_prob_threshold__",
]

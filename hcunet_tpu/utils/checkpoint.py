"""Checkpoint save/load with config + source-snapshot archival.

The reference's ``.unet`` files carry the state_dict, the
``model_specification``, hyperparameters, **and a snapshot of every .py
file plus the directory tree** (``hcat/unet.py:145-165``) — a
reproducibility feature worth keeping.  Here a checkpoint is a zip:

    variables.msgpack    flax variables (params + batch_stats)
    config.json          the model's dataclass config (rebuildable)
    hyperparameters.json optional training hyperparameters
    manifest.json        framework version, tree listing
    sources/...          snapshot of the package's .py files

``load_unet`` reconstructs the architecture from config.json before
restoring weights, exactly like the reference's ``load``
(``unet.py:167-196``).
"""

from __future__ import annotations

import glob
import io
import json
import os
import zipfile
from typing import Dict, Optional


import hcunet_tpu
from hcunet_tpu.config import config_from_dict, config_to_dict

CKPT_SOURCES_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def save_checkpoint(
    path: str,
    variables: Dict,
    config,
    hyperparameters: Optional[Dict] = None,
    snapshot_sources: bool = True,
) -> None:
    from flax import serialization

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("variables.msgpack", serialization.to_bytes(variables))
        z.writestr("config.json", json.dumps(config_to_dict(config)))
        z.writestr("hyperparameters.json", json.dumps(hyperparameters or {}))
        tree = sorted(
            os.path.relpath(p, CKPT_SOURCES_ROOT)
            for p in glob.glob(os.path.join(CKPT_SOURCES_ROOT, "**", "*"), recursive=True)
        )
        z.writestr(
            "manifest.json",
            json.dumps({"version": hcunet_tpu.__version__, "tree_structure": tree}),
        )
        if snapshot_sources:
            for p in glob.glob(
                os.path.join(CKPT_SOURCES_ROOT, "**", "*.py"), recursive=True
            ):
                rel = os.path.relpath(p, CKPT_SOURCES_ROOT)
                with open(p, "r") as f:
                    z.writestr(f"sources/{rel}", f.read())


def load_checkpoint(path: str, variables_template: Optional[Dict] = None):
    """Returns ``(config, variables, hyperparameters)``.

    When ``variables_template`` is None the variables come back as the raw
    nested dict (numpy leaves); pass a template pytree (e.g. from
    ``model.init``) to restore with structure checking.
    """
    from flax import serialization

    with zipfile.ZipFile(path, "r") as z:
        config = config_from_dict(json.loads(z.read("config.json")))
        hyper = json.loads(z.read("hyperparameters.json"))
        raw = z.read("variables.msgpack")
    if variables_template is not None:
        variables = serialization.from_bytes(variables_template, raw)
    else:
        variables = serialization.msgpack_restore(raw)
    return config, variables, hyper


def load_unet(path: str):
    """Rebuild the UNet from its stored config and restore weights.

    Returns ``(model, variables, hyperparameters)``.
    """
    from hcunet_tpu.models.unet import UNet

    config, variables, hyper = load_checkpoint(path)
    return UNet(config), variables, hyper


def load_model(path: str):
    """Generic loader: rebuilds the right model family from the stored
    config type (UNet / RecursiveUNet / RDCNet / Detector).

    Returns ``(model, variables, hyperparameters)``.
    """
    from hcunet_tpu import config as C

    cfg, variables, hyper = load_checkpoint(path)
    if isinstance(cfg, C.UNetConfig):
        from hcunet_tpu.models.unet import UNet

        return UNet(cfg), variables, hyper
    if isinstance(cfg, C.RUNetConfig):
        from hcunet_tpu.models.runet import RecursiveUNet

        return RecursiveUNet(cfg), variables, hyper
    if isinstance(cfg, C.RDCNetConfig):
        from hcunet_tpu.models.rdcnet import RDCNet

        return RDCNet(cfg), variables, hyper
    if isinstance(cfg, C.DetectorConfig):
        from hcunet_tpu.models.detection import Detector

        return Detector(cfg), variables, hyper
    raise ValueError(f"no model family for config type {type(cfg).__name__}")

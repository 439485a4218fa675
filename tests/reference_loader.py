"""Load the read-only PyTorch reference modules for parity testing.

The reference's imports pull in torchvision/skimage/GPy etc. which are absent
here; we stub just enough to import the model files.  Used strictly as a
numerical oracle — no reference code is executed outside tests.
"""

import importlib.util
import sys
import types

REFERENCE = "/root/reference"


def _ensure_stub(name, **attrs):
    if name not in sys.modules:
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
    return sys.modules[name]


def load_reference_module(relpath: str, modname: str):
    """Import e.g. ``hcat/unet.py`` from the reference with stubbed deps."""
    hc = _ensure_stub("hcat")
    hc.__path__ = []
    _ensure_stub("hcat.utils", pad_image_with_reflections=lambda *a, **k: None)
    spec = importlib.util.spec_from_file_location(modname, f"{REFERENCE}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_unet_module():
    return load_reference_module("hcat/unet.py", "ref_unet")


def reference_loss_module():
    return load_reference_module("hcat/loss.py", "ref_loss")


def reference_runet_module():
    return load_reference_module("hcat/r_unet.py", "ref_r_unet")

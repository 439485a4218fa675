"""Load the read-only PyTorch reference modules for parity testing.

The reference's imports pull in torchvision/skimage/GPy etc. which are absent
here; we stub just enough to import the model files.  Used strictly as a
numerical oracle — no reference code is executed outside tests.
"""

import contextlib
import importlib.util
import sys
import types

REFERENCE = "/root/reference"


@contextlib.contextmanager
def _reference_hcat_namespace():
    """Temporarily make ``hcat``/``hcat.utils`` resolve to oracle stubs.

    The repo ships a REAL ``hcat`` package (the drop-in alias for the
    facade), so the stubs must not be left in — or found already occupying
    — ``sys.modules``: whichever side imported first would poison the
    other.  The reference model files bind everything at module-exec time
    (top-level imports only), so swapping the namespace just for
    ``exec_module`` and restoring it afterwards is exact.
    """
    saved = {
        k: v for k, v in sys.modules.items()
        if k == "hcat" or k.startswith("hcat.")
    }
    for k in saved:
        del sys.modules[k]
    hc = types.ModuleType("hcat")
    hc.__path__ = []
    utils = types.ModuleType("hcat.utils")
    utils.pad_image_with_reflections = lambda *a, **k: None
    sys.modules["hcat"] = hc
    sys.modules["hcat.utils"] = utils
    try:
        yield
    finally:
        for k in [
            k for k in sys.modules
            if k == "hcat" or k.startswith("hcat.")
        ]:
            del sys.modules[k]
        sys.modules.update(saved)


def load_reference_module(relpath: str, modname: str):
    """Import e.g. ``hcat/unet.py`` from the reference with stubbed deps.

    ``modname`` must not live in the ``hcat`` namespace — the context
    manager below swaps exactly that namespace, and a caller-supplied
    ``hcat.*`` name would be deleted-and-restored mid-exec (advisor r4 #3).
    The registration happens inside the swap and is popped on failure so a
    raising exec never leaves a half-initialized module cached."""
    assert modname != "hcat" and not modname.startswith("hcat."), modname
    spec = importlib.util.spec_from_file_location(modname, f"{REFERENCE}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    with _reference_hcat_namespace():
        sys.modules[modname] = mod
        try:
            spec.loader.exec_module(mod)
        except BaseException:
            sys.modules.pop(modname, None)
            raise
    return mod


def reference_unet_module():
    return load_reference_module("hcat/unet.py", "ref_unet")


def reference_loss_module():
    return load_reference_module("hcat/loss.py", "ref_loss")


def reference_runet_module():
    return load_reference_module("hcat/r_unet.py", "ref_r_unet")

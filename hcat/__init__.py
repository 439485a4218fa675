"""Literal ``hcat`` drop-in package.

The reference is driven as ``from hcat import unet, rcnn, analyze, ...``
(``/root/reference/hcat/__init__.py:1-5``, ``loop_main.py:1-10``).  This
package makes that exact import line work against the TPU-native engines:
the top level is a re-export of :mod:`hcunet_tpu.compat`, which implements
the reference's public names, call signatures, channels-first array layout,
and module-level watershed constants (including the reference's
``__conectivity__`` spelling).

The reference's submodules exist too, with the names its driver scripts
actually import (``hcat.main``, ``hcat.utils``, ``hcat.dataloader``,
``hcat.transforms``, ``hcat.segment``, ``hcat.loss``, ``hcat.mask``,
``hcat.haircell``, ``hcat.unet``, ``hcat.r_unet``, ``hcat.rcnn``,
``hcat.train`` + ``hcat.train.train_utils``, ``hcat.validate``) — so
``from hcat.main import analyze`` / ``from hcat.utils import cells_to_csv``
(``loop_main.py:3-4``) and the train/valscripts import forms resolve.
``tests/test_reference_drivers.py`` executes the reference's own
``loop_main.py`` body against this package.

Installing/importing this package SHADOWS the original ``hcat`` if both are
on ``sys.path`` — that is its purpose (migration without touching caller
code).  The exclusion is also pip-level: installing this distribution and
upstream ``hcat`` into ONE environment corrupts whichever was installed
first (pip does not guard overlapping top-level packages, and uninstalling
either removes the other's files).  Use separate virtualenvs during
migration.  New code should import :mod:`hcunet_tpu` directly: the
first-class APIs are channels-last, explicitly configured, and mesh-aware.
"""

from hcunet_tpu.compat import *  # noqa: F401,F403
from hcunet_tpu.compat import __all__  # noqa: F401

# Import the submodules eagerly, like the reference package does, THEN
# rebind the two names where a submodule and a facade object collide
# (``hcat.unet`` / ``hcat.rcnn`` are the class/factory at the top level,
# exactly as in the reference's ``from hcat import unet, rcnn`` surface;
# ``import hcat.unet`` still resolves the module because it is already in
# ``sys.modules`` — the same ordering the reference relies on).
from hcat import (  # noqa: F401,E402
    dataloader,
    haircell,
    loss,
    main,
    mask,
    r_unet,
    rcnn,
    segment,
    train,
    transforms,
    unet,
    utils,
    validate,
)
from hcunet_tpu.compat import rcnn, unet  # noqa: F401,F811,E402

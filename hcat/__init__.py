"""Literal ``hcat`` drop-in package.

The reference is driven as ``from hcat import unet, rcnn, analyze, ...``
(``/root/reference/hcat/__init__.py:1-5``, ``loop_main.py:1-10``).  This
package makes that exact import line work against the TPU-native engines:
it is a one-line re-export of :mod:`hcunet_tpu.compat`, which implements
the reference's public names, call signatures, channels-first array layout,
and module-level watershed constants (including the reference's
``__conectivity__`` spelling).

Installing/importing this package SHADOWS the original ``hcat`` if both are
on ``sys.path`` — that is its purpose (migration without touching caller
code).  New code should import :mod:`hcunet_tpu` directly: the first-class
APIs are channels-last, explicitly configured, and mesh-aware.
"""

from hcunet_tpu.compat import *  # noqa: F401,F403
from hcunet_tpu.compat import __all__  # noqa: F401

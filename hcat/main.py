"""``hcat.main`` — the reference's pipeline module
(``/root/reference/hcat/main.py``), as imported by the batch driver:
``from hcat.main import analyze`` (``loop_main.py:3``).

:func:`analyze` is the same object as the top-level ``hcat.analyze`` (the
reference re-exports it the same way, ``hcat/__init__.py:5``), including
the ``./all_cells.pkl`` side effect the driver depends on
(``main.py:219``, ``loop_main.py:58``).
"""

from hcunet_tpu.compat import analyze  # noqa: F401

__all__ = ["analyze"]

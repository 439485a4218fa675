"""``hcat.validate`` — QA artifacts
(``/root/reference/hcat/validate/``)."""

from hcat.validate.render_size import render_size  # noqa: F401

__all__ = ["render_size"]

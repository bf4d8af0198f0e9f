"""Stub: skimage is only reached via the reference's mesh-export path."""

from . import measure  # noqa: F401
from . import morphology  # noqa: F401

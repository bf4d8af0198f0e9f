"""Minimal torchvision shim: only transforms.ToTensor, which is all the
reference imports at train time (dataLoader/nvidia.py:475, utils.py:7)."""

from . import transforms  # noqa: F401

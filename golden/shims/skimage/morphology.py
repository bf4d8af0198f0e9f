"""Stub: imported by the reference's dataLoader but never called at train time."""
def binary_dilation(*a, **k):
    raise RuntimeError("skimage stub")

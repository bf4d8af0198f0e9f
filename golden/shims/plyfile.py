"""Stub: plyfile is only reached via the reference's mesh-export path
(utils.py:188-248), which the golden run never calls."""


class _Unavailable:
    def __init__(self, *a, **k):
        raise RuntimeError("plyfile stub: mesh export not supported in golden harness")

    @staticmethod
    def describe(*a, **k):
        raise RuntimeError("plyfile stub: mesh export not supported in golden harness")


PlyData = _Unavailable
PlyElement = _Unavailable

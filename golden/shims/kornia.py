"""Minimal kornia shim: create_meshgrid, the only symbol the reference
imports (dataLoader/ray_utils.py:7).

kornia.utils.create_meshgrid(H, W, normalized_coordinates=True) returns a
[1, H, W, 2] tensor of (x, y) coordinates; when normalized, in [-1, 1]."""

import torch


def create_meshgrid(height, width, normalized_coordinates=True, device=None, dtype=None):
    xs = torch.linspace(0, width - 1, width, device=device, dtype=dtype or torch.float32)
    ys = torch.linspace(0, height - 1, height, device=device, dtype=dtype or torch.float32)
    if normalized_coordinates:
        xs = (xs / (width - 1) - 0.5) * 2.0
        ys = (ys / (height - 1) - 0.5) * 2.0
    grid_y, grid_x = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([grid_x, grid_y], -1).unsqueeze(0)

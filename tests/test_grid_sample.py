"""Kernel tests: plane/line/3D samplers vs torch F.grid_sample semantics
(align_corners=True, padding_mode='zeros'), resize vs F.interpolate."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from rodynrf_tpu.ops import (
    sample_plane,
    sample_line,
    sample_grid3d,
    sample_vm,
    resize_bilinear_align_corners,
    resize_line_align_corners,
)

RNG = np.random.default_rng(0)


def torch_plane_sample(plane_np, xy_np, stride=1):
    plane = torch.from_numpy(plane_np[None])[:, :, ::stride, ::stride]
    grid = torch.from_numpy(xy_np[None, :, None, :])  # [1, N, 1, 2]
    out = F.grid_sample(plane, grid, align_corners=True)  # [1, C, N, 1]
    return out[0, :, :, 0].T.numpy()  # [N, C]


@pytest.mark.parametrize("stride", [1, 2, 4])
@pytest.mark.parametrize("hw", [(17, 23), (64, 64), (5, 5)])
def test_plane_matches_torch(stride, hw):
    H, W = hw
    C = 7
    plane = RNG.standard_normal((C, H, W), dtype=np.float32)
    # coords: in-range, out-of-range, exactly on corners/edges
    xy = np.concatenate(
        [
            RNG.uniform(-1, 1, (200, 2)).astype(np.float32),
            RNG.uniform(-1.8, 1.8, (100, 2)).astype(np.float32),
            np.array([[-1, -1], [1, 1], [-1, 1], [1, -1], [0, 0]], np.float32),
        ]
    )
    ours = np.asarray(sample_plane(jnp.asarray(plane), jnp.asarray(xy), stride=stride))
    ref = torch_plane_sample(plane, xy, stride=stride)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("stride", [1, 2, 4])
def test_line_matches_torch(stride):
    C, L = 5, 33
    line = RNG.standard_normal((C, L), dtype=np.float32)
    z = np.concatenate(
        [RNG.uniform(-1.5, 1.5, 300).astype(np.float32), np.array([-1, 0, 1], np.float32)]
    )
    # torch: texture [1, C, L, 1], grid x=0, y=z
    tex = torch.from_numpy(line[None, :, :, None])[:, :, ::stride, :]
    grid = torch.from_numpy(np.stack([np.zeros_like(z), z], -1)[None, :, None, :])
    ref = F.grid_sample(tex, grid, align_corners=True)[0, :, :, 0].T.numpy()
    ours = np.asarray(sample_line(jnp.asarray(line), jnp.asarray(z), stride=stride))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_grid3d_matches_torch():
    D, H, W, C = 9, 11, 13, 4
    vol = RNG.standard_normal((D, H, W, C), dtype=np.float32)
    xyz = RNG.uniform(-1.4, 1.4, (300, 3)).astype(np.float32)
    # torch: input [1, C, D, H, W], grid [1, N, 1, 1, 3] with (x, y, z)
    tex = torch.from_numpy(vol.transpose(3, 0, 1, 2)[None])
    grid = torch.from_numpy(xyz[None, :, None, None, :])
    ref = F.grid_sample(tex, grid, align_corners=True)[0, :, :, 0, 0].T.numpy()
    ours = np.asarray(sample_grid3d(jnp.asarray(vol), jnp.asarray(xyz)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_sample_vm_matches_torch_composition():
    """sample_vm == concat over strides/axes of torch plane*line products,
    the dynamic field's multiscale layout (tensoRF.py:670-721)."""
    gs = (12, 15, 18)
    n_comp = (6, 3, 3)
    mat_mode = ((0, 1), (0, 2), (1, 2))
    vec_mode = (2, 1, 0)
    planes = [
        RNG.standard_normal((n_comp[i], gs[mat_mode[i][1]], gs[mat_mode[i][0]]), dtype=np.float32)
        for i in range(3)
    ]
    lines = [RNG.standard_normal((n_comp[i], gs[vec_mode[i]]), dtype=np.float32) for i in range(3)]
    xyz = RNG.uniform(-1.2, 1.2, (128, 3)).astype(np.float32)

    ours = np.asarray(
        sample_vm([jnp.asarray(p) for p in planes], [jnp.asarray(l) for l in lines],
                  jnp.asarray(xyz), strides=(1, 2, 4))
    )

    refs = []
    for s in (1, 2, 4):
        for i in range(3):
            m0, m1 = mat_mode[i]
            p = torch_plane_sample(planes[i], xyz[:, (m0, m1)], stride=s)
            tex = torch.from_numpy(lines[i][None, :, :, None])[:, :, ::s, :]
            zz = xyz[:, vec_mode[i]]
            grid = torch.from_numpy(np.stack([np.zeros_like(zz), zz], -1)[None, :, None, :])
            l = F.grid_sample(tex, grid, align_corners=True)[0, :, :, 0].T.numpy()
            refs.append(p * l)
    ref = np.concatenate(refs, -1)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shape", [((9, 13), (21, 30)), ((30, 21), (13, 9)), ((4, 4), (17, 5))])
def test_resize_matches_torch_interpolate(shape):
    (H, W), (H2, W2) = shape
    img = RNG.standard_normal((3, H, W), dtype=np.float32)
    ref = (
        F.interpolate(torch.from_numpy(img[None]), size=(H2, W2), mode="bilinear", align_corners=True)[0]
        .numpy()
    )
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), (H2, W2)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_resize_line_matches_torch():
    line = RNG.standard_normal((5, 16), dtype=np.float32)
    ref = (
        F.interpolate(torch.from_numpy(line[None, :, :, None]), size=(40, 1), mode="bilinear", align_corners=True)[0, :, :, 0]
        .numpy()
    )
    ours = np.asarray(resize_line_align_corners(jnp.asarray(line), 40))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)

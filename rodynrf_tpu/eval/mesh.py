"""Mesh export: dense alpha grid -> isosurface -> PLY.

Functional equivalent of the reference's export path (reference:
train.py:106-118 export_mesh, tensorBase.py:564-589 getDenseAlpha,
utils.py:188-248 convert_sdf_samples_to_ply). The reference depends on
skimage's marching cubes + plyfile; neither is available here, so we ship a
self-contained marching-tetrahedra isosurface extractor and a minimal PLY
writer — same inputs, same output artifact.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import dynamic as dyn
from ..fields.static import feature2density


def dense_alpha(params, cfg, aabb, t_value: float = -1.0, grid_size=None, chunk: int = 65536):
    """Dense alpha volume at one time (reference: tensorBase.py:564-589)."""
    gs = grid_size or cfg.grid_size
    xs = np.linspace(0, 1, gs[0])
    ys = np.linspace(0, 1, gs[1])
    zs = np.linspace(0, 1, gs[2])
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3).astype(np.float32)
    aabb_np = np.asarray(aabb)
    pts = aabb_np[0] * (1 - pts) + aabb_np[1] * pts
    step = cfg.step_size(aabb_np)

    @jax.jit
    def alpha_chunk(p, xyz):
        xyz_n = dyn.normalize_coord(xyz, jnp.asarray(aabb_np))
        t = jnp.full(xyz.shape[0], t_value, jnp.float32)
        xyz_prime = dyn.warp_coordinate(p, xyz, t, jnp.asarray(aabb_np))
        xyz_prime_n = dyn.normalize_coord(xyz_prime, jnp.asarray(aabb_np))
        feat = dyn.density_feature(p, cfg, xyz_n, t, xyz_prime_n)
        sigma = feature2density(feat, cfg)
        return 1.0 - jnp.exp(-sigma * step)

    out = np.zeros(pts.shape[0], np.float32)
    for s in range(0, pts.shape[0], chunk):
        e = min(s + chunk, pts.shape[0])
        block = pts[s:e]
        pad = chunk - block.shape[0]
        if pad:
            block = np.pad(block, ((0, pad), (0, 0)))
        out[s:e] = np.asarray(alpha_chunk(params, jnp.asarray(block)))[: e - s]
    return out.reshape(gs)


# 6-tetrahedra decomposition of a cube (corner indices into the 8-corner cube)
_TETS = np.array(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]]
)
_CUBE = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
)


def marching_tetrahedra(volume: np.ndarray, level: float):
    """Isosurface of a 3D scalar field via marching tetrahedra.

    Returns (vertices [V, 3] in voxel coordinates, faces [F, 3]).
    Vectorized over all cubes; memory ~ O(#cubes * 6).
    """
    nx, ny, nz = volume.shape
    # corner values for every cube: [nx-1, ny-1, nz-1, 8]
    corners = np.stack(
        [
            volume[dx : nx - 1 + dx, dy : ny - 1 + dy, dz : nz - 1 + dz]
            for dx, dy, dz in _CUBE
        ],
        -1,
    )
    base = np.stack(
        np.meshgrid(
            np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1), indexing="ij"
        ),
        -1,
    ).reshape(-1, 3)
    vals = corners.reshape(-1, 8)

    verts_out = []
    for tet in _TETS:
        v = vals[:, tet]  # [N, 4]
        inside = v > level  # [N, 4]
        n_in = inside.sum(-1)
        # canonical tet edges
        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

        def interp(cube_idx, a, b):
            pa = base[cube_idx] + _CUBE[tet[a]]
            pb = base[cube_idx] + _CUBE[tet[b]]
            va = vals[cube_idx, tet[a]]
            vb = vals[cube_idx, tet[b]]
            t = (level - va) / (vb - va + 1e-12)
            return pa + t[:, None] * (pb - pa)

        # case 1 & 3: one corner isolated -> one triangle
        for iso, flip in ((1, False), (3, True)):
            sel = np.where(n_in == iso)[0]
            if len(sel) == 0:
                continue
            ins = inside[sel] if iso == 1 else ~inside[sel]
            corner_id = np.argmax(ins, -1)
            others = np.array([[b for b in range(4) if b != a] for a in range(4)])
            o = others[corner_id]  # [M, 3]
            tri = np.stack(
                [
                    interp(sel, corner_id, o[:, 0]),
                    interp(sel, corner_id, o[:, 1]),
                    interp(sel, corner_id, o[:, 2]),
                ],
                1,
            )
            verts_out.append(tri.reshape(-1, 3))

        # case 2: two-in/two-out -> quad (two triangles)
        sel = np.where(n_in == 2)[0]
        if len(sel):
            ins = inside[sel]
            # indices of the two inside and two outside corners
            idx_sorted = np.argsort(~ins, -1)  # inside first
            a0, a1 = idx_sorted[:, 0], idx_sorted[:, 1]
            b0, b1 = idx_sorted[:, 2], idx_sorted[:, 3]
            p00 = interp(sel, a0, b0)
            p01 = interp(sel, a0, b1)
            p10 = interp(sel, a1, b0)
            p11 = interp(sel, a1, b1)
            tri1 = np.stack([p00, p01, p10], 1).reshape(-1, 3)
            tri2 = np.stack([p01, p11, p10], 1).reshape(-1, 3)
            verts_out.append(tri1)
            verts_out.append(tri2)

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    tri_verts = np.concatenate(verts_out, 0)
    # dedup vertices
    rounded = np.round(tri_verts * 1e4).astype(np.int64)
    uniq, inv = np.unique(rounded, axis=0, return_inverse=True)
    vertices = uniq.astype(np.float64) / 1e4
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    return vertices.astype(np.float32), faces[good]


def write_ply(path: str, vertices: np.ndarray, faces: np.ndarray):
    """Minimal binary-little-endian PLY writer (replaces plyfile)."""
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(vertices)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode())
        vertices.astype("<f4").tofile(f)
        face_rec = np.empty(len(faces), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face_rec["n"] = 3
        face_rec["idx"] = faces
        face_rec.tofile(f)


def convert_alpha_to_ply(alpha: np.ndarray, aabb, path: str, level: float = 0.005):
    """(reference: utils.py:188-248 convert_sdf_samples_to_ply)."""
    verts, faces = marching_tetrahedra(alpha, level)
    aabb = np.asarray(aabb)
    gs = np.asarray(alpha.shape, np.float64) - 1
    world = aabb[0] + verts / gs * (aabb[1] - aabb[0])
    write_ply(path, world.astype(np.float32), faces)
    return world, faces


def export_mesh_from_ckpt(ckpt_path: str, out_path: str, level: float = 0.005):
    from ..train.checkpoints import load_checkpoint

    params, static_cfg, dynamic_cfg, aabb, extra = load_checkpoint(ckpt_path)
    alpha = dense_alpha(params["dynamic"], dynamic_cfg, aabb)
    return convert_alpha_to_ply(alpha, aabb, out_path, level)

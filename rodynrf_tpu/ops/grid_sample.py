"""Bilinear plane/line texture sampling — the hot primitive of the framework.

These replace the reference's `F.grid_sample(..., align_corners=True)` chains
(reference: models/tensoRF.py:140-196 static, 646-811 dynamic multiscale,
models/tensorBase.py:56-73 trilinear alpha lookup) with XLA gather + lerp.

Semantics exactly match PyTorch `grid_sample` with ``align_corners=True`` and
``padding_mode='zeros'``: a coordinate u in [-1, 1] maps to texel index
``(u + 1) / 2 * (N - 1)``; out-of-range corners contribute zero.

TPU-first design notes:
  * Multiscale ("stride s") sampling never materializes strided copies of the
    parameter grids (the reference slices ``plane[:, :, ::2, ::2]`` each call,
    tensoRF.py:588-614). The strided grid's texel i lives at original index
    ``i * s``, so we gather from the *original* array with scaled indices —
    zero extra HBM traffic.
  * Gathers are performed on channel-last layouts so each gather pulls a
    contiguous ``C``-vector per sample (lane-dim friendly).
  * Everything is shape-static and mask-based: no boolean compaction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lerp_weights_1d(u: jnp.ndarray, n_virtual: int):
    """align_corners index math for one axis.

    Returns (i0, i1, w1, inb0, inb1): integer corner indices (clipped into
    range), the upper-corner weight, and in-bounds masks for zero padding.
    """
    g = (u + 1.0) * 0.5 * (n_virtual - 1)
    i0f = jnp.floor(g)
    w1 = g - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = i0 + 1
    inb0 = (i0 >= 0) & (i0 <= n_virtual - 1)
    inb1 = (i1 >= 0) & (i1 <= n_virtual - 1)
    i0c = jnp.clip(i0, 0, n_virtual - 1)
    i1c = jnp.clip(i1, 0, n_virtual - 1)
    return i0c, i1c, w1, inb0, inb1


def _strided_len(n: int, stride: int) -> int:
    return (n + stride - 1) // stride


def sample_plane(
    plane: jnp.ndarray, xy: jnp.ndarray, stride: int = 1, gather_dtype=None
) -> jnp.ndarray:
    """Sample a [C, H, W] plane at xy (N, 2) = (x, y) in [-1, 1] -> (N, C).

    ``x`` indexes the W axis, ``y`` the H axis (torch grid convention).
    ``stride`` samples the virtual grid ``plane[:, ::stride, ::stride]``.
    ``gather_dtype`` (e.g. bfloat16) casts the texture before the gather —
    halves gather traffic / VMEM footprint; interpolation stays f32.
    """
    C, H, W = plane.shape
    Hs, Ws = _strided_len(H, stride), _strided_len(W, stride)
    x0, x1, wx, ibx0, ibx1 = _lerp_weights_1d(xy[:, 0], Ws)
    y0, y1, wy, iby0, iby1 = _lerp_weights_1d(xy[:, 1], Hs)

    if gather_dtype is not None:
        plane = plane.astype(gather_dtype)
    flat = plane.reshape(C, H * W).T  # [H*W, C] channel-last gather
    s = stride

    def corner(yi, xi, ib):
        idx = yi * s * W + xi * s
        # promise_in_bounds: idx clipped in _lerp_weights_1d; the default
        # mode="fill" adds a full masked copy of the gathered block
        vals = flat.at[idx].get(mode="promise_in_bounds").astype(jnp.float32)  # [N, C]
        return vals * ib[:, None]

    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    out = (
        corner(y0, x0, iby0 & ibx0) * w00[:, None]
        + corner(y0, x1, iby0 & ibx1) * w01[:, None]
        + corner(y1, x0, iby1 & ibx0) * w10[:, None]
        + corner(y1, x1, iby1 & ibx1) * w11[:, None]
    )
    return out


def sample_line(line: jnp.ndarray, z: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Sample a [C, L] line at z (N,) in [-1, 1] -> (N, C).

    Equivalent to the reference's grid_sample over a [1, C, L, 1] texture with
    grid x = 0 (always in-bounds), y = z (tensoRF.py:145-149).
    """
    C, L = line.shape
    Ls = _strided_len(L, stride)
    z0, z1, wz, ib0, ib1 = _lerp_weights_1d(z, Ls)
    flat = line.T  # [L, C]
    v0 = flat.at[z0 * stride].get(mode="promise_in_bounds") * ib0[:, None]
    v1 = flat.at[z1 * stride].get(mode="promise_in_bounds") * ib1[:, None]
    return v0 * (1 - wz[:, None]) + v1 * wz[:, None]


# Axis layout shared by all VM fields (reference: tensorBase.py:326-327).
MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)


def sample_vm(planes, lines, xyz: jnp.ndarray, strides=(1,), gather_dtype=None) -> jnp.ndarray:
    """Fused VM (plane ⊙ line) feature sampling.

    planes: list of 3 arrays [C_i, H_i, W_i]; lines: list of 3 arrays [C_i, L_i];
    xyz: (N, 3) normalized coords in [-1, 1].
    Returns (N, sum_i C_i * len(strides)) with channel ordering
    stride-major then axis-major, matching the reference's cat order
    (tensoRF.py:670-721: stride1[ax0,ax1,ax2], stride2[...], stride4[...]).
    """
    feats = []
    for s in strides:
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            p = sample_plane(planes[i], xyz[:, (m0, m1)], stride=s, gather_dtype=gather_dtype)
            l = sample_line(lines[i], xyz[:, v], stride=s)
            feats.append(p * l)
    return jnp.concatenate(feats, axis=-1)


def sample_vm_sum(planes, lines, xyz: jnp.ndarray, gather_dtype=None) -> jnp.ndarray:
    """Σ_axes Σ_channels plane ⊙ line — the static density evaluation
    (reference: tensoRF.py:118-154). Returns (N,)."""
    total = jnp.zeros(xyz.shape[0], xyz.dtype)
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        p = sample_plane(planes[i], xyz[:, (m0, m1)], gather_dtype=gather_dtype)
        l = sample_line(lines[i], xyz[:, v])
        total = total + jnp.sum(p * l, axis=-1)
    return total


def sample_grid3d(vol: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of [D, H, W, C] volume at xyz (N, 3) = (x, y, z) in
    [-1, 1] -> (N, C); x indexes W, y indexes H, z indexes D, align_corners,
    zero padding (reference: tensorBase.py:56-64 AlphaGridMask.sample_alpha)."""
    D, H, W, C = vol.shape
    x0, x1, wx, ibx0, ibx1 = _lerp_weights_1d(xyz[:, 0], W)
    y0, y1, wy, iby0, iby1 = _lerp_weights_1d(xyz[:, 1], H)
    z0, z1, wz, ibz0, ibz1 = _lerp_weights_1d(xyz[:, 2], D)
    flat = vol.reshape(D * H * W, C)

    def corner(zi, yi, xi, ib, w):
        idx = (zi * H + yi) * W + xi
        return flat.at[idx].get(mode="promise_in_bounds") * (ib * w)[:, None]

    out = (
        corner(z0, y0, x0, ibz0 & iby0 & ibx0, (1 - wz) * (1 - wy) * (1 - wx))
        + corner(z0, y0, x1, ibz0 & iby0 & ibx1, (1 - wz) * (1 - wy) * wx)
        + corner(z0, y1, x0, ibz0 & iby1 & ibx0, (1 - wz) * wy * (1 - wx))
        + corner(z0, y1, x1, ibz0 & iby1 & ibx1, (1 - wz) * wy * wx)
        + corner(z1, y0, x0, ibz1 & iby0 & ibx0, wz * (1 - wy) * (1 - wx))
        + corner(z1, y0, x1, ibz1 & iby0 & ibx1, wz * (1 - wy) * wx)
        + corner(z1, y1, x0, ibz1 & iby1 & ibx0, wz * wy * (1 - wx))
        + corner(z1, y1, x1, ibz1 & iby1 & ibx1, wz * wy * wx)
    )
    return out


# ---------------------------------------------------------------------------
# align_corners bilinear resize, for the coarse-to-fine upsample schedule
# (reference: tensoRF.py:198-232 F.interpolate(..., align_corners=True)).
# Implemented as two dense interp-matrix matmuls — MXU-friendly and exact.
# ---------------------------------------------------------------------------

def _interp_matrix(n_out: int, n_in: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n_out, n_in] matrix performing 1D align_corners linear interpolation."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    if n_out == 1:
        m = jnp.zeros((1, n_in), dtype)
        return m.at[0, 0].set(1.0)
    pos = jnp.arange(n_out, dtype=dtype) * (n_in - 1) / (n_out - 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    w = pos - i0
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), dtype)
    m = m.at[rows, i0].add(1.0 - w)
    m = m.at[rows, i0 + 1].add(w)
    return m


def resize_bilinear_align_corners(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Resize [C, H, W] -> [C, H2, W2] with align_corners bilinear."""
    C, H, W = img.shape
    H2, W2 = out_hw
    Mh = _interp_matrix(H2, H, img.dtype)
    Mw = _interp_matrix(W2, W, img.dtype)
    return jnp.einsum("hH,cHW,wW->chw", Mh, img, Mw, precision=jax.lax.Precision.HIGHEST)


def resize_line_align_corners(line: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Resize [C, L] -> [C, L2] with align_corners linear."""
    C, L = line.shape
    Ml = _interp_matrix(out_len, L, line.dtype)
    return jax.lax.dot(line, Ml.T, precision=jax.lax.Precision.HIGHEST)


def vm_axis_sum(plane, line, xy, z, strides=(1,)) -> jnp.ndarray:
    """Σ_strides Σ_c bilerp(plane)⊙lerp(line) for one VM axis -> [N].

    (Helper composition of the XLA sampler; formerly ops/pallas_vm.py —
    the round-1 Pallas sampler study whose findings now live in PERF.md.)"""
    total = 0.0
    for s in strides:
        p = sample_plane(plane, xy, stride=s)
        l = sample_line(line, z, stride=s)
        total = total + jnp.sum(p * l, axis=-1)
    return total


def sample_vm_sum_fused(planes, lines, xyz: jnp.ndarray, strides=(1,)) -> jnp.ndarray:
    """Multiscale Σ-product over all 3 VM axes -> [N]."""
    total = jnp.zeros(xyz.shape[0], xyz.dtype)
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        total = total + vm_axis_sum(planes[i], lines[i], xyz[:, (m0, m1)], xyz[:, v], strides)
    return total

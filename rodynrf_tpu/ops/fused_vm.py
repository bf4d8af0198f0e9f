"""Fused VM sampling: the TPU-native rewrite of the hot gather path.

Replaces the per-(grid, orientation, stride, corner) `jnp.take` chains of
`ops/grid_sample.sample_vm` (reference semantics: F.grid_sample chains in
models/tensoRF.py:118-196, 543-811) with a formulation chosen from measured
TPU behavior (scripts/gather_variants.py, scripts/perf_tpu.py):

  * XLA's TPU row-gather is INDEX-RATE bound (~90-370 M idx/s), with row
    bytes nearly free up to ~1 KB. So the only thing that matters is the
    NUMBER of gathered rows — pack everything possible into each row.
  * Therefore each table row carries all four bilinear corners x the
    channels of EVERY grid sharing the sample coordinates (density,
    blending, appearance are always sampled at the same warped xyz:
    tensoRF.py:646-811). One gathered row = 4 corners x sum(C_g) channels.
    This cuts gathered rows per dynamic field eval from 108N to 9N.
  * 1-D line factors never gather at all: align_corners linear
    interpolation with zero padding is exactly a hat-kernel weight matrix,
    so line features are an [N, L] x [L, C] matmul — MXU work, with the
    weight generation fused into the dot by XLA (measured ~free).

Corner packing uses a one-texel zero halo so out-of-bounds corners read
exact zeros instead of needing per-corner masks: table row (y, x) holds
[P(y,x), P(y,x+1), P(y+1,x), P(y+1,x+1)] over the zero-padded plane, and a
single per-sample `valid` factor handles fully-out-of-range queries. The
arithmetic (value * mask * weight ordering, f32 accumulation, stride-s
virtual grids) is numerically equivalent to `sample_vm` (<=1e-6, asserted by
tests/test_fused_vm.py; the hat-matrix line matmul under Precision.HIGHEST
may differ from scalar f32 FMA in the last ulp on TPU).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .coalesced import planes_sample
from .grid_sample import MAT_MODE, VEC_MODE, _strided_len

Grid = Tuple[Sequence[jnp.ndarray], Sequence[jnp.ndarray]]  # (planes, lines)


def _pack_plane_corners(plane: jnp.ndarray, stride: int, dtype) -> jnp.ndarray:
    """[C, H, W] plane -> corner-packed strided table [(Hs+1)*(Ws+1), 4*C].

    Row (y, x) of the table holds the four bilinear corners of virtual texel
    (y, x): [P(y,x) | P(y,x+1) | P(y+1,x) | P(y+1,x+1)], with P read from the
    stride-s virtual grid and zero outside it. Rows are indexed with a +1
    halo offset so corner (y0 = -1) queries (partial zero-padding coverage,
    torch grid_sample semantics) resolve to correct rows.
    """
    if stride != 1:
        plane = plane[:, ::stride, ::stride]
    if dtype is not None:
        plane = plane.astype(dtype)
    C, Hs, Ws = plane.shape
    z = jnp.pad(plane, ((0, 0), (1, 1), (1, 1)))  # zero halo
    # rows (y, x) for y in [-1, Hs-1], x in [-1, Ws-1]  (halo-shifted)
    c00 = z[:, :-1, :-1]
    c01 = z[:, :-1, 1:]
    c10 = z[:, 1:, :-1]
    c11 = z[:, 1:, 1:]
    packed = jnp.concatenate([c00, c01, c10, c11], axis=0)  # [4C, Hs+1, Ws+1]
    return packed.reshape(4 * C, (Hs + 1) * (Ws + 1)).T  # [(Hs+1)(Ws+1), 4C]


def _pack_line(lines: Sequence[jnp.ndarray], stride: int) -> jnp.ndarray:
    """Concat per-grid [C_g, L] lines -> strided [Ls, sum C_g] (channel-last)."""
    cat = jnp.concatenate(lines, axis=0)
    if stride != 1:
        cat = cat[:, ::stride]
    return cat.T


class PackedVM:
    """Per-orientation corner-packed plane tables + line tables.

    Pytree: children are the device arrays (tables, line_tables); the static
    layout metadata (row offsets, virtual dims, channel splits) is aux data
    so jit treats it as compile-time constant.
    """

    def __init__(self, tables, line_tables, meta):
        self.tables = tables            # [o] -> [R_o, 4*Cp_o]
        self.line_tables = line_tables  # [o][si] -> [Ls, Cp_o]
        self.meta = meta                # dict of static layout info

    def tree_flatten(self):
        return (self.tables, self.line_tables), _HashableMeta(self.meta)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux.meta)


class _HashableMeta:
    def __init__(self, meta):
        self.meta = meta
        self._key = repr(meta)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HashableMeta) and self._key == other._key


jax.tree_util.register_pytree_node(
    PackedVM, PackedVM.tree_flatten, PackedVM.tree_unflatten
)


def pack_vm(grids: Sequence[Grid], strides: Sequence[int] = (1,), gather_dtype=None) -> PackedVM:
    """Build the fused tables for one or more VM grids sampled at shared xyz.

    grids: list of (planes, lines) where planes[i] is [C_g_i, H_i, W_i] and
    lines[i] is [C_g_i, L_i] in MAT_MODE/VEC_MODE orientation order.
    All grids must share spatial resolutions (they do: density/blending/app
    are init'd from one grid_size, tensoRF.py:277-344).
    """
    strides = tuple(strides)
    tables, line_tables = [], []
    dims, line_dims, row_offsets, c_splits = [], [], [], []
    for o in range(3):
        planes_o = [g[0][o] for g in grids]
        lines_o = [g[1][o] for g in grids]
        c_splits.append(tuple(int(p.shape[0]) for p in planes_o))
        H, W = planes_o[0].shape[1], planes_o[0].shape[2]
        L = lines_o[0].shape[1]
        segs, offs, dd, ld, lt = [], [], [], [], []
        off = 0
        for s in strides:
            Hs, Ws = _strided_len(H, s), _strided_len(W, s)
            Ls = _strided_len(L, s)
            # concat grid channels FIRST so the packed row layout is
            # [c00(Cp) | c01(Cp) | c10(Cp) | c11(Cp)] (corner-major)
            cat = _pack_plane_corners(
                jnp.concatenate(planes_o, axis=0), s, gather_dtype
            )  # [(Hs+1)(Ws+1), 4*Cp]
            segs.append(cat)
            offs.append(off)
            off += cat.shape[0]
            dd.append((Hs, Ws))
            ld.append(Ls)
            lt.append(_pack_line(lines_o, s))
        tables.append(jnp.concatenate(segs, axis=0))
        line_tables.append(lt)
        dims.append(tuple(dd))
        line_dims.append(tuple(ld))
        row_offsets.append(tuple(offs))
    meta = {
        "strides": strides,
        "dims": tuple(dims),
        "line_dims": tuple(line_dims),
        "row_offsets": tuple(row_offsets),
        "c_splits": tuple(c_splits),
        "n_grids": len(grids),
    }
    return PackedVM(tables, line_tables, meta)


def _axis_lerp(u: jnp.ndarray, n: int):
    """align_corners index math for one axis (matches grid_sample._lerp_weights_1d).

    Returns (i0 in [-1, n-1] clipped, w1, valid) where valid covers the
    partial zero-padding band; out-of-band queries are zeroed via `valid`.
    """
    g = (u + 1.0) * 0.5 * (n - 1)
    i0f = jnp.floor(g)
    w1 = g - i0f
    i0 = i0f.astype(jnp.int32)
    valid = (i0 >= -1) & (i0 <= n - 1)
    return jnp.clip(i0, -1, n - 1), w1, valid


def _line_feats(table: jnp.ndarray, u: jnp.ndarray, Ls: int) -> jnp.ndarray:
    """Hat-weight interp matmul: [Ls, C] table sampled at u [N] -> [N, C].

    Exactly align_corners linear interpolation with zero padding: the hat
    weight clip(1 - |l - g|, 0, 1) reproduces the two lerp corner weights
    including the partial edge bands. Runs on the MXU; HIGHEST precision
    keeps f32 parity with the gather-based path.
    """
    g = (u + 1.0) * 0.5 * (Ls - 1)
    l_pos = jnp.arange(Ls, dtype=jnp.float32)
    wmat = jnp.clip(1.0 - jnp.abs(l_pos[None, :] - g[:, None]), 0.0, 1.0)
    return jax.lax.dot(
        wmat, table.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
    )


def sample_vm_fused(packed: PackedVM, xyz: jnp.ndarray) -> List[jnp.ndarray]:
    """Sample every grid of `packed` at xyz [N, 3] (normalized [-1,1]).

    Returns one [N, sum_o C_g_o * n_strides] array per grid with channel
    ordering identical to `sample_vm` (stride-major, then orientation,
    reference cat order tensoRF.py:670-721).
    """
    meta = packed.meta
    strides = meta["strides"]
    nS = len(strides)
    N = xyz.shape[0]
    n_grids = meta["n_grids"]
    per_grid = [[None] * (nS * 3) for _ in range(n_grids)]

    for o in range(3):
        m0, m1 = MAT_MODE[o]
        v = VEC_MODE[o]
        x_u, y_u, z_u = xyz[:, m0], xyz[:, m1], xyz[:, v]
        Cp = sum(meta["c_splits"][o])
        idx_list, w_list = [], []
        for si in range(nS):
            Hs, Ws = meta["dims"][o][si]
            x0, wx, vx = _axis_lerp(x_u, Ws)
            y0, wy, vy = _axis_lerp(y_u, Hs)
            rows = (y0 + 1) * (Ws + 1) + (x0 + 1) + meta["row_offsets"][o][si]
            idx_list.append(rows)
            valid = (vx & vy).astype(jnp.float32)
            w_list.append(
                jnp.stack(
                    [
                        (1 - wy) * (1 - wx) * valid,
                        (1 - wy) * wx * valid,
                        wy * (1 - wx) * valid,
                        wy * wx * valid,
                    ]
                )  # [4, N]
            )
        # One combined take amortizes per-gather overhead (train-step shapes);
        # above ~2M rows the [nS*N, 4*Cp] intermediate dominates HBM (a chunk-
        # 8192 eval render would materialize >20 GB), so large batches take
        # per-stride instead — the gathered values and all arithmetic are
        # identical either way. Sampling + corner weighting go through the
        # coalesced-gradient custom VJP (ops/coalesced.py): identical forward
        # math, sort+matmul backward instead of XLA scatter.
        if nS * N <= 1_500_000:
            rows_cat = jnp.concatenate(idx_list)
            w4_cat = jnp.concatenate([w.T for w in w_list])  # [nS*N, 4]
            feats = planes_sample(packed.tables[o], rows_cat, w4_cat)
            stride_feats = [feats[si * N : (si + 1) * N] for si in range(nS)]
        else:
            stride_feats = [
                planes_sample(packed.tables[o], idx_list[si], w_list[si].T)
                for si in range(nS)
            ]
        for si in range(nS):
            line = _line_feats(
                packed.line_tables[o][si], z_u, meta["line_dims"][o][si]
            )
            prod = stride_feats[si] * line  # [N, Cp]
            c0 = 0
            for gi, cg in enumerate(meta["c_splits"][o]):
                per_grid[gi][si * 3 + o] = prod[:, c0 : c0 + cg]
                c0 += cg

    return [jnp.concatenate(chunks, axis=-1) for chunks in per_grid]


def sample_vm_sum_fused_static(packed: PackedVM, xyz: jnp.ndarray) -> jnp.ndarray:
    """Σ_axes Σ_channels plane⊙line for a single-grid pack (static density,
    reference tensoRF.py:118-154). Returns [N]."""
    feats = sample_vm_fused(packed, xyz)[0]
    # feats channel order is (stride, axis)-major; summing all channels
    # reproduces sample_vm_sum's Σ_axes Σ_c exactly (addition over the same
    # f32 values).
    meta = packed.meta
    nS = len(meta["strides"])
    assert nS == 1
    # match sample_vm_sum's order: per-axis jnp.sum then sequential adds
    c_sizes = [meta["c_splits"][o][0] for o in range(3)]
    total = jnp.zeros(xyz.shape[0], xyz.dtype)
    c0 = 0
    for o in range(3):
        total = total + jnp.sum(feats[:, c0 : c0 + c_sizes[o]], axis=-1)
        c0 += c_sizes[o]
    return total

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

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coalesced import merged_sample, planes_sample
from .grid_sample import MAT_MODE, VEC_MODE, _strided_len

# "auto" layout picks the merged-stride pack when the merged tables fit this
# byte budget (per PackedVM), else the per-stride pack. The limit admits the
# bf16 300³ steady state (~0.95 GB) and rejects the f32 one (~1.9 GB): the
# merged layout's stored gather activations scale with the table dtype, and
# the f32 300³ train step measured 18.4 GB > 15.75 GB HBM. See pack_vm.
MERGED_BYTES_LIMIT = 1_200_000_000

# Eval-mode budget: the render path keeps NO gathered-activation residuals
# (no backward), so the only HBM cost of the merged layout is the tables
# themselves. 6 GB admits the bf16 640^3-class converged grids (~3.4 GB)
# and the f32 300^3 grids (~1.5 GB) on a 16 GB chip while still rejecting
# f32 640^3-class (~6.9 GB tables + raw grids + chunk activations).
EVAL_MERGED_BYTES_LIMIT = 6_000_000_000

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


def _pack_line(lines: Sequence[jnp.ndarray], stride: int, dtype=None) -> jnp.ndarray:
    """Concat per-grid [C_g, L] lines -> strided [Ls, sum C_g] (channel-last)."""
    cat = jnp.concatenate(lines, axis=0)
    if stride != 1:
        cat = cat[:, ::stride]
    if dtype is not None:
        cat = cat.astype(dtype)
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


# ---------------------------------------------------------------------------
# merged-stride row maps (static, exact-rational breakpoint walk)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _axis_seg_maps(n: int, strides: tuple):
    """Static per-axis merge maps for multiscale align_corners sampling.

    All strided grids along one axis are sampled at the same normalized u;
    each stride's cell index i_s = clip(floor((u+1)/2*(n_s-1)), -1, n_s-1)
    is a monotone step function of u. Their SUM  seg = Σ_s (i_s + 1)  is
    therefore monotone and identifies the joint cell combination uniquely
    (double breakpoints skip seg values — those rows are simply unreachable).
    This lets one gathered row serve every stride at once (ops/fused_vm.py
    merged layout): 3x fewer gather/scatter indices than per-stride tables.

    Returns (maps, starts, counts):
      maps[s]   int32 [L] — halo-shifted index (i_s + 1) ∈ [0, n_s] per seg
      starts[s] int32 [n_s + 1] — first seg with maps[s] == h (contiguous)
      counts[s] int32 [n_s + 1] — number of segs with maps[s] == h
    computed with exact rational breakpoints (no float ties).
    """
    from fractions import Fraction

    ns = [_strided_len(n, s) for s in strides]
    cur = [0 if h == 1 else -1 for h in ns]
    events = []
    for si, h in enumerate(ns):
        if h > 1:
            for k in range(h):
                events.append((Fraction(k, h - 1), si))
    events.sort()
    seg0 = sum(c + 1 for c in cur)  # value of seg before the first event
    states = [tuple(cur)] * (seg0 + 1)  # unreachable lead-in + initial state
    for _, si in events:
        cur[si] += 1
        states.append(tuple(cur))
    maps, starts, counts = [], [], []
    for si, h in enumerate(ns):
        m = np.array([st[si] + 1 for st in states], np.int32)
        maps.append(m)
        hh = np.arange(h + 2, dtype=np.int32)
        left = np.searchsorted(m, hh[:-1], side="left").astype(np.int32)
        right = np.searchsorted(m, hh[:-1], side="right").astype(np.int32)
        starts.append(left)
        counts.append(right - left)
    return tuple(maps), tuple(starts), tuple(counts)


def merged_table_bytes(grids, strides, gather_dtype) -> int:
    """Estimated total bytes of the merged-layout tables for `grids`."""
    itemsize = 2 if gather_dtype == jnp.bfloat16 else 4
    total = 0
    for o in range(3):
        planes_o = [g[0][o] for g in grids]
        Cp = sum(int(p.shape[0]) for p in planes_o)
        H, W = planes_o[0].shape[1], planes_o[0].shape[2]
        Ly = len(_axis_seg_maps(H, tuple(strides))[0][0])
        Lx = len(_axis_seg_maps(W, tuple(strides))[0][0])
        total += Ly * Lx * len(strides) * 4 * Cp * itemsize
    return total


class _HashableStatic:
    """Hashable wrapper for static numpy index metadata (custom_vjp nondiff
    args must hash; large arrays hash by content bytes)."""

    def __init__(self, value):
        self.value = value
        leaves = jax.tree_util.tree_leaves(value)
        self._key = tuple(
            leaf.tobytes() if isinstance(leaf, np.ndarray) else leaf
            for leaf in leaves
        )

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HashableStatic) and self._key == other._key


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def merge_strided_tables(tables: Tuple[jnp.ndarray, ...], static) -> jnp.ndarray:
    """Gather per-stride corner tables into one merged table.

    tables[s]: [(H_s+1)(W_s+1), 4C] corner-packed stride-s table.
    static: _HashableStatic of (maps, y_reduce, x_reduce) — maps[s] is
    (ymap, xmap, Wp) with the SMALL per-axis seg→index arrays (the flat
    [Ly*Lx] row indices are computed on device as an outer product so the
    HLO never embeds multi-MB literal constants — they made the train step
    uncompilable); y_reduce/x_reduce are ((starts, counts, L), ...).

    Forward: static-index takes. Backward: exact bounded-width take-sums per
    axis (the reverse map is separable and contiguous) — no scatter.
    """
    maps, _, _ = static.value
    out = []
    for t, (ymap, xmap, wp) in zip(tables, maps):
        rows = (jnp.asarray(ymap)[:, None] * wp + jnp.asarray(xmap)[None, :]).reshape(-1)
        out.append(t.at[rows].get(mode="promise_in_bounds"))
    return jnp.concatenate(out, axis=1)


def _merge_fwd(tables, static):
    return merge_strided_tables(tables, static), None


def _bounded_axis_sum(ct3, starts, counts):
    """out[h] = Σ_{j<counts[h]} ct3[starts[h]+j]  (exact, static indices).

    ct3: [L, ...]; starts/counts: np.int32 [Hp]. Returns [Hp, ...]."""
    L = ct3.shape[0]
    wmax = int(counts.max()) if counts.size else 0
    out = jnp.zeros((len(starts),) + ct3.shape[1:], ct3.dtype)
    for j in range(wmax):
        sel = np.minimum(starts + j, L - 1)
        mask = (j < counts)
        contrib = ct3.at[jnp.asarray(sel)].get(mode="promise_in_bounds")
        mshape = (len(starts),) + (1,) * (ct3.ndim - 1)
        out = out + jnp.where(jnp.asarray(mask).reshape(mshape), contrib, 0.0)
    return out


def _merge_bwd(static, _, ct):
    rows, y_reduce, x_reduce = static.value
    nS = len(rows)
    C4 = ct.shape[1] // nS
    grads = []
    for si in range(nS):
        ys, yc, Ly = y_reduce[si]
        xs, xc, Lx = x_reduce[si]
        ct3 = ct[:, si * C4 : (si + 1) * C4].reshape(Ly, Lx, C4)
        red_y = _bounded_axis_sum(ct3, np.asarray(ys), np.asarray(yc))
        red_yx = _bounded_axis_sum(
            jnp.swapaxes(red_y, 0, 1), np.asarray(xs), np.asarray(xc)
        )
        grads.append(
            jnp.swapaxes(red_yx, 0, 1).reshape(-1, C4)
        )
    return (tuple(grads),)


merge_strided_tables.defvjp(_merge_fwd, _merge_bwd)


def pack_vm(
    grids: Sequence[Grid],
    strides: Sequence[int] = (1,),
    gather_dtype=None,
    layout: str = "auto",
    grad_impl: str = "autodiff",
    merged_bytes_limit: int = MERGED_BYTES_LIMIT,
) -> PackedVM:
    """Build the fused tables for one or more VM grids sampled at shared xyz.

    grids: list of (planes, lines) where planes[i] is [C_g_i, H_i, W_i] and
    lines[i] is [C_g_i, L_i] in MAT_MODE/VEC_MODE orientation order.
    All grids must share spatial resolutions (they do: density/blending/app
    are init'd from one grid_size, tensoRF.py:277-344).

    layout:
      'strided' — one corner-packed table per stride (concatenated rows);
                  3 gathered rows per sample per orientation at 3 strides.
      'merged'  — one row per joint multiscale cell (see _axis_seg_maps):
                  1 gathered row per sample per orientation, 3x wider.
                  ~2.3x more table HBM; backward scatters 3x fewer indices.
      'auto'    — 'merged' when len(strides)>1 and the merged tables fit
                  MERGED_BYTES_LIMIT, else 'strided'.
    """
    strides = tuple(strides)
    if layout == "auto":
        layout = (
            "merged"
            if len(strides) > 1
            and merged_table_bytes(grids, strides, gather_dtype) <= merged_bytes_limit
            else "strided"
        )
    if layout == "merged":
        return _pack_vm_merged(grids, strides, gather_dtype, grad_impl)
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
            lt.append(_pack_line(lines_o, s, gather_dtype))
        tables.append(jnp.concatenate(segs, axis=0))
        line_tables.append(lt)
        dims.append(tuple(dd))
        line_dims.append(tuple(ld))
        row_offsets.append(tuple(offs))
    meta = {
        "layout": "strided",
        "grad_impl": grad_impl,
        "strides": strides,
        "dims": tuple(dims),
        "line_dims": tuple(line_dims),
        "row_offsets": tuple(row_offsets),
        "c_splits": tuple(c_splits),
        "n_grids": len(grids),
    }
    return PackedVM(tables, line_tables, meta)


def _pack_vm_merged(
    grids: Sequence[Grid], strides, gather_dtype, grad_impl: str = "autodiff"
) -> PackedVM:
    """Merged-stride layout: one row per joint multiscale cell.

    Row channels: [stride₁: c00|c01|c10|c11 | stride₂: ... | stride₄: ...],
    each corner block Cp = Σ_g C_g wide — same per-stride corner values as
    the strided layout (bit-identical features; tests/test_fused_vm.py)."""
    tables, line_tables = [], []
    dims, line_dims, c_splits, seg_dims = [], [], [], []
    for o in range(3):
        planes_o = [g[0][o] for g in grids]
        lines_o = [g[1][o] for g in grids]
        c_splits.append(tuple(int(p.shape[0]) for p in planes_o))
        H, W = planes_o[0].shape[1], planes_o[0].shape[2]
        ymaps, ystarts, ycounts = _axis_seg_maps(H, strides)
        xmaps, xstarts, xcounts = _axis_seg_maps(W, strides)
        Ly, Lx = len(ymaps[0]), len(xmaps[0])
        cat_planes = jnp.concatenate(planes_o, axis=0)
        per_stride, rows_static, y_red, x_red = [], [], [], []
        dd, ld, lt = [], [], []
        for si, s in enumerate(strides):
            Hs, Ws = _strided_len(H, s), _strided_len(W, s)
            per_stride.append(_pack_plane_corners(cat_planes, s, gather_dtype))
            rows_static.append((ymaps[si], xmaps[si], Ws + 1))
            y_red.append((ystarts[si], ycounts[si], Ly))
            x_red.append((xstarts[si], xcounts[si], Lx))
            dd.append((Hs, Ws))
            ld.append(_strided_len(lines_o[0].shape[1], s))
            lt.append(_pack_line(lines_o, s, gather_dtype))
        static = _HashableStatic(
            (tuple(rows_static), tuple(y_red), tuple(x_red))
        )
        tables.append(merge_strided_tables(tuple(per_stride), static))
        line_tables.append(lt)
        dims.append(tuple(dd))
        line_dims.append(tuple(ld))
        seg_dims.append((Ly, Lx))
    meta = {
        "layout": "merged",
        "grad_impl": grad_impl,
        "strides": tuple(strides),
        "dims": tuple(dims),
        "line_dims": tuple(line_dims),
        "seg_dims": tuple(seg_dims),
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
    including the partial edge bands. Runs on the MXU.

    f32 tables use HIGHEST precision for parity with the gather-based path
    (<=1e-6). bf16 tables run the dot natively in bf16 with f32 accumulation
    — the hat weights round to bf16 (~0.4% relative), consistent with the
    quantization the bf16 tables already carry, at full MXU rate instead of
    the multi-pass f32 emulation.
    """
    g = (u + 1.0) * 0.5 * (Ls - 1)
    l_pos = jnp.arange(Ls, dtype=jnp.float32)
    wmat = jnp.clip(1.0 - jnp.abs(l_pos[None, :] - g[:, None]), 0.0, 1.0)
    if table.dtype == jnp.bfloat16:
        return jax.lax.dot(
            wmat.astype(jnp.bfloat16), table,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
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

    if meta.get("layout") == "merged":
        return _sample_vm_fused_merged(packed, xyz)

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
        impl = meta.get("grad_impl", "autodiff")
        impl = "auto" if impl == "autodiff" else impl
        if nS * N <= 1_500_000:
            rows_cat = jnp.concatenate(idx_list)
            w4_cat = jnp.concatenate([w.T for w in w_list])  # [nS*N, 4]
            feats = planes_sample(packed.tables[o], rows_cat, w4_cat, impl)
            stride_feats = [feats[si * N : (si + 1) * N] for si in range(nS)]
        else:
            stride_feats = [
                planes_sample(packed.tables[o], idx_list[si], w_list[si].T, impl)
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


def _sample_vm_fused_merged(packed: PackedVM, xyz: jnp.ndarray) -> List[jnp.ndarray]:
    """Merged-layout sampling: ONE gathered row per sample per orientation.

    Row channel layout [stride: corner: Cp]; per-stride features are computed
    with the same corner-weight products and add order as the strided path —
    bit-identical outputs (asserted by tests/test_fused_vm.py)."""
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
        Ly, Lx = meta["seg_dims"][o]

        seg_y = jnp.zeros((N,), jnp.int32)
        seg_x = jnp.zeros((N,), jnp.int32)
        w_strides = []
        for si in range(nS):
            Hs, Ws = meta["dims"][o][si]
            x0, wx, vx = _axis_lerp(x_u, Ws)
            y0, wy, vy = _axis_lerp(y_u, Hs)
            seg_x = seg_x + x0 + 1
            seg_y = seg_y + y0 + 1
            valid = (vx & vy).astype(jnp.float32)
            w_strides.append(
                [
                    (1 - wy) * (1 - wx) * valid,
                    (1 - wy) * wx * valid,
                    wy * (1 - wx) * valid,
                    wy * wx * valid,
                ]
            )
        rows = seg_y * Lx + seg_x
        grad_impl = meta.get("grad_impl", "autodiff")
        if grad_impl != "autodiff":
            # custom-VJP route: identical forward FMA order (bit-exact,
            # tests/test_coalesced.py), backward table-grad picked by
            # grad_impl ('csum' gather-only vs 'xla' scatter)
            w12 = jnp.stack(
                [jnp.stack(w_strides[si], axis=-1) for si in range(nS)], axis=1
            )  # [N, nS, 4]
            feats_all = merged_sample(packed.tables[o], rows, w12, grad_impl)
            stride_feats = [feats_all[:, si] for si in range(nS)]
        else:
            # keep the gathered block in table dtype; the f32 upcast happens
            # per-slice inside the weighting FMA (XLA fuses it — no
            # [N, nS*4*Cp] f32 materialization, which costs ~8 ms/eval at the
            # 300³ shapes). promise_in_bounds: rows are in range by
            # construction (_axis_lerp clips + halo rows); jnp.take's default
            # mode='fill' adds a select_n MASKED COPY of the whole gathered
            # block — measured as the largest HLO temp of the train step
            # (2.77 GB at 300^3 f32) and a full extra pass over the block
            vals = packed.tables[o].at[rows].get(mode="promise_in_bounds").reshape(N, nS, 4, Cp)
            stride_feats = [
                (
                    vals[:, si, 0].astype(jnp.float32) * w_strides[si][0][:, None]
                    + vals[:, si, 1].astype(jnp.float32) * w_strides[si][1][:, None]
                    + vals[:, si, 2].astype(jnp.float32) * w_strides[si][2][:, None]
                    + vals[:, si, 3].astype(jnp.float32) * w_strides[si][3][:, None]
                )
                for si in range(nS)
            ]
        for si in range(nS):
            line = _line_feats(
                packed.line_tables[o][si], z_u, meta["line_dims"][o][si]
            )
            prod = stride_feats[si] * line
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

#!/usr/bin/env python
"""Backward decomposition probes at the merged-layout dynamic-eval shapes.

The 300³ bf16 step is 467 ms = 152 ms forward + ~315 ms backward
(/tmp/abl.log); the backward's composition at the *merged* layout was never
measured (probe_r3.py stopped at the strided grad). Sections:

  fwd    — one fused eval forward, merged bf16
  grad1  — value+grad of one eval (table gradients)
  grad6  — value+grad of a 6-eval sum at six different xyz (the step's real
           dynamic backward: cotangents accumulate into one merged table)
  merge  — merge_strided_tables backward alone (runs once per step)
  scat   — one wide XLA scatter at the merged backward shape

Usage: python scripts/probe_bwd.py [section ...]   (default: all)
Honest value-forced timing (chain_time).
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from probe_r3 import chain_time  # noqa: E402

from rodynrf_tpu.fields.static import init_vm  # noqa: E402
from rodynrf_tpu.ops.fused_vm import (  # noqa: E402
    _axis_seg_maps,
    merge_strided_tables,
    pack_vm,
    sample_vm_fused,
)

GS = (331, 368, 220)
N = 276480


def _grids():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return [
        init_vm(ks[0], [16, 4, 4], GS),
        init_vm(ks[1], [16, 4, 4], GS),
        init_vm(ks[2], [48, 12, 12], GS),
    ]


def _xyz(seed, n=N):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3), jnp.float32, -0.99, 0.99)


def _packed(grids):
    return jax.tree_util.tree_map(
        jnp.asarray,
        pack_vm(grids, strides=(1, 2, 4), gather_dtype=jnp.bfloat16, layout="merged"),
    )


def probe_fwd(res):
    pk = _packed(_grids())
    xyz = _xyz(3)

    def full(c, pk):
        outs = sample_vm_fused(pk, xyz + c * 1e-30)
        return c + sum(jnp.sum(o[::4096].astype(jnp.float32)) for o in outs)

    res["fwd_merged_ms"] = round(chain_time(full, (pk,)) * 1e3, 2)
    print("fwd_merged", res["fwd_merged_ms"], flush=True)


def probe_grad1(res):
    grids = _grids()
    xyz = _xyz(3)

    def loss(gr, xy):
        pk = _packed(gr)
        outs = sample_vm_fused(pk, xy)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs) * 1e-6

    vg = jax.value_and_grad(loss)

    def f(c, gr):
        v, g = vg(gr, xyz + c * 1e-30)
        return c + v + sum(jnp.sum(t[::512].astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    res["grad1_ms"] = round(chain_time(f, (grids,)) * 1e3, 2)
    print("grad1", res["grad1_ms"], flush=True)


def probe_grad6(res):
    grids = _grids()
    xyzs = [_xyz(10 + i) for i in range(6)]

    def loss(gr, xys):
        pk = _packed(gr)
        tot = 0.0
        for xy in xys:
            outs = sample_vm_fused(pk, xy)
            tot = tot + sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs) * 1e-6
        return tot

    vg = jax.value_and_grad(loss)

    def f(c, gr):
        v, g = vg(gr, [x + c * 1e-30 for x in xyzs])
        return c + v + sum(jnp.sum(t[::512].astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    res["grad6_ms"] = round(chain_time(f, (grids,), n_lo=2, n_hi=6) * 1e3, 2)
    print("grad6", res["grad6_ms"], flush=True)


def probe_merge(res):
    """merge_strided_tables backward alone at the o=0 shape."""
    grids = _grids()
    # rebuild the per-stride inputs the merge consumes for o=0
    from rodynrf_tpu.ops.fused_vm import _pack_plane_corners, _HashableStatic
    from rodynrf_tpu.ops.grid_sample import _strided_len

    o = 0
    planes_o = [g[0][o] for g in grids]
    H, W = planes_o[0].shape[1], planes_o[0].shape[2]
    strides = (1, 2, 4)
    ymaps, ystarts, ycounts = _axis_seg_maps(H, strides)
    xmaps, xstarts, xcounts = _axis_seg_maps(W, strides)
    Ly, Lx = len(ymaps[0]), len(xmaps[0])
    cat = jnp.concatenate(planes_o, axis=0)
    per_stride, rows_static, y_red, x_red = [], [], [], []
    for si, s in enumerate(strides):
        Ws = _strided_len(W, s)
        per_stride.append(_pack_plane_corners(cat, s, jnp.bfloat16))
        rows_static.append((ymaps[si], xmaps[si], Ws + 1))
        y_red.append((ystarts[si], ycounts[si], Ly))
        x_red.append((xstarts[si], xcounts[si], Lx))
    static = _HashableStatic((tuple(rows_static), tuple(y_red), tuple(x_red)))
    ct = jax.random.normal(jax.random.PRNGKey(9), (Ly * Lx, 3 * 4 * 80), jnp.bfloat16)

    def loss(ts):
        m = merge_strided_tables(ts, static)
        return jnp.sum((m * ct).astype(jnp.float32)) * 1e-9

    g = jax.grad(loss)

    def f(c, ts):
        gs = g(tuple(t + c.astype(t.dtype) * 0 for t in ts))
        return c + sum(jnp.sum(t[::512].astype(jnp.float32)) for t in gs)

    res["merge_bwd_o0_ms"] = round(chain_time(f, (tuple(per_stride),)) * 1e3, 2)
    print("merge_bwd_o0", res["merge_bwd_o0_ms"], flush=True)


def probe_scat(res):
    """Wide scatter at the merged backward shape (o=0): N rows x 960 ch."""
    strides = (1, 2, 4)
    ymaps, _, _ = _axis_seg_maps(GS[1], strides)  # H for o=0 is gs[1]? use probe shape
    xmaps, _, _ = _axis_seg_maps(GS[0], strides)
    Ly, Lx = len(ymaps[0]), len(xmaps[0])
    R = Ly * Lx
    rows = jax.random.randint(jax.random.PRNGKey(11), (N,), 0, R, jnp.int32)
    for C, dt, lab in ((960, jnp.bfloat16, "bf16_960"), (960, jnp.float32, "f32_960")):
        upd = jax.random.normal(jax.random.PRNGKey(12), (N, C), dt)

        def f(c, upd, rows):
            i = rows + (c * 1e-30).astype(jnp.int32)
            return c + jnp.sum(
                jnp.zeros((R, C), dt).at[i].add(upd)[::512].astype(jnp.float32)
            )

        ms = round(chain_time(f, (upd, rows)) * 1e3, 2)
        res[f"scatter_{lab}_ms"] = ms
        print(f"scatter_{lab}", ms, f"({round(N/ms/1e3,1)} Midx/s)", flush=True)


def probe_epiv(res):
    """Corner-weighting formulation variants (XLA): the measured epilogue is
    ~10x its HBM roofline — hunt a formulation XLA lowers efficiently.

    All compute out[n, s, c] = sum_k vals[n, s, k, c] * w[n, s, k] (* line)
    for nS=3, 4 corners, Cp channels."""
    nS = 3
    out = {}
    for C, lab in ((80, "o0"), (128, "o0pad128")):
        vals = jax.random.normal(jax.random.PRNGKey(21), (N, nS * 4 * C), jnp.bfloat16)
        w = [
            [jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(22), 4 * s + c), (N,))
             for c in range(4)]
            for s in range(nS)
        ]
        line = jax.random.normal(jax.random.PRNGKey(23), (N, nS * C), jnp.float32)

        def v_4d(c, vals, line, *wf):
            ws = [[wf[4 * s + k] for k in range(4)] for s in range(nS)]
            v4 = (vals + c.astype(vals.dtype) * 0).reshape(N, nS, 4, C)
            tot = c
            for s in range(nS):
                pf = (
                    v4[:, s, 0].astype(jnp.float32) * ws[s][0][:, None]
                    + v4[:, s, 1].astype(jnp.float32) * ws[s][1][:, None]
                    + v4[:, s, 2].astype(jnp.float32) * ws[s][2][:, None]
                    + v4[:, s, 3].astype(jnp.float32) * ws[s][3][:, None]
                )
                tot = tot + jnp.sum((pf * line[:, s * C : (s + 1) * C])[::4096])
            return tot

        def v_2d(c, vals, line, *wf):
            ws = [[wf[4 * s + k] for k in range(4)] for s in range(nS)]
            v = vals + c.astype(vals.dtype) * 0
            tot = c
            for s in range(nS):
                pf = None
                for k in range(4):
                    sl = v[:, (4 * s + k) * C : (4 * s + k + 1) * C].astype(jnp.float32)
                    term = sl * ws[s][k][:, None]
                    pf = term if pf is None else pf + term
                tot = tot + jnp.sum((pf * line[:, s * C : (s + 1) * C])[::4096])
            return tot

        def v_einsum(c, vals, line, *wf):
            w4 = jnp.stack([jnp.stack([wf[4 * s + k] for k in range(4)], -1)
                            for s in range(nS)], 1)  # [N, nS, 4]
            v4 = (vals + c.astype(vals.dtype) * 0).reshape(N, nS, 4, C).astype(jnp.float32)
            pf = jnp.einsum("nskc,nsk->nsc", v4, w4)
            pf = pf * line.reshape(N, nS, C)
            return c + jnp.sum(pf[::4096])

        def v_bf16(c, vals, line, *wf):
            ws = [[wf[4 * s + k] for k in range(4)] for s in range(nS)]
            v = vals + c.astype(vals.dtype) * 0
            tot = c
            for s in range(nS):
                pf = None
                for k in range(4):
                    sl = v[:, (4 * s + k) * C : (4 * s + k + 1) * C]
                    term = (sl * ws[s][k].astype(jnp.bfloat16)[:, None]).astype(jnp.float32)
                    pf = term if pf is None else pf + term
                tot = tot + jnp.sum((pf * line[:, s * C : (s + 1) * C])[::4096])
            return tot

        wf = [w[s][k] for s in range(nS) for k in range(4)]
        for nm, fn in (("4d", v_4d), ("2d", v_2d), ("einsum", v_einsum), ("bf16w", v_bf16)):
            ms = round(chain_time(fn, tuple([vals, line] + wf)) * 1e3, 2)
            out[f"{lab}_{nm}"] = ms
            print(f"epiv_{lab}_{nm}", ms, flush=True)
    res["epiv"] = out


def main():
    secs = sys.argv[1:] or ["fwd", "grad1", "grad6", "merge", "scat"]
    print(jax.devices()[0], flush=True)
    res = {}
    for s in secs:
        print("SECTION", s, flush=True)
        globals()[f"probe_{s}"](res)
    out = os.path.join(HERE, "probe_bwd.json")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()

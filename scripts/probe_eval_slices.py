#!/usr/bin/env python
"""Fused-eval internal decomposition (round 4): where do 19.2 ms go?

probe_bwd measured one full merged dynamic eval forward at 19.2 ms / 276k
samples while the bare merged take runs ~10 ms — ~9 ms of line-feature and
index/weight arithmetic is unhidden. Slices measured here, all at the
300^3 o-shapes (grid 331x368x220, strides (1,2,4), bf16 tables):

  take_epi   — plane take + corner-weight epilogue only (precomputed rows/w)
  idx        — _axis_lerp index/weight math alone (all 3 orientations)
  line_mat   — hat-matrix line features as shipped (_line_feats, MXU dot)
  line_take  — line features via 2-corner gather + lerp (alternative)
  full       — sample_vm_fused end to end (cross-check vs probe_bwd 19.2)

Writes scripts/probe_eval_slices.json. Run on the TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

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
    _axis_lerp,
    _line_feats,
    pack_vm,
    sample_vm_fused,
)
from rodynrf_tpu.ops.grid_sample import MAT_MODE, VEC_MODE  # noqa: E402

GS = (331, 368, 220)
N = 276480
OUT = os.path.join(HERE, "probe_eval_slices.json")


def _grids():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return [
        init_vm(ks[0], [16, 4, 4], GS),
        init_vm(ks[1], [16, 4, 4], GS),
        init_vm(ks[2], [48, 12, 12], GS),
    ]


def main():
    res = {"device": str(jax.devices()[0]), "N": N}
    grids = _grids()
    pk = jax.tree_util.tree_map(
        jnp.asarray,
        pack_vm(grids, strides=(1, 2, 4), gather_dtype=jnp.bfloat16, layout="merged"),
    )
    meta = pk.meta
    xyz = jax.random.uniform(jax.random.PRNGKey(3), (N, 3), jnp.float32, -0.99, 0.99)

    which = set(sys.argv[1:]) or {"full", "take_epi", "idx", "line_mat", "line_take"}

    # ---- full eval cross-check
    if "full" in which:
        def f_full(c, pk, xyz):
            outs = sample_vm_fused(pk, xyz + c * 1e-30)
            return c + sum(jnp.sum(o[::4096].astype(jnp.float32)) for o in outs)

        res["full_ms"] = round(chain_time(f_full, (pk, xyz)) * 1e3, 2)
        print("full", res["full_ms"], flush=True)
        _save(res)

    # ---- precompute rows/w for all 3 orientations (host side of the probe)
    strides = meta["strides"]
    nS = len(strides)
    rows_all, w_all, zu_all = [], [], []
    for o in range(3):
        m0, m1 = MAT_MODE[o]
        x_u, y_u, z_u = xyz[:, m0], xyz[:, m1], xyz[:, VEC_MODE[o]]
        Ly, Lx = meta["seg_dims"][o]
        seg_y = jnp.zeros((N,), jnp.int32)
        seg_x = jnp.zeros((N,), jnp.int32)
        ws = []
        for si in range(nS):
            Hs, Ws = meta["dims"][o][si]
            x0, wx, vx = _axis_lerp(x_u, Ws)
            y0, wy, vy = _axis_lerp(y_u, Hs)
            seg_x = seg_x + x0 + 1
            seg_y = seg_y + y0 + 1
            valid = (vx & vy).astype(jnp.float32)
            ws.append(jnp.stack(
                [(1 - wy) * (1 - wx) * valid, (1 - wy) * wx * valid,
                 wy * (1 - wx) * valid, wy * wx * valid], axis=-1))
        rows_all.append(seg_y * Lx + seg_x)
        w_all.append(jnp.stack(ws, axis=1))  # [N, nS, 4]
        zu_all.append(z_u)

    if "take_epi" in which:
        def f_take(c, tables, rows_all, w_all):
            tot = c
            for o in range(3):
                Cp = tables[o].shape[1] // (nS * 4)
                r = rows_all[o] + (c * 1e-30).astype(jnp.int32)
                vals = tables[o].at[r].get(mode="promise_in_bounds").reshape(N, nS, 4, Cp)
                for si in range(nS):
                    pf = sum(
                        vals[:, si, k].astype(jnp.float32) * w_all[o][:, si, k, None]
                        for k in range(4)
                    )
                    tot = tot + jnp.sum(pf[::4096])
            return tot

        res["take_epi_ms"] = round(
            chain_time(f_take, (list(pk.tables), rows_all, w_all)) * 1e3, 2)
        print("take_epi", res["take_epi_ms"], flush=True)
        _save(res)

    if "idx" in which:
        def f_idx(c, xyz):
            xyzc = xyz + c * 1e-30
            tot = c
            for o in range(3):
                m0, m1 = MAT_MODE[o]
                x_u, y_u = xyzc[:, m0], xyzc[:, m1]
                Ly, Lx = meta["seg_dims"][o]
                seg_y = jnp.zeros((N,), jnp.int32)
                seg_x = jnp.zeros((N,), jnp.int32)
                for si in range(nS):
                    Hs, Ws = meta["dims"][o][si]
                    x0, wx, vx = _axis_lerp(x_u, Ws)
                    y0, wy, vy = _axis_lerp(y_u, Hs)
                    seg_x = seg_x + x0 + 1
                    seg_y = seg_y + y0 + 1
                    valid = (vx & vy).astype(jnp.float32)
                    tot = tot + jnp.sum(((1 - wy) * wx * valid)[::4096])
                tot = tot + jnp.sum((seg_y * Lx + seg_x)[::4096].astype(jnp.float32))
            return tot

        res["idx_ms"] = round(chain_time(f_idx, (xyz,)) * 1e3, 2)
        print("idx", res["idx_ms"], flush=True)
        _save(res)

    if "line_mat" in which:
        def f_lmat(c, line_tables, zu_all):
            tot = c
            for o in range(3):
                for si in range(nS):
                    lf = _line_feats(
                        line_tables[o][si], zu_all[o] + c * 1e-30,
                        meta["line_dims"][o][si],
                    )
                    tot = tot + jnp.sum(lf[::4096])
            return tot

        res["line_mat_ms"] = round(
            chain_time(f_lmat, ([list(ts) for ts in pk.line_tables], zu_all)) * 1e3, 2)
        print("line_mat", res["line_mat_ms"], flush=True)
        _save(res)

    if "line_take" in which:
        def f_ltake(c, line_tables, zu_all):
            tot = c
            for o in range(3):
                for si in range(nS):
                    Ls = meta["line_dims"][o][si]
                    g = (zu_all[o] + c * 1e-30 + 1.0) * 0.5 * (Ls - 1)
                    i0f = jnp.floor(g)
                    w1 = (g - i0f)[:, None]
                    i0 = jnp.clip(i0f.astype(jnp.int32), 0, Ls - 2)
                    tb = line_tables[o][si]
                    v0 = tb.at[i0].get(mode="promise_in_bounds").astype(jnp.float32)
                    v1 = tb.at[i0 + 1].get(mode="promise_in_bounds").astype(jnp.float32)
                    lf = v0 * (1 - w1) + v1 * w1
                    tot = tot + jnp.sum(lf[::4096])
            return tot

        res["line_take_ms"] = round(
            chain_time(f_ltake, ([list(ts) for ts in pk.line_tables], zu_all)) * 1e3, 2)
        print("line_take", res["line_take_ms"], flush=True)
        _save(res)


def _save(res):
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()

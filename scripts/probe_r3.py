#!/usr/bin/env python
"""Round-3 primitive probes: measure the building blocks of the planned
sorted-segsum backward and the fused-eval forward decomposition.

Value-forced chained timing throughout (PERF.md §0).

Usage: python scripts/probe_r3.py [section ...]
sections: sort take scatter fwd   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def chain_time(step, args, n_lo=3, n_hi=13):
    def runner(n):
        @jax.jit
        def f(c0, *a):
            c, _ = jax.lax.scan(lambda c, _: (step(c, *a), None), c0, None, length=n)
            return c

        float(jnp.sum(f(jnp.float32(0), *args)))
        t0 = time.perf_counter()
        float(jnp.sum(f(jnp.float32(0), *args)))
        return time.perf_counter() - t0

    lo, hi = runner(n_lo), runner(n_hi)
    return (hi - lo) / (n_hi - n_lo)


def _ray_rows(n_rays, S, H, W, strides=(1, 2, 4), seed=0):
    """Realistic keys: monotone per-ray walks across strided plane tables."""
    key = jax.random.PRNGKey(seed)
    p0 = jax.random.uniform(key, (n_rays, 2), jnp.float32, 0, 1)
    p1 = jax.random.uniform(jax.random.fold_in(key, 1), (n_rays, 2), jnp.float32, 0, 1)
    t = jnp.linspace(0, 1, S)
    pts = p0[:, None, :] + (p1 - p0)[:, None, :] * t[None, :, None]
    parts, off = [], 0
    for s in strides:
        Hs, Ws = (H - 1) // s + 1, (W - 1) // s + 1
        xs = (pts[..., 0] * (Ws - 1)).astype(jnp.int32).reshape(-1)
        ys = (pts[..., 1] * (Hs - 1)).astype(jnp.int32).reshape(-1)
        parts.append(ys * (Ws + 1) + xs + off)
        off += (Hs + 1) * (Ws + 1)
    return jnp.concatenate(parts), off  # [len(strides)*n_rays*S], R


def probe_sort(res):
    out = {}
    for n_rays in (1024, 4096, 7 * 1024):
        rows, R = _ray_rows(n_rays, 270, 368, 331)
        N = rows.shape[0]
        iota = jnp.arange(N, dtype=jnp.int32)

        def f_sort(c, rows):
            k = rows + (c * 1e-30).astype(jnp.int32)
            ks, perm = jax.lax.sort_key_val(k, iota)
            return c + jnp.float32(ks[0] + perm[-1])

        out[f"sort_N{N}"] = {
            "ms": round(chain_time(f_sort, (rows,)) * 1e3, 2),
            "N": int(N),
        }
        print(json.dumps(out[f"sort_N{N}"]), flush=True)
    res["sort"] = out


def probe_take(res):
    """Permutation-gather rate for narrow rows (the sorted re-order step)."""
    out = {}
    for n_rays, ch, dt in ((1024, 84, jnp.float32), (1024, 84, jnp.bfloat16),
                           (7 * 1024, 84, jnp.bfloat16), (1024, 336, jnp.bfloat16)):
        rows, R = _ray_rows(n_rays, 270, 368, 331)
        N = rows.shape[0]
        perm = jax.lax.sort_key_val(rows, jnp.arange(N, dtype=jnp.int32))[1]
        vals = jax.random.normal(jax.random.PRNGKey(2), (N, ch), dt)

        def f(c, vals, perm):
            p = perm + (c * 1e-30).astype(jnp.int32)
            return c + jnp.sum(jnp.take(vals, p, axis=0).astype(jnp.float32))

        ms = chain_time(f, (vals, perm)) * 1e3
        k = f"perm_take_N{N}_C{ch}_{dt.__name__}"
        out[k] = {"ms": round(ms, 2), "Midx_s": round(N / ms / 1e3, 1)}
        print(k, json.dumps(out[k]), flush=True)
    res["take"] = out


def probe_scatter(res):
    """XLA scatter: size scaling, instance batching, dropped indices, unique."""
    out = {}
    H, W = 368, 331
    for n_rays in (1024, 7 * 1024):
        rows, R = _ray_rows(n_rays, 270, H, W)
        N = rows.shape[0]
        upd = jax.random.normal(jax.random.PRNGKey(3), (N, 320), jnp.bfloat16)

        def f(c, upd, rows):
            i = rows + (c * 1e-30).astype(jnp.int32)
            return c + jnp.sum(
                jnp.zeros((R, 320), jnp.bfloat16).at[i].add(upd).astype(jnp.float32)
            )

        ms = chain_time(f, (upd, rows)) * 1e3
        out[f"scatter_N{N}"] = {"ms": round(ms, 2), "Midx_s": round(N / ms / 1e3, 1)}
        print(json.dumps(out[f"scatter_N{N}"]), flush=True)

    # dropped indices: all out-of-bounds — is drop cheap?
    rows, R = _ray_rows(1024, 270, H, W)
    N = rows.shape[0]
    upd = jax.random.normal(jax.random.PRNGKey(3), (N, 320), jnp.bfloat16)
    oob = jnp.full((N,), R + 5, jnp.int32)

    def f_drop(c, upd, oob):
        i = oob + (c * 1e-30).astype(jnp.int32)
        return c + jnp.sum(
            jnp.zeros((R, 320), jnp.bfloat16).at[i].add(upd, mode="drop").astype(jnp.float32)
        )

    out["scatter_all_dropped"] = {"ms": round(chain_time(f_drop, (upd, oob)) * 1e3, 2)}
    print(json.dumps(out["scatter_all_dropped"]), flush=True)

    # unique_indices promise on a (partial) permutation
    perm = jax.random.permutation(jax.random.PRNGKey(4), R).astype(jnp.int32)
    upd = upd[: R]

    def f_uni(c, upd, perm):
        i = perm + (c * 1e-30).astype(jnp.int32)
        return c + jnp.sum(
            jnp.zeros((R, 320), jnp.bfloat16)
            .at[i]
            .add(upd, unique_indices=True)
            .astype(jnp.float32)
        )

    out["scatter_unique_promise"] = {"ms": round(chain_time(f_uni, (upd, perm)) * 1e3, 2)}
    print(json.dumps(out["scatter_unique_promise"]), flush=True)

    # sorted + unique (the post-coalesce final combine shape): U<=R unique rows
    su = jnp.unique(np.asarray(rows))  # host-side ok for a probe
    U = su.shape[0]
    upd_u = jax.random.normal(jax.random.PRNGKey(5), (U, 320), jnp.bfloat16)
    su = jnp.asarray(su, jnp.int32)

    def f_su(c, upd_u, su):
        i = su + (c * 1e-30).astype(jnp.int32)
        return c + jnp.sum(
            jnp.zeros((R, 320), jnp.bfloat16)
            .at[i]
            .add(upd_u, unique_indices=True, indices_are_sorted=True)
            .astype(jnp.float32)
        )

    out["scatter_sorted_unique"] = {
        "ms": round(chain_time(f_su, (upd_u, su)) * 1e3, 2),
        "U": int(U),
        "dup_factor": round(N / U, 2),
    }
    print(json.dumps(out["scatter_sorted_unique"]), flush=True)
    res["scatter"] = out


def probe_kernel(res):
    """Pallas sorted-coalesce vs XLA scatter at real backward shapes."""
    from rodynrf_tpu.ops.coalesced import _coalesce_pallas, _coalesce_xla

    out = {}
    for n_rays, C, lab in ((1024, 80, "o0"), (1024, 20, "o1"), (7 * 1024, 80, "o0x7")):
        rows, R = _ray_rows(n_rays, 270, 368, 331)
        N = rows.shape[0]
        w4 = jax.random.uniform(jax.random.PRNGKey(5), (N, 4), jnp.float32)
        ct = jax.random.normal(jax.random.PRNGKey(6), (N, C), jnp.bfloat16)

        def f_pal(c, rows, w4, ct):
            i = rows + (c * 1e-30).astype(jnp.int32)
            return c + jnp.sum(_coalesce_pallas(i, w4, ct, R)[::64, ::8])

        def f_xla(c, rows, w4, ct):
            i = rows + (c * 1e-30).astype(jnp.int32)
            return c + jnp.sum(_coalesce_xla(i, w4, ct, R)[::64, ::8])

        k = f"coalesce_{lab}_N{N}_C{C}"
        out[k] = {
            "pallas_ms": round(chain_time(f_pal, (rows, w4, ct)) * 1e3, 2),
            "xla_scatter_ms": round(chain_time(f_xla, (rows, w4, ct)) * 1e3, 2),
        }
        print(k, json.dumps(out[k]), flush=True)
    res["kernel"] = out


def probe_fwd(res):
    """Fused-eval forward decomposition at the real dynamic-eval shapes."""
    from rodynrf_tpu.fields.static import init_vm
    from rodynrf_tpu.ops.fused_vm import pack_vm, _axis_lerp, _line_feats
    from rodynrf_tpu.ops.grid_sample import MAT_MODE, VEC_MODE

    gs = (331, 368, 220)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    grids = [
        init_vm(ks[0], [16, 4, 4], gs),
        init_vm(ks[1], [16, 4, 4], gs),
        init_vm(ks[2], [48, 12, 12], gs),
    ]
    N = 276480
    xyz = jax.random.uniform(ks[3], (N, 3), jnp.float32, -0.99, 0.99)
    packed = jax.tree_util.tree_map(
        jnp.asarray,
        pack_vm(grids, strides=(1, 2, 4), gather_dtype=jnp.bfloat16, layout="strided"),
    )
    meta = packed.meta
    nS = 3

    def idx_weights(c, packed):
        tot = c
        for o in range(3):
            m0, m1 = MAT_MODE[o]
            x_u, y_u = xyz[:, m0] + c * 1e-30, xyz[:, m1]
            for si in range(nS):
                Hs, Ws = meta["dims"][o][si]
                x0, wx, vx = _axis_lerp(x_u, Ws)
                y0, wy, vy = _axis_lerp(y_u, Hs)
                rows = (y0 + 1) * (Ws + 1) + (x0 + 1) + meta["row_offsets"][o][si]
                tot = tot + jnp.float32(rows[0]) + wx[0] + wy[0] + jnp.float32(vx[0] & vy[0])
        return tot

    res_fwd = {"idx_weights_ms": round(chain_time(idx_weights, (packed,)) * 1e3, 2)}
    print(json.dumps(res_fwd), flush=True)

    def takes_only(c, packed):
        tot = c
        for o in range(3):
            m0, m1 = MAT_MODE[o]
            x_u, y_u = xyz[:, m0] + c * 1e-30, xyz[:, m1]
            idx_list = []
            for si in range(nS):
                Hs, Ws = meta["dims"][o][si]
                x0, wx, vx = _axis_lerp(x_u, Ws)
                y0, wy, vy = _axis_lerp(y_u, Hs)
                idx_list.append((y0 + 1) * (Ws + 1) + (x0 + 1) + meta["row_offsets"][o][si])
            vals = jnp.take(packed.tables[o], jnp.concatenate(idx_list), axis=0)
            tot = tot + jnp.sum(vals[::4096].astype(jnp.float32))
        return tot

    res_fwd["take_ms"] = round(chain_time(takes_only, (packed,)) * 1e3, 2)
    print("take", res_fwd["take_ms"], flush=True)

    def take_weight(c, packed):
        tot = c
        for o in range(3):
            m0, m1 = MAT_MODE[o]
            x_u, y_u = xyz[:, m0] + c * 1e-30, xyz[:, m1]
            Cp = sum(meta["c_splits"][o])
            idx_list, w_list = [], []
            for si in range(nS):
                Hs, Ws = meta["dims"][o][si]
                x0, wx, vx = _axis_lerp(x_u, Ws)
                y0, wy, vy = _axis_lerp(y_u, Hs)
                idx_list.append((y0 + 1) * (Ws + 1) + (x0 + 1) + meta["row_offsets"][o][si])
                valid = (vx & vy).astype(jnp.float32)
                w_list.append(jnp.stack([
                    (1 - wy) * (1 - wx) * valid, (1 - wy) * wx * valid,
                    wy * (1 - wx) * valid, wy * wx * valid]))
            vals = jnp.take(packed.tables[o], jnp.concatenate(idx_list), axis=0)
            vals = vals.astype(jnp.float32).reshape(nS, N, 4, Cp)
            w = jnp.stack(w_list)
            pf = (vals[:, :, 0] * w[:, 0, :, None] + vals[:, :, 1] * w[:, 1, :, None]
                  + vals[:, :, 2] * w[:, 2, :, None] + vals[:, :, 3] * w[:, 3, :, None])
            tot = tot + jnp.sum(pf[:, ::4096])
        return tot

    res_fwd["take_weight_ms"] = round(chain_time(take_weight, (packed,)) * 1e3, 2)
    print("take+weight", res_fwd["take_weight_ms"], flush=True)

    def lines_only(c, packed):
        tot = c
        for o in range(3):
            v = VEC_MODE[o]
            z_u = xyz[:, v] + c * 1e-30
            for si in range(nS):
                lf = _line_feats(packed.line_tables[o][si], z_u, meta["line_dims"][o][si])
                tot = tot + jnp.sum(lf[::4096])
        return tot

    res_fwd["lines_ms"] = round(chain_time(lines_only, (packed,)) * 1e3, 2)
    print("lines", res_fwd["lines_ms"], flush=True)

    from rodynrf_tpu.ops.fused_vm import sample_vm_fused

    for lab, layout, dt in (
        ("strided_bf16", "strided", jnp.bfloat16),
        ("merged_bf16", "merged", jnp.bfloat16),
        ("merged_f32", "merged", None),
    ):
        pk = jax.tree_util.tree_map(
            jnp.asarray, pack_vm(grids, strides=(1, 2, 4), gather_dtype=dt, layout=layout)
        )

        def full(c, pk):
            outs = sample_vm_fused(pk, xyz + c * 1e-30)
            return c + sum(jnp.sum(o[::512]) for o in outs)

        res_fwd[f"full_eval_{lab}_ms"] = round(chain_time(full, (pk,)) * 1e3, 2)
        print("full_eval", lab, res_fwd[f"full_eval_{lab}_ms"], flush=True)

        def full_grad(c, pk):
            def loss(pk_, xyz_):
                outs = sample_vm_fused(pk_, xyz_)
                return sum(jnp.sum(o) for o in outs)

            g = jax.grad(loss, argnums=(0, 1))(pk, xyz + c * 1e-30)
            leaves = jax.tree_util.tree_leaves(g)
            return c + sum(jnp.sum(l[::512].astype(jnp.float32)) for l in leaves if l.ndim)

        res_fwd[f"full_grad_{lab}_ms"] = round(chain_time(full_grad, (pk,)) * 1e3, 2)
        print("full_grad", lab, res_fwd[f"full_grad_{lab}_ms"], flush=True)
    res["fwd"] = res_fwd


def main():
    secs = [a for a in sys.argv[1:] if not a.startswith("-")] or ["sort", "take", "scatter", "fwd"]
    res = {"device": str(jax.devices()[0])}
    print(res["device"], flush=True)
    for s in secs:
        print("SECTION", s, flush=True)
        globals()[f"probe_{s}"](res)
    with open(os.path.join(HERE, "probe_r3.json"), "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()

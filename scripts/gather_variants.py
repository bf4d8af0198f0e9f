#!/usr/bin/env python
"""Benchmark bilinear plane-sample formulations on the TPU.

Motivation: honest (value-forced) timing shows XLA's row-gather form of
`sample_plane` runs ~60x below HBM peak on TPU (scripts/perf_tpu.py history),
and the full train step is gather/scatter-bound. This script measures the
design space so the sampler implementation is chosen from data.

Timing method: every candidate is wrapped in a lax.scan whose carry feeds the
next iteration (nothing elidable), executed at two chain lengths, and forced
with a scalar device_get — the only synchronization that actually waits on
this tunneled TPU (plain block_until_ready returns before execution).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def chain_time(step, init, n_lo=3, n_hi=15):
    """Per-iteration device time of `step(carry) -> carry` via scan chains."""

    def runner(n):
        @jax.jit
        def f(init):
            def body(c, _):
                return step(c), None

            c, _ = jax.lax.scan(body, init, None, length=n)
            return c

        float(jnp.sum(f(init)))  # compile + warm
        t0 = time.perf_counter()
        float(jnp.sum(f(init)))
        return time.perf_counter() - t0

    lo, hi = runner(n_lo), runner(n_hi)
    return (hi - lo) / (n_hi - n_lo)


def bilerp_idx(xy, H, W):
    g = (xy + 1.0) * 0.5 * jnp.asarray([W - 1, H - 1], jnp.float32)
    i0 = jnp.floor(g).astype(jnp.int32)
    w = g - i0
    x0, y0 = i0[:, 0], i0[:, 1]
    x1, y1 = jnp.minimum(x0 + 1, W - 1), jnp.minimum(y0 + 1, H - 1)
    wx, wy = w[:, 0], w[:, 1]
    return x0, x1, y0, y1, wx, wy


def make_variants(H, W, C, N, seed=0):
    key = jax.random.PRNGKey(seed)
    plane_hwc = jax.random.normal(key, (H, W, C), jnp.float32)
    xy = jax.random.uniform(jax.random.PRNGKey(1), (N, 2), jnp.float32, -0.999, 0.999)
    variants = {}

    def v_current(c):
        from rodynrf_tpu.ops.grid_sample import sample_plane

        plane = jnp.moveaxis(plane_hwc, -1, 0)
        out = sample_plane(plane, xy + c * 1e-30, stride=1)
        return c + jnp.sum(out)

    variants["current_row_take_chw"] = v_current

    def v_rows(c, sorted_idx=False, flat=None):
        if flat is None:
            flat = plane_hwc.reshape(H * W, C)
        x0, x1, y0, y1, wx, wy = bilerp_idx(xy + c * 1e-30, H, W)
        i00 = y0 * W + x0
        g = lambda i: jnp.take(flat, i, axis=0, indices_are_sorted=sorted_idx)
        out = (
            g(i00) * ((1 - wy) * (1 - wx))[:, None]
            + g(y0 * W + x1) * ((1 - wy) * wx)[:, None]
            + g(y1 * W + x0) * (wy * (1 - wx))[:, None]
            + g(y1 * W + x1) * (wy * wx)[:, None]
        )
        return c + jnp.sum(out)

    variants["row_take_hwc"] = v_rows

    def v_patch(c):
        # one lax.gather pulling [2, 2, C] patches
        x0, x1, y0, y1, wx, wy = bilerp_idx(xy + c * 1e-30, H, W)
        starts = jnp.stack([jnp.minimum(y0, H - 2), jnp.minimum(x0, W - 2)], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        patch = jax.lax.gather(
            plane_hwc, starts, dn, slice_sizes=(2, 2, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )  # [N, 2, 2, C]
        w = jnp.stack(
            [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx], -1
        ).reshape(N, 2, 2)
        out = jnp.einsum("nyx,nyxc->nc", w, patch)
        return c + jnp.sum(out)

    variants["patch_gather_2x2C"] = v_patch

    def v_combined(c):
        # single take of all 4 corners: [4N] indices
        flat = plane_hwc.reshape(H * W, C)
        x0, x1, y0, y1, wx, wy = bilerp_idx(xy + c * 1e-30, H, W)
        idx = jnp.concatenate([y0 * W + x0, y0 * W + x1, y1 * W + x0, y1 * W + x1])
        vals = jnp.take(flat, idx, axis=0).reshape(4, N, C)
        w = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx])
        out = jnp.einsum("kn,knc->nc", w, vals)
        return c + jnp.sum(out)

    variants["combined_4N_take"] = v_combined

    def v_sorted(c):
        # pre-sorted sample order (sort cost measured separately)
        flat = plane_hwc.reshape(H * W, C)
        x0, x1, y0, y1, wx, wy = bilerp_idx(xy + c * 1e-30, H, W)
        i00 = y0 * W + x0
        order = jnp.argsort(i00)
        inv = jnp.argsort(order)

        def g(i):
            return jnp.take(
                flat, jnp.take(i, order), axis=0, indices_are_sorted=False
            )

        out = (
            g(i00) * jnp.take((1 - wy) * (1 - wx), order)[:, None]
            + g(y0 * W + x1) * jnp.take((1 - wy) * wx, order)[:, None]
            + g(y1 * W + x0) * jnp.take(wy * (1 - wx), order)[:, None]
            + g(y1 * W + x1) * jnp.take(wy * wx, order)[:, None]
        )
        return c + jnp.sum(jnp.take(out, inv, axis=0))

    variants["sorted_then_take"] = v_sorted

    def v_lane_gather(c):
        # gather along the LANE (minor) axis: plane [C, H*W], shared idx
        flat = jnp.moveaxis(plane_hwc, -1, 0).reshape(C, H * W)
        x0, x1, y0, y1, wx, wy = bilerp_idx(xy + c * 1e-30, H, W)
        g = lambda i: jnp.take(flat, i, axis=1)  # [C, N]
        out = (
            g(y0 * W + x0) * ((1 - wy) * (1 - wx))[None]
            + g(y0 * W + x1) * ((1 - wy) * wx)[None]
            + g(y1 * W + x0) * (wy * (1 - wx))[None]
            + g(y1 * W + x1) * (wy * wx)[None]
        )
        return c + jnp.sum(out)

    variants["lane_axis_take"] = v_lane_gather

    def v_bf16(c):
        flat = plane_hwc.astype(jnp.bfloat16).reshape(H * W, C)
        return v_rows(c, flat=flat)

    variants["row_take_hwc_bf16"] = v_bf16

    def v_grad(c):
        # forward + backward (the scatter-add path) of the current sampler
        from rodynrf_tpu.ops.grid_sample import sample_plane

        plane = jnp.moveaxis(plane_hwc, -1, 0)

        def loss(p):
            return jnp.sum(sample_plane(p, xy + c * 1e-30, stride=1))

        return c + jnp.sum(jax.grad(loss)(plane))

    variants["fwd_bwd_current"] = v_grad

    return variants


def main():
    shapes = [
        ("300^3-app", 393, 330, 48, 276480),
        ("640^3-app", 786, 706, 48, 591872),
    ]
    results = {"device": str(jax.devices()[0])}
    for label, H, W, C, N in shapes:
        logical_gb = N * 4 * C * 4 / 1e9
        res = {}
        for name, fn in make_variants(H, W, C, N).items():
            per = chain_time(fn, jnp.float32(0.0))
            res[name] = {
                "ms": round(per * 1e3, 3),
                "eff_GBps": round(logical_gb / per, 1),
            }
            print(f"[{label}] {name}: {per*1e3:.3f} ms ({logical_gb/per:.0f} GB/s eff)",
                  flush=True)
        results[label] = res
    with open(os.path.join(REPO, "scripts", "gather_variants.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()

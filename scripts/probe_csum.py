#!/usr/bin/env python
"""Scatter-replacement probe: sorted prefix-sum-diff table gradient.

The backward's table gradient  grad[r, :] = sum_{m: rows[m]=r} u[m, :]
is an XLA scatter-add at ~50 Midx/s (PERF.md §1). This probe measures the
gather-only reformulation in ops/coalesced.csum_grad:

  1. sort_key_val(rows, iota)             - XLA sort
  2. permute u rows by the sort perm      - ONE take
  3. cumsum along the sorted axis         - log-pass VPU work
  4. starts = searchsorted(rows_sorted, arange(R+1))
  5. grad = csumZ[starts[1:]] - csumZ[starts[:-1]]  - ONE take + subtract

No scatter anywhere. Numerical caveat: the prefix-sum diff subtracts nearby
partial sums; measured max-abs/rel error vs the f32 scatter reference is
recorded. Only the dominant backward shape is probed (merged 300^3 o0
dynamic: N=276480 samples, 960-wide rows, R~374k) -- compiles over the axon
tunnel cost ~35 s each, so the probe stays to 8 programs.

Writes scripts/probe_csum.json incrementally. Run on the TPU.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rodynrf_tpu.ops.coalesced import csum_grad  # noqa: E402

OUT = os.path.join(REPO, "scripts", "probe_csum.json")


def chain_time(step, rows, u, n_lo=2, n_hi=8):
    # rows/u are jit ARGUMENTS, not closures: closed-over device arrays get
    # baked into the HLO as constants, which blows the axon remote-compile
    # request limit (HTTP 413) at these shapes
    def runner(n):
        @functools.partial(jax.jit, static_argnums=(3,))
        def f(c0, rows, u, n):
            def body(c, _):
                return step(c, rows, u), None

            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c

        float(f(jnp.float32(0.0), rows, u, n))
        t0 = time.perf_counter()
        float(f(jnp.float32(0.0), rows, u, n))
        return time.perf_counter() - t0

    lo, hi = runner(n_lo), runner(n_hi)
    return (hi - lo) / (n_hi - n_lo)


def scatter_grad(rows, u, R):
    return jnp.zeros((R, u.shape[1]), u.dtype).at[rows].add(
        u, mode="promise_in_bounds"
    )


def main():
    out = {"device": str(jax.devices()[0])}
    N, C, R, dup = 276_480, 960, 374_000, 3
    out["shape"] = {"N": N, "C": C, "R": R, "dup": dup}
    key = jax.random.PRNGKey(42)
    base = jax.random.randint(key, (N // dup,), 0, R, jnp.int32)
    rows = jnp.repeat(base, dup)[:N]
    for dt, dl in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        u = jax.random.normal(jax.random.PRNGKey(7), (N, C), jnp.float32)
        u = (u * 1e-2).astype(dt)  # gradient-scale values

        def f_scat(c, rows, u):
            r = rows + (c * 0.0).astype(jnp.int32)
            g = scatter_grad(r, u, R)
            return c + jnp.sum(g[::4096].astype(jnp.float32))

        def f_csum(c, rows, u):
            r = rows + (c * 0.0).astype(jnp.int32)
            g = csum_grad(r, u, R)
            return c + jnp.sum(g[::4096])

        ms_s = round(chain_time(f_scat, rows, u) * 1e3, 2)
        print(f"{dl} scatter {ms_s} ms", flush=True)
        ms_c = round(chain_time(f_csum, rows, u) * 1e3, 2)
        print(f"{dl} csum {ms_c} ms ({ms_s/ms_c:.2f}x)", flush=True)
        ref = scatter_grad(rows, u.astype(jnp.float32), R)
        got = csum_grad(rows, u, R)
        err = float(jnp.max(jnp.abs(got - ref)))
        rel = float(err / (jnp.max(jnp.abs(ref)) + 1e-30))
        out[dl] = {
            "scatter_ms": ms_s,
            "csum_ms": ms_c,
            "speedup": round(ms_s / ms_c, 2),
            "max_abs_err": err,
            "max_rel_err": rel,
        }
        print(f"{dl}: err {err:.3e} (rel {rel:.2e})", flush=True)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()

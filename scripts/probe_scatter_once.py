#!/usr/bin/env python
"""Scatter-once probe (VERDICT r3 next-round item 2, final door).

The production backward issues one scatter-add per dynamic eval into the
same merged table (~6 evals/step at 300^3). This probe measures whether
hoisting the accumulation — concatenating all evals' (rows, u) and issuing
ONE scatter per table per step — beats letting XLA transpose each take
separately (6 scatters + cotangent summation).

Both programs compute grad wrt the SAME table of the same mathematical
function (sum over 6 weighted takes), differing only in graph structure:

  per-eval : L = sum_i reduce(take(table, rows_i) * w_i)   (6 take VJPs)
  concat   : rows_cat/w_cat built once; one take, one scatter in the VJP

Shapes = the dominant 300^3 merged o0 dynamic eval (N=276480 rows/eval,
960-wide rows, R~374k), 6 evals. Writes scripts/probe_scatter_once.json.
Run on the TPU.
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

OUT = os.path.join(REPO, "scripts", "probe_scatter_once.json")

N, C, R, E = 276_480, 960, 374_000, 6


def chain_time(step, args, n_lo=2, n_hi=10):
    # args are jit ARGUMENTS (closed-over device arrays get baked into the
    # HLO constant pool, which blows the axon remote-compile size limit)
    def runner(n):
        @functools.partial(jax.jit, static_argnums=(2,))
        def f(c0, args, n):
            def body(c, _):
                return step(c, args), None

            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c

        float(f(jnp.float32(0.0), args, n))
        t0 = time.perf_counter()
        float(f(jnp.float32(0.0), args, n))
        return time.perf_counter() - t0

    lo, hi = runner(n_lo), runner(n_hi)
    return (hi - lo) / (n_hi - n_lo)


def main():
    out = {"device": str(jax.devices()[0]), "shape": {"N": N, "C": C, "R": R, "evals": E}}
    key = jax.random.PRNGKey(0)
    rows = jax.random.randint(key, (E, N), 0, R, jnp.int32)
    w = jax.random.normal(jax.random.PRNGKey(1), (E, N), jnp.float32) * 1e-2

    for dt, dl in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        table = (jax.random.normal(jax.random.PRNGKey(2), (R, C), jnp.float32) * 0.1).astype(dt)

        # the loss is LINEAR in the table, so grad(table) = scatter(w): if w
        # is loop-invariant XLA hoists the entire scatter out of the scan.
        # Perturbing w by c (the scan carry) makes each iteration's scatter
        # payload distinct without adding table-sized extra work.
        def loss_pereval(table, rows, w):
            acc = jnp.float32(0.0)
            for i in range(E):
                v = table.at[rows[i]].get(mode="promise_in_bounds").astype(jnp.float32)
                acc = acc + jnp.sum(v * w[i][:, None])
            return acc

        def loss_concat(table, rows, w):
            rc = rows.reshape(E * N)
            wc = w.reshape(E * N)
            v = table.at[rc].get(mode="promise_in_bounds").astype(jnp.float32)
            return jnp.sum(v * wc[:, None])

        def mk(loss):
            def step(c, args):
                table, rows, w = args
                g = jax.grad(loss)(table, rows, w + c * 1e-30)
                return c + jnp.sum(g[::4096].astype(jnp.float32))

            return step

        args = (table, rows, w)
        ms_p = round(chain_time(mk(loss_pereval), args) * 1e3, 2)
        print(f"{dl} per-eval(6 scatters) {ms_p} ms", flush=True)
        ms_c = round(chain_time(mk(loss_concat), args) * 1e3, 2)
        print(f"{dl} concat (1 scatter)  {ms_c} ms ({ms_p/ms_c:.2f}x)", flush=True)
        out[dl] = {"pereval_ms": ms_p, "concat_ms": ms_c,
                   "speedup": round(ms_p / ms_c, 2)}
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Sorted-streaming gather probe (VERDICT r3 item 7).

Question: does XLA's TPU row-take leave the ~240 Midx/s random-access
plateau when its indices are ASCENDING (streaming access pattern)? If yes,
a sort-gather-unsort pipeline could beat the random take once the sort is
amortized; if no, the door is closed and the plateau is an emitter property,
not a memory-locality property.

Measures, at the production table shape (merged 300^3 o=0 table):
  random            — uniform random rows (the production access pattern)
  ascending         — iota-spaced rows (perfectly sorted, stride ~R/N)
  ascending_flagged — same + indices_are_sorted=True
  blocked64         — sorted within 64-row blocks (z-order-like locality)
  dup8              — ascending with 8x duplication (ray-coherence pattern)
The unsort cost of a real pipeline would be one extra [N, C] take; measured
as `unsort_take`.

Writes scripts/probe_sorted.json. Run on the TPU.
"""

from __future__ import annotations

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


def chain_time(step, args, n_lo=3, n_hi=15):
    # args are jit ARGUMENTS (closed-over device arrays get baked into the
    # HLO constant pool, which blows the axon remote-compile size limit)
    import functools

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
    # merged 300^3-class o=0 table: ~374k rows x 960 ch bf16 (PERF.md §3)
    R, C = 374_000, 960
    N = 829_440  # one dynamic eval's rows: 276480 samples x 3 orientations
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, C)).astype(jnp.bfloat16)
    rand_rows = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, R, jnp.int32)
    asc_rows = (jnp.arange(N, dtype=jnp.int32) * R) // N
    blocked = jnp.sort(rand_rows.reshape(-1, 64), axis=1).reshape(-1)
    dup8 = jnp.repeat(((jnp.arange(N // 8, dtype=jnp.int32) * R) // (N // 8)), 8)
    perm = jax.random.permutation(jax.random.PRNGKey(2), N).astype(jnp.int32)

    def take(sorted_flag=False):
        def step(c, args):
            table, rows = args
            r = rows + (c * 0.0).astype(jnp.int32)
            v = table.at[r].get(mode="promise_in_bounds",
                                indices_are_sorted=sorted_flag)
            return c + jnp.sum(v[:, :1].astype(jnp.float32))

        return step

    out = {"R": R, "C": C, "N": N, "device": str(jax.devices()[0])}
    cases = {
        "random": (take(), (table, rand_rows)),
        "ascending": (take(), (table, asc_rows)),
        "ascending_flagged": (take(True), (table, asc_rows)),
        "blocked64": (take(), (table, blocked)),
        "dup8": (take(True), (table, dup8)),
    }

    def unsort(c, args):
        table, rows, perm = args
        vals = jnp.take(table, rows, axis=0).astype(jnp.float32)
        v = jnp.take(vals, perm + (c * 0.0).astype(jnp.int32), axis=0)
        return c + jnp.sum(v[:, :1])

    cases["sorted_take_plus_unsort"] = (unsort, (table, asc_rows, perm))

    for name, (fn, args) in cases.items():
        per = chain_time(fn, args)
        out[name] = {
            "ms": round(per * 1e3, 3),
            "Midx_per_s": round(N / per / 1e6, 1),
        }
        print(f"{name}: {per*1e3:.3f} ms ({N/per/1e6:.0f} Midx/s)", flush=True)

    with open(os.path.join(REPO, "scripts", "probe_sorted.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()

"""Coalesced-gradient plane sampling: custom VJP for the mega-table take.

The hot train-step primitive is `take(table, rows)` + bilinear corner
weighting (ops/fused_vm.py). Its autodiff backward is an XLA scatter-add,
which on TPU serializes per index at ~50 Midx/s regardless of dtype/width/
sortedness (PERF.md §1) — ~40% of the round-2 train step.

This module replaces that backward with a TPU-native pipeline that exploits
two structural facts:

  * ray samples hit each table row with high duplication (2.5x at stride 1
    up to ~40x at stride 4 — 270 samples/ray walk few distinct texels), and
  * a segment-sum over SORTED keys is a small-one-hot MATMUL per output
    block — MXU work, not serialized index work.

Backward table-gradient = sort keys (XLA, ~1 ms/M) → permute cotangents
(one index-bound take) → stream the sorted (key, w4, ct) rows once through
a Pallas kernel that walks output blocks of G texels in key order,
accumulating  grad[(texel, corner), :] += w4[corner] * ct[row, :]  as a
[4G, CH] x [CH, C] matmul per (chunk, overlapped block), flushing each
finished block with one DMA. Input is read exactly once (streaming), the
output written exactly once — no scatter anywhere.

The kernel also consumes the *factored* cotangent (w4 [M,4] and ct [M,C]
separately) instead of the materialized [M, 4C] corner outer product the
XLA backward would build — 4x less gradient traffic.

Reference semantics anchor: the grid_sample backward of
models/tensoRF.py:118-196 (torch autograd scatter into plane grids).

Non-TPU platforms (CPU tests, golden runs) use a mathematically identical
jnp scatter fallback; parity is asserted by tests/test_coalesced.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def planes_sample(table: jnp.ndarray, rows: jnp.ndarray, w4: jnp.ndarray,
                  impl: str = "auto") -> jnp.ndarray:
    """Corner-packed plane sampling: feats[m] = Σ_k w4[m,k] · table[rows[m], k·C:(k+1)·C].

    table: [R, 4C] corner-packed rows (ops/fused_vm.pack_vm layout)
    rows:  [M] int32 row ids (in range; OOB handled upstream via `valid`)
    w4:    [M, 4] f32 bilinear corner weights (already × valid mask)
    impl:  'auto' | 'xla' | 'pallas' — backward table-grad implementation.

    Differentiable w.r.t. table and w4. Forward math is identical to
    take + corner weighting in f32 (ops/fused_vm.sample_vm_fused).
    """
    return _fwd_math(table, rows, w4)


def _fwd_math(table, rows, w4):
    M = rows.shape[0]
    C4 = table.shape[1]
    C = C4 // 4
    vals = table.at[rows].get(mode="promise_in_bounds").astype(jnp.float32).reshape(M, 4, C)
    return (
        vals[:, 0] * w4[:, 0, None]
        + vals[:, 1] * w4[:, 1, None]
        + vals[:, 2] * w4[:, 2, None]
        + vals[:, 3] * w4[:, 3, None]
    )


def _planes_sample_fwd(table, rows, w4, impl):
    return _fwd_math(table, rows, w4), (table, rows, w4)


def _planes_sample_bwd(impl, res, ct):
    table, rows, w4 = res
    M = rows.shape[0]
    C4 = table.shape[1]
    C = C4 // 4
    # w4 cotangent: <vals[m, k, :], ct[m, :]> — re-take the rows instead of
    # storing [M, 4, C] activations (index ops are cheaper than HBM here)
    vals = table.at[rows].get(mode="promise_in_bounds").astype(jnp.float32).reshape(M, 4, C)
    ct_w4 = jnp.einsum("mc,mkc->mk", ct, vals)

    # XLA-scatter route: accumulate the table cotangent in the TABLE dtype —
    # exactly what plain autodiff of a bf16 take does (the astype transpose
    # converts the cotangent BEFORE the scatter), and what the dynamic
    # merged path already gets. Scattering in the f32 cotangent dtype
    # doubled the static backward's scatter traffic for a precision the
    # parameters never see (the result is cast to table dtype below anyway)
    # — measured 5 x 4.8 ms f32 o0 scatters at 300^3 (PERF.md §13). The
    # csum/pallas routes keep the f32 cotangent: f32 accumulation is their
    # documented property.
    ct_scatter = ct.astype(table.dtype) if impl in ("auto", "xla") else ct
    ct_table = coalesce_table_grad(rows, w4, ct_scatter, table.shape[0], impl=impl)
    return ct_table.astype(table.dtype), None, ct_w4


planes_sample.defvjp(_planes_sample_fwd, _planes_sample_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def merged_sample(table: jnp.ndarray, rows: jnp.ndarray, w: jnp.ndarray,
                  impl: str = "auto") -> jnp.ndarray:
    """Merged-layout corner sampling with a selectable table-grad backward.

    table: [R, nS*4*C] merged-stride corner rows (ops/fused_vm merged layout:
           channel blocks [stride: corner: C])
    rows:  [M] int32 merged-cell row ids (in range by construction)
    w:     [M, nS, 4] f32 per-stride bilinear corner weights (x valid mask)
    impl:  table-grad implementation: 'xla' scatter | 'csum' gather-only
           prefix-sum-diff (csum_grad) | 'auto' (resolves per measurement).

    Returns [M, nS, C] per-stride plane features, f32. Forward FMA order is
    identical to the inline merged epilogue (ops/fused_vm.py) — bit-exact
    with the autodiff path; only the backward implementation differs.
    """
    return _merged_fwd_math(table, rows, w)


def _merged_fwd_math(table, rows, w):
    M = rows.shape[0]
    nS = w.shape[1]
    C = table.shape[1] // (nS * 4)
    vals = table.at[rows].get(mode="promise_in_bounds").reshape(M, nS, 4, C)
    return (
        vals[:, :, 0].astype(jnp.float32) * w[:, :, 0, None]
        + vals[:, :, 1].astype(jnp.float32) * w[:, :, 1, None]
        + vals[:, :, 2].astype(jnp.float32) * w[:, :, 2, None]
        + vals[:, :, 3].astype(jnp.float32) * w[:, :, 3, None]
    )


def _merged_sample_fwd(table, rows, w, impl):
    return _merged_fwd_math(table, rows, w), (table, rows, w)


def _merged_sample_bwd(impl, res, ct):
    table, rows, w = res
    M = rows.shape[0]
    nS = w.shape[1]
    C = table.shape[1] // (nS * 4)
    # w cotangent: <vals[m, s, k, :], ct[m, s, :]> — re-take instead of
    # storing the [M, nS, 4, C] activation block (index ops beat HBM here)
    vals = table.at[rows].get(mode="promise_in_bounds").astype(jnp.float32)
    vals = vals.reshape(M, nS, 4, C)
    ct_w = jnp.einsum("msc,mskc->msk", ct, vals)

    if impl == "auto":
        impl = "csum"
    # table cotangent rows: u[m, (s,k,c)] = w[m,s,k] * ct[m,s,c]
    if impl == "csum":
        u = (w[:, :, :, None] * ct[:, :, None, :]).reshape(M, nS * 4 * C)
        ct_table = csum_grad(rows, u, table.shape[0])
    else:
        # match plain autodiff of a bf16 take: accumulate in the table dtype
        u = (w[:, :, :, None].astype(table.dtype)
             * ct[:, :, None, :].astype(table.dtype)).reshape(M, nS * 4 * C)
        ct_table = jnp.zeros((table.shape[0], nS * 4 * C), table.dtype).at[rows].add(
            u, mode="promise_in_bounds"
        )
    return ct_table.astype(table.dtype), None, ct_w


merged_sample.defvjp(_merged_sample_fwd, _merged_sample_bwd)


# ---------------------------------------------------------------------------
# table-gradient implementations
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - device query failure
        return False


def coalesce_table_grad(rows, w4, ct, R: int, impl: str = "auto") -> jnp.ndarray:
    """grad[r, k·C+c] = Σ_{m: rows[m]=r} w4[m,k] · ct[m,c]  →  [R, 4C] f32.

    'auto' resolves to the XLA scatter: the measured TPU numbers
    (scripts/probe_r3.json) put the sorted Pallas pipeline at 25.5 ms vs
    24.1 ms XLA at the o0 backward shape (and behind at narrow C) — the
    80 Midx/s random permutation-gather eats the matmul win. The production
    answer to scatter cost is the merged-stride table layout (3x fewer
    indices, ops/fused_vm.py); the kernel stays available via impl='pallas'.
    impl='csum' uses the gather-only sorted prefix-sum-diff (see csum_grad).
    """
    if impl == "auto":
        impl = "xla"
    if impl == "pallas":
        return _coalesce_pallas(rows, w4, ct, R)
    if impl == "csum":
        M, C = ct.shape
        K = w4.shape[1]
        upd = (w4[:, :, None].astype(ct.dtype) * ct[:, None, :]).reshape(M, K * C)
        return csum_grad(rows, upd, R)
    return _coalesce_xla(rows, w4, ct, R)


def csum_grad(rows: jnp.ndarray, u: jnp.ndarray, R: int) -> jnp.ndarray:
    """Gather-only segment accumulation:  grad[r, :] = Σ_{m: rows[m]=r} u[m, :].

    Replaces the XLA scatter-add (~50 Midx/s serialized on TPU, PERF.md §1)
    with index work the TPU gather emitter runs at ~240 Midx/s:

      sort_key_val → permute u rows (one take) → f32 cumsum along the sorted
      axis → per-table-row boundaries via searchsorted → grad = adjacent
      prefix-sum differences (one take + subtract).

    Exact in exact arithmetic; in f32 the boundary subtraction cancels nearby
    prefix sums, so entries are accurate to ~ulp(running prefix max) — for
    gradient-scale values ≤1e-4 relative (asserted by tests/test_coalesced.py;
    the production scatter baseline accumulates in bf16, which is coarser).
    Reference semantics anchor: the grid_sample backward of
    models/tensoRF.py:118-196 (torch scatter into plane grids).
    """
    M = rows.shape[0]
    rows_s, perm = jax.lax.sort_key_val(
        rows.astype(jnp.int32), jnp.arange(M, dtype=jnp.int32)
    )
    u_s = u.at[perm].get(mode="promise_in_bounds").astype(jnp.float32)
    csum = jnp.cumsum(u_s, axis=0)
    starts = jnp.searchsorted(rows_s, jnp.arange(R + 1, dtype=jnp.int32))
    csum_z = jnp.concatenate([jnp.zeros((1, u.shape[1]), jnp.float32), csum], 0)
    ends_v = csum_z.at[starts].get(mode="promise_in_bounds")
    return ends_v[1:] - ends_v[:-1]


def _coalesce_xla(rows, w4, ct, R: int) -> jnp.ndarray:
    """Reference implementation: plain scatter-add.

    Accumulates in ct's dtype (bf16 scatter matches what plain autodiff of
    the bf16 take would do, at the same measured scatter rate)."""
    M, C = ct.shape
    K = w4.shape[1]
    upd = (w4[:, :, None].astype(ct.dtype) * ct[:, None, :]).reshape(M, K * C)
    return jnp.zeros((R, K * C), ct.dtype).at[rows].add(
        upd, mode="promise_in_bounds"
    ).astype(jnp.float32)


# --- Pallas streaming coalesce ---------------------------------------------

_G_TEXELS = 256       # output block: G texels = 4G gradient rows
_CHUNK = 2048         # sorted input rows consumed per grid step


def _coalesce_kernel(keys_ref, wt_ref, ct_ref, out_ref, base_ref, acc_ref, sem,
                     *, C: int, G: int, CH: int, n_blocks: int, K: int):
    """One grid step = one chunk of CH sorted entries.

    Walks the (sorted) key stream against output blocks of G texels held in
    a [K*G, C] f32 VMEM accumulator; finished blocks stream out via DMA.
    base_ref (SMEM) carries the current block index across grid steps.
    K is the corner count per texel (4 for a single-stride bilinear pack).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(c == 0)
    def _init():
        base_ref[0] = 0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    keys = keys_ref[0]                  # [1, CH] i32 (sorted, sentinel-padded)
    ctv = ct_ref[0]                     # [CH, C]

    first_key = keys_ref[0, 0, 0]
    last_key = keys_ref[0, 0, CH - 1]

    # accumulator row ids: (texel g, corner k) -> K*g + k, block-local
    rk = jax.lax.broadcasted_iota(jnp.int32, (K * G, CH), 0)
    texel = rk // K
    corner = rk - texel * K
    keys_b = jnp.broadcast_to(keys, (K * G, CH))

    # corner weights per accumulator row: w_b[(g,k), i] = w4[i, k]
    w_b = jnp.zeros((K * G, CH), jnp.float32)
    for k in range(K):
        wk = jnp.broadcast_to(wt_ref[0, k : k + 1, :], (K * G, CH))
        w_b = jnp.where(corner == k, wk, w_b)

    def accum(block):
        lo = block * G
        eq = keys_b == (lo + texel)              # [KG, CH]
        a_t = jnp.where(eq, w_b, 0.0).astype(ctv.dtype)
        acc_ref[:] += jax.lax.dot(a_t, ctv, preferred_element_type=jnp.float32)

    def flush(block):
        cp = pltpu.make_async_copy(
            acc_ref, out_ref.at[pl.ds(block * K * G, K * G), :], sem
        )
        cp.start()
        cp.wait()
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def cond(state):
        block = state
        return (block + 1 < n_blocks) & (last_key >= (block + 1) * G)

    def body(state):
        block = state
        # entries of this chunk belonging to `block` (may be none if the
        # chunk jumped past several empty blocks)
        @pl.when(first_key < (block + 1) * G)
        def _():
            accum(block)

        flush(block)
        return block + 1

    block = jax.lax.while_loop(cond, body, base_ref[0])
    # the chunk's tail belongs to the (unfinished) current block
    @pl.when(first_key < (block + 1) * G)
    def _():
        accum(block)

    base_ref[0] = block

    # final grid step: flush the current block and zero every later one
    @pl.when(c == n_chunks - 1)
    def _tail():
        def tail_body(b, _):
            flush(b)
            return 0

        jax.lax.fori_loop(block, n_blocks, tail_body, 0)


def _coalesce_pallas(rows, w4, ct, R: int) -> jnp.ndarray:
    """sort + permute + streaming Pallas coalesce.

    rows [M], w4 [M, K], ct [M, C]  →  [R, K*C] f32 table gradient.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, C0 = ct.shape
    K = w4.shape[1]
    # Mosaic sliced DMA requires 128-aligned lane extents: pad the channel
    # axis up front, slice the padding off the result
    C = -(-C0 // 128) * 128
    if C != C0:
        ct = jnp.pad(ct, ((0, 0), (0, C - C0)))
    G, CH = _G_TEXELS, _CHUNK
    n_blocks = -(-R // G)
    n_chunks = -(-M // CH)
    Mp = n_chunks * CH

    rows_s, perm = jax.lax.sort_key_val(rows.astype(jnp.int32),
                                        jnp.arange(M, dtype=jnp.int32))
    wct = jnp.concatenate([w4.astype(ct.dtype), ct], axis=1)  # [M, K+C]
    wct_s = wct.at[perm].get(mode="promise_in_bounds")
    if Mp != M:
        # sentinel key: last texel of the last block with zero weights —
        # contributes nothing, keeps the stream sorted
        rows_s = jnp.concatenate(
            [rows_s, jnp.full((Mp - M,), n_blocks * G - 1, jnp.int32)])
        wct_s = jnp.concatenate(
            [wct_s, jnp.zeros((Mp - M, K + C), wct_s.dtype)])

    keys3 = rows_s.reshape(n_chunks, 1, CH)
    # weights transposed to [n_chunks, K, CH] so the kernel reads each
    # corner's weights as a lane-contiguous row (no in-kernel transpose)
    wt3 = (
        wct_s[:, :K].astype(jnp.float32).T.reshape(K, n_chunks, CH)
        .transpose(1, 0, 2)
    )
    ct3 = wct_s[:, K:].reshape(n_chunks, CH, C)

    kernel = functools.partial(
        _coalesce_kernel, C=C, G=G, CH=CH, n_blocks=n_blocks, K=K)

    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, CH), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, CH), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, C), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_blocks * K * G, C), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((K * G, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys3, wt3, ct3)

    # [(texel, corner), Cpad] rows -> [texel, K, Cpad] -> strip pad -> [R, K*C0]
    out = out.reshape(n_blocks * G, K, C)[:R, :, :C0]
    return out.reshape(R, K * C0)

"""Pallas TPU kernel: sorted segment row-sum — the gather-backward scatter.

The gradient of the fused mega-table gather (ops/fused_vm.py) w.r.t. the
table is a scatter-add of N update rows into R table rows. XLA's TPU scatter
processes ~50 M rows/s regardless of row width or duplication (measured,
scripts/gather_variants.py history) — it serializes per index on the scalar
core. This kernel reformulates the scatter as a dense-compute problem:

  1. sort the indices (XLA sort: ~1 ms for 1M keys — cheap);
  2. with sorted indices, every 128-row block of the OUTPUT table receives a
     CONTIGUOUS range of update rows;
  3. each kernel program owns one output block, streams its update range
     from HBM in chunks, and accumulates via a one-hot MXU matmul:
     acc[128, C] += onehot[128, K] @ chunk[K, C].

The one-hot is built by a vectorized iota-compare (VPU), the accumulation is
MXU work, and the update stream is read exactly once.

Measured status (TPU v5e, 829k updates into 122k rows, the 300^3 dynamic-eval
backward shape): 24.8 ms bf16 C=320 (33 Midx/s) vs XLA scatter 16.5 ms
(50 Midx/s). The kernel is correct (exact in bf16, ~2e-5 f32 sum-order noise)
but per-iteration DMA descriptor setup (~4 make_async_copy constructions x
~1-2 µs each per chunk) dominates at CHUNK=1024, and larger chunks currently
trip a Mosaic compile bug. XLA's scatter therefore REMAINS THE DEFAULT
backward; this kernel is kept as a working, tested baseline for the next
optimization round (the fix is batching the idx+upd streams into one
interleaved buffer -> 1 descriptor per chunk, or block-granular BlockSpec
pipelining instead of manual DMA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256  # output rows per program (2 lane-tiles; fewer spill chunks)
CHUNK = 1024  # update rows streamed per inner iteration


def _kernel(
    starts_ref, idx_ref, upd_ref, out_ref,
    idx_scr0, idx_scr1, upd_scr0, upd_scr1, acc_ref, sems,
):
    b = pl.program_id(0)
    # CHUNK-align the stream range: head/tail rows belonging to neighboring
    # output blocks produce local offsets outside [0, BLOCK_ROWS) and vanish
    # in the one-hot, so alignment costs at most two extra chunks per block
    # while keeping every DMA offset tile-aligned (Mosaic requirement).
    c0 = starts_ref[b] // CHUNK
    nch = pl.cdiv(starts_ref[b + 1], CHUNK) - c0

    acc_ref[:] = jnp.zeros_like(acc_ref)
    row_base = b * BLOCK_ROWS
    # f32 updates must not round through bf16 MXU passes; bf16 inputs are
    # exact with f32 accumulation either way
    prec = (
        jax.lax.Precision.HIGHEST
        if upd_scr0.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def copies(c, slot):
        cg = c0 + c
        i_scr = idx_scr0 if slot == 0 else idx_scr1
        u_scr = upd_scr0 if slot == 0 else upd_scr1
        return (
            pltpu.make_async_copy(
                idx_ref.at[pl.ds(cg * CHUNK, CHUNK)], i_scr, sems.at[2 * slot]
            ),
            pltpu.make_async_copy(
                upd_ref.at[pl.ds(cg * CHUNK, CHUNK), :], u_scr, sems.at[2 * slot + 1]
            ),
        )

    def start_dma(c, slot):
        for cp in copies(c, slot):
            cp.start()

    def wait_dma(c, slot):
        for cp in copies(c, slot):
            cp.wait()

    @pl.when(nch > 0)
    def _():
        start_dma(0, 0)

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when((c + 1 < nch) & (slot == 0))
        def _():
            start_dma(c + 1, 1)

        @pl.when((c + 1 < nch) & (slot == 1))
        def _():
            start_dma(c + 1, 0)

        def accumulate(i_scr, u_scr):
            # one-hot over local row offsets: [BLOCK_ROWS, CHUNK]; matmul on
            # the refs directly — a lax.cond selecting between scratch values
            # would copy the whole chunk through VMEM each iteration
            local = i_scr[:].reshape(1, CHUNK) - row_base
            rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, CHUNK), 0)
            onehot = jnp.where(rows == local, 1.0, 0.0).astype(u_scr.dtype)
            acc_ref[:] += jax.lax.dot(
                onehot, u_scr[:], preferred_element_type=jnp.float32, precision=prec
            )

        @pl.when(slot == 0)
        def _():
            wait_dma(c, 0)
            accumulate(idx_scr0, upd_scr0)

        @pl.when(slot == 1)
        def _():
            wait_dma(c, 1)
            accumulate(idx_scr1, upd_scr1)

        return 0

    jax.lax.fori_loop(0, nch, body, 0)
    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def sorted_segment_rows_sum(
    idx_sorted: jnp.ndarray, upd_sorted: jnp.ndarray, n_rows: int, interpret: bool = False
) -> jnp.ndarray:
    """out[r, :] = Σ_{k : idx_sorted[k] == r} upd_sorted[k, :], f32.

    idx_sorted [M] int32 ASCENDING (values in [0, n_rows] — n_rows acts as a
    trash bin for padding); upd_sorted [M, C]. Returns [n_rows, C] f32.
    """
    M, C0 = upd_sorted.shape
    # Mosaic requires lane (minor) dims in multiples of 128
    C = ((C0 + 127) // 128) * 128
    if C != C0:
        upd_sorted = jnp.pad(upd_sorted, ((0, 0), (0, C - C0)))
    n_blocks = pl.cdiv(n_rows, BLOCK_ROWS)
    r_pad = n_blocks * BLOCK_ROWS

    # pad the stream to CHUNK granularity with trash-bin rows so in-kernel
    # DMAs never read past the buffer
    pad = (-M) % CHUNK + CHUNK
    idx_p = jnp.concatenate([idx_sorted, jnp.full((pad,), r_pad, jnp.int32)])
    upd_p = jnp.concatenate([upd_sorted, jnp.zeros((pad, C), upd_sorted.dtype)])

    # block b owns output rows [b*B, (b+1)*B): its update range in the sorted
    # stream is [starts[b], starts[b+1])
    edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * BLOCK_ROWS
    starts = jnp.searchsorted(idx_p, edges, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, C), lambda b, starts: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((CHUNK,), jnp.int32),
            pltpu.VMEM((CHUNK,), jnp.int32),
            pltpu.VMEM((CHUNK, C), upd_sorted.dtype),
            pltpu.VMEM((CHUNK, C), upd_sorted.dtype),
            pltpu.VMEM((BLOCK_ROWS, C), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, C), jnp.float32),
        interpret=interpret,
    )(starts, idx_p, upd_p)
    return out[:n_rows, :C0]


def segment_rows_sum(idx: jnp.ndarray, upd: jnp.ndarray, n_rows: int, interpret: bool = False):
    """Unsorted convenience wrapper: sort + kernel. Gradient-scatter drop-in
    for `zeros(n_rows, C).at[idx].add(upd)` (f32 accumulation)."""
    order = jnp.argsort(idx)
    return sorted_segment_rows_sum(
        jnp.take(idx, order).astype(jnp.int32),
        jnp.take(upd, order, axis=0),
        n_rows,
        interpret=interpret,
    )

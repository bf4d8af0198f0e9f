"""Parity tests for the coalesced-gradient plane sampler (ops/coalesced.py).

The custom VJP must match plain autodiff of the take+weight math exactly
(forward) and numerically (backward), and the Pallas streaming kernel
(interpret mode on CPU) must match the XLA scatter fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodynrf_tpu.ops.coalesced import (
    _coalesce_xla,
    _fwd_math,
    coalesce_table_grad,
    planes_sample,
)

RNG = np.random.default_rng(7)


def _data(M=3000, R=257, C=12, dup_hot=True, dtype=jnp.float32):
    rows = RNG.integers(0, R, M)
    if dup_hot:  # mimic stride-4 duplication hot spots
        rows[: M // 3] = RNG.integers(0, max(R // 40, 2), M // 3)
    table = jnp.asarray(RNG.standard_normal((R, 4 * C)), dtype)
    w4 = jnp.asarray(RNG.uniform(0, 1, (M, 4)), jnp.float32)
    ct = jnp.asarray(RNG.standard_normal((M, C)), jnp.float32)
    return table, jnp.asarray(rows, jnp.int32), w4, ct


def test_forward_matches_naive():
    table, rows, w4, _ = _data()
    got = planes_sample(table, rows, w4)
    want = _fwd_math(table, rows, w4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_backward_matches_autodiff():
    table, rows, w4, ct = _data()

    def loss_custom(t, w):
        return jnp.sum(planes_sample(t, rows, w, "xla") * ct)

    def loss_naive(t, w):
        return jnp.sum(_fwd_math(t, rows, w) * ct)

    gt_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(table, w4)
    gt_n, gw_n = jax.grad(loss_naive, argnums=(0, 1))(table, w4)
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_n), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n), rtol=0, atol=1e-4)


def test_backward_bf16_table():
    """bf16 tables accumulate their cotangent in bf16 — the deliberate
    contract since round 4 (ops/coalesced.py:102): it matches what plain
    autodiff of a bf16 take does (the astype transpose casts the cotangent
    BEFORE the scatter) and what the dynamic merged path always got, and it
    halves the static backward's scatter traffic (PERF.md §13-14).

    Oracle: plain autodiff of the same math. Both sides round per-element
    products and accumulate in bf16 (in possibly different orders), so
    agreement is to bf16-accumulation noise — bounded relative to the
    gradient SCALE, not per-element (near-zero entries from cancellation
    have unbounded relative error in any finite precision)."""
    table, rows, w4, ct = _data(dtype=jnp.bfloat16)

    def loss_custom(t, w):
        return jnp.sum(planes_sample(t, rows, w, "xla") * ct)

    def loss_naive(t, w):
        return jnp.sum(_fwd_math(t, rows, w) * ct)

    gt, gw = jax.grad(loss_custom, argnums=(0, 1))(table, w4)
    gt_n, gw_n = jax.grad(loss_naive, argnums=(0, 1))(table, w4)
    assert gt.dtype == jnp.bfloat16
    a, b = np.asarray(gt, np.float32), np.asarray(gt_n, np.float32)
    scale = float(np.abs(b).max())
    np.testing.assert_allclose(a, b, rtol=0, atol=0.03 * scale)
    np.testing.assert_allclose(
        np.asarray(gw), np.asarray(gw_n), rtol=0, atol=1e-4
    )
    # the coarser bf16 accumulation still tracks the exact f32 accumulation
    # to a few percent of the gradient scale (hot rows here duplicate ~160x)
    f32 = np.asarray(_coalesce_xla(rows, w4, ct, table.shape[0]))
    np.testing.assert_allclose(a, f32, rtol=0, atol=0.05 * scale)


def test_coalesce_xla_matches_dense():
    table, rows, w4, ct = _data(M=500, R=64, C=5)
    got = _coalesce_xla(rows, w4, ct, 64)
    want = np.zeros((64, 20), np.float32)
    for m in range(500):
        want[int(rows[m])] += np.kron(np.asarray(w4[m]), np.asarray(ct[m]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("M,R,C", [(3000, 257, 12), (2048, 64, 8), (100, 1000, 4)])
def test_pallas_interpret_matches_xla(M, R, C):
    table, rows, w4, ct = _data(M=M, R=R, C=C)
    want = _coalesce_xla(rows, w4, ct, R)

    import rodynrf_tpu.ops.coalesced as co
    from unittest import mock

    # interpret-mode pallas_call on CPU
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = co._coalesce_pallas(rows, w4, ct, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_interpret_sorted_and_empty_blocks():
    """Keys concentrated in few blocks far apart: exercises empty-block
    walking and the final-flush tail."""
    R, C, M = 4096, 8, 600
    rows = np.concatenate([
        RNG.integers(0, 10, M // 3),
        RNG.integers(2000, 2010, M // 3),
        RNG.integers(R - 5, R, M - 2 * (M // 3)),
    ])
    table = jnp.asarray(RNG.standard_normal((R, 4 * C)), jnp.float32)
    w4 = jnp.asarray(RNG.uniform(0, 1, (M, 4)), jnp.float32)
    ct = jnp.asarray(RNG.standard_normal((M, C)), jnp.float32)
    rows = jnp.asarray(rows, jnp.int32)
    want = _coalesce_xla(rows, w4, ct, R)

    import rodynrf_tpu.ops.coalesced as co
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = co._coalesce_pallas(rows, w4, ct, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# csum (gather-only sorted prefix-sum-diff) table gradient
# ---------------------------------------------------------------------------


def test_csum_grad_matches_scatter():
    from rodynrf_tpu.ops.coalesced import csum_grad

    M, R, C = 4000, 311, 24
    rows = RNG.integers(0, R, M)
    rows[: M // 4] = RNG.integers(0, 5, M // 4)  # hot rows
    rows = jnp.asarray(rows, jnp.int32)
    u = jnp.asarray(RNG.standard_normal((M, C)), jnp.float32)
    want = jnp.zeros((R, C), jnp.float32).at[rows].add(u)
    got = csum_grad(rows, u, R)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=1e-4 * max(scale, 1.0)
    )


def test_csum_grad_empty_rows_and_extremes():
    """Rows 0 and R-1 never hit + large empty gaps: boundary indexing must
    produce exact zeros for untouched rows."""
    from rodynrf_tpu.ops.coalesced import csum_grad

    R, C = 1000, 6
    rows = jnp.asarray(np.concatenate([
        np.full(50, 1), np.full(70, 500), np.full(30, R - 2)
    ]), jnp.int32)
    u = jnp.asarray(RNG.standard_normal((150, C)), jnp.float32)
    got = np.asarray(csum_grad(rows, u, R))
    want = np.zeros((R, C), np.float32)
    for m, r in enumerate(np.asarray(rows)):
        want[r] += np.asarray(u[m])
    touched = np.zeros(R, bool)
    touched[[1, 500, R - 2]] = True
    assert np.all(got[~touched] == 0.0)
    np.testing.assert_allclose(got[touched], want[touched], rtol=0, atol=1e-4)


def test_csum_grad_bf16_updates():
    from rodynrf_tpu.ops.coalesced import csum_grad

    M, R, C = 2000, 128, 8
    rows = jnp.asarray(RNG.integers(0, R, M), jnp.int32)
    u = jnp.asarray(RNG.standard_normal((M, C)), jnp.float32).astype(jnp.bfloat16)
    want = jnp.zeros((R, C), jnp.float32).at[rows].add(u.astype(jnp.float32))
    got = csum_grad(rows, u, R)  # accumulates in f32 internally
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-3)


def test_merged_sample_forward_bitexact_and_grads():
    """merged_sample (custom VJP) forward must be bit-identical to the inline
    FMA math; table/w gradients must match autodiff for both impls."""
    from rodynrf_tpu.ops.coalesced import merged_sample, _merged_fwd_math

    M, R, nS, C = 600, 97, 3, 5
    rows = jnp.asarray(RNG.integers(0, R, M), jnp.int32)
    table = jnp.asarray(RNG.standard_normal((R, nS * 4 * C)), jnp.float32)
    w = jnp.asarray(RNG.uniform(0, 1, (M, nS, 4)), jnp.float32)
    ct = jnp.asarray(RNG.standard_normal((M, nS, C)), jnp.float32)

    got = merged_sample(table, rows, w, "csum")
    want = _merged_fwd_math(table, rows, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def loss_ref(t, w_):
        return jnp.sum(_merged_fwd_math(t, rows, w_) * ct)

    gt_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(table, w)
    for impl in ("csum", "xla"):
        def loss(t, w_):
            return jnp.sum(merged_sample(t, rows, w_, impl) * ct)

        gt, gw = jax.grad(loss, argnums=(0, 1))(table, w)
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(gt_ref), rtol=0, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gw_ref), rtol=0, atol=1e-4
        )


def test_merged_sample_bf16_table_grad_dtype():
    from rodynrf_tpu.ops.coalesced import merged_sample

    M, R, nS, C = 300, 64, 2, 4
    rows = jnp.asarray(RNG.integers(0, R, M), jnp.int32)
    table = jnp.asarray(
        RNG.standard_normal((R, nS * 4 * C)), jnp.float32
    ).astype(jnp.bfloat16)
    w = jnp.asarray(RNG.uniform(0, 1, (M, nS, 4)), jnp.float32)

    for impl in ("csum", "xla"):
        gt = jax.grad(
            lambda t: jnp.sum(merged_sample(t, rows, w, impl))
        )(table)
        assert gt.dtype == jnp.bfloat16

"""Correctness of the Pallas sorted-segment-row-sum kernel (interpret mode).

The kernel (ops/pallas_segsum.py) is a scatter-add reformulation; on CPU CI
it runs in Pallas interpret mode. Real-hardware parity is checked in the TPU
perf harness (scripts/perf_tpu.py history) — measured exact in bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodynrf_tpu.ops.pallas_segsum import segment_rows_sum, sorted_segment_rows_sum

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("M,C,R", [(5000, 96, 700), (2048, 320, 300), (513, 64, 129)])
def test_matches_scatter_add(M, C, R):
    idx = jax.random.randint(jax.random.PRNGKey(M), (M,), 0, R, jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(M + 1), (M, C), jnp.float32)
    got = segment_rows_sum(idx, upd, R, interpret=True)
    want = jnp.zeros((R, C), jnp.float32).at[idx].add(upd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


def test_skewed_duplicates():
    """Heavy-hitter rows (many duplicates -> multi-chunk blocks) must sum."""
    M, C, R = 9000, 128, 256
    idx = jnp.concatenate(
        [jnp.full((8000,), 7, jnp.int32),
         jax.random.randint(jax.random.PRNGKey(0), (1000,), 0, R, jnp.int32)]
    )
    idx = jnp.sort(idx)
    upd = jnp.ones((M, C), jnp.float32)
    got = sorted_segment_rows_sum(idx, upd, R, interpret=True)
    want = jnp.zeros((R, C), jnp.float32).at[idx].add(upd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-3)


def test_empty_and_full_rows():
    """Rows with zero updates stay zero; bf16 updates accumulate in f32."""
    M, C, R = 1024, 64, 512
    idx = jnp.full((M,), 3, jnp.int32)  # everything lands on one row
    upd = jax.random.normal(jax.random.PRNGKey(2), (M, C), jnp.bfloat16)
    got = segment_rows_sum(idx, upd, R, interpret=True)
    want = jnp.zeros((R, C), jnp.float32).at[idx].add(upd.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-1
    )
    assert float(jnp.max(jnp.abs(got[4:]))) == 0.0

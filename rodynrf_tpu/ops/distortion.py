"""Distortion loss (DVGO / mip-NeRF-360) in O(N) prefix-sum form.

TPU-native replacement for the external CUDA package
``torch_efficient_distloss.flatten_eff_distloss`` used by the reference
(reference: train.py:19-23 import, 1304-1309/1691-1708/1846-1851 call sites).
The pairwise term  Σ_ij w_i w_j |m_i - m_j|  over sorted midpoints reduces to
two cumulative sums — a pure-XLA formulation; no custom kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def eff_distloss(w: jnp.ndarray, m: jnp.ndarray, interval) -> jnp.ndarray:
    """Distortion loss summed over rays.

    w: [R, S] sample weights; m: [R, S] sample midpoints (sorted along S);
    interval: scalar or [R, S] bin width. Equals
    ``Σ_r [ Σ_{i<j} 2 w_i w_j (m_j - m_i) + (1/3) Σ_i interval w_i² ]``,
    matching `torch_efficient_distloss.flatten_eff_distloss` exactly — the
    package sums over the flattened sample axis with no ray normalization
    (verified against the reference run in golden/; a mean-over-rays variant
    here was a measured 64x mismatch at batch 64).
    """
    loss_uni = (1.0 / 3.0) * jnp.sum(interval * w * w)
    wm = w * m
    w_cumsum = jnp.cumsum(w, axis=-1)
    wm_cumsum = jnp.cumsum(wm, axis=-1)
    loss_bi_terms = wm[:, 1:] * w_cumsum[:, :-1] - w[:, 1:] * wm_cumsum[:, :-1]
    loss_bi = 2.0 * jnp.sum(loss_bi_terms)
    return loss_bi + loss_uni


def distloss_naive(w: jnp.ndarray, m: jnp.ndarray, interval) -> jnp.ndarray:
    """O(S²) definition, for testing only."""
    pair = w[:, :, None] * w[:, None, :] * jnp.abs(m[:, :, None] - m[:, None, :])
    loss_bi = jnp.sum(pair)
    loss_uni = (1.0 / 3.0) * jnp.sum(interval * w * w)
    return loss_bi + loss_uni

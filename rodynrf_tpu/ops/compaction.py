"""Fixed-bucket sample compaction: per-ray top-K selection without scatters.

The reference skips its appearance MLP on samples failing
`app_mask = weight > rm_weight_mask_thre` (reference: tensorBase.py:774-804),
a data-dependent boolean compaction that XLA cannot express with static
shapes. The TPU-native equivalent is a FIXED per-ray bucket: keep the K
highest-weight samples of each ray (K static), evaluate appearance only on
those, and zero-fill the rest — exactly the reference's semantics whenever a
ray's above-threshold occupancy is <= K.

Both directions of the compaction are flat ROW ops — the same primitive
shape the fused sampler's takes use (ops/fused_vm.py), which is where this
part's measured gather rate lives:

  compact_rows  [R,S,C] -> [R,K,C]   fwd: flat row take (bit-exact gather)
                                     bwd: unique-index row scatter-set
  expand_rows   [R,K,C] -> [R,S,C]   fwd: unique-index row scatter-set
                                     bwd: flat row take (bit-exact gather)

top_k yields per-row unique sample indices, so the flattened row indices
are globally unique: the scatter is `set` into zeros with
unique_indices=True — embarrassingly parallel (no sorting network, no
serialized accumulation) and bit-exact. An earlier formulation used
one-hot MXU matmuls for the scatter direction; measured 26-133 ms per
instance at the real [7168, 270] x K=72 shapes (batched tiny matmuls — the
MXU runs 7168 separate 270x72 contractions), vs single-digit ms for the
flat scatter. Numbers in PERF.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def topk_select(weight: jnp.ndarray, k: int, thres: float):
    """Per-ray appearance bucket: indices of the K highest-weight samples.

    weight [R, S] (per-field volume-rendering weight, tensorBase.py:774).
    Returns (idx [R, K] int32, keep [R, K] f32) where keep applies the
    reference's `weight > thres` zeroing in compacted space. Selection is
    detached — the reference's boolean mask carries no gradient either.
    """
    vals, idx = jax.lax.top_k(jax.lax.stop_gradient(weight), k)
    keep = (vals > thres).astype(jnp.float32)
    return idx, keep


def _flat_idx(idx: jnp.ndarray, s: int) -> jnp.ndarray:
    # [R, K] per-row sample indices -> [R*K] row indices into [R*S, C]
    r = idx.shape[0]
    return (jnp.arange(r, dtype=idx.dtype)[:, None] * s + idx).reshape(-1)


def _gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    # [R, S, C] -> [R, K, C] as one flat row take
    r, s, c = x.shape
    k = idx.shape[1]
    return jnp.take(x.reshape(r * s, c), _flat_idx(idx, s), axis=0).reshape(r, k, c)


def _scatter_rows(x_k: jnp.ndarray, idx: jnp.ndarray, s: int) -> jnp.ndarray:
    # [R, K, C] -> [R, S, C]: zero-fill `set` at globally-unique row indices
    r, k, c = x_k.shape
    out = jnp.zeros((r * s, c), x_k.dtype)
    out = out.at[_flat_idx(idx, s)].set(
        x_k.reshape(r * k, c), unique_indices=True, mode="promise_in_bounds"
    )
    return out.reshape(r, s, c)


@partial(jax.custom_vjp, nondiff_argnums=())
def compact_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Select rows idx [R, K] from x [R, S, C] -> [R, K, C] (bit-exact)."""
    return _gather_rows(x, idx)


def _compact_fwd(x, idx):
    return _gather_rows(x, idx), (idx, x.shape[1])


def _compact_bwd(res, ct):
    idx, s = res
    return _scatter_rows(ct, idx, s), None


compact_rows.defvjp(_compact_fwd, _compact_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def expand_rows(x_k: jnp.ndarray, idx: jnp.ndarray, s: int) -> jnp.ndarray:
    """Zero-fill rows x_k [R, K, C] at positions idx [R, K] -> [R, S, C]."""
    return _scatter_rows(x_k, idx, s)


def _expand_fwd(x_k, idx, s):
    return _scatter_rows(x_k, idx, s), idx


def _expand_bwd(s, idx, ct):
    return _gather_rows(ct, idx), None


expand_rows.defvjp(_expand_fwd, _expand_bwd)

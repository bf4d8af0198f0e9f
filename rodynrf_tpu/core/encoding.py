"""Sinusoidal positional encoding.

Semantics match the reference encoder (reference: models/tensorBase.py:13-19):
for input of last-dim D and F frequency bands, the output is
``concat([sin(x_d * 2^f) for d,f in row-major (d,f) order],
         [cos(...) same order])`` with shape ``(..., 2*F*D)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """Encode ``x`` (..., D) into (..., 2*freqs*D) sin/cos features."""
    freq_bands = 2.0 ** jnp.arange(freqs, dtype=x.dtype)  # (F,)
    # (..., D, F) -> (..., D*F): dim-major ordering, matching the reference.
    pts = (x[..., None] * freq_bands).reshape(*x.shape[:-1], freqs * x.shape[-1])
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)

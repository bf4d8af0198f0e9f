"""Grid regularizers: total variation, density L1, line orthogonality.

Functional equivalents of the reference's TVLoss (utils.py:157-181),
density_L1 (tensoRF.py:80-98), and vectorDiffs (tensoRF.py:63-78).

Note on a fixed reference bug: the reference applies its 2D TVLoss to line
grids of shape [1, C, L, 1], whose width-axis term divides 0/0 and yields
NaN (utils.py:168-174, verified empirically). Here line TV uses only the
length axis — the clearly intended semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def tv_loss_plane(plane: jnp.ndarray) -> jnp.ndarray:
    """TV over a [C, H, W] plane: 2*(h_tv/count_h + w_tv/count_w)
    (reference: utils.py:162-174 with batch 1)."""
    C, H, W = plane.shape
    h_tv = jnp.sum((plane[:, 1:, :] - plane[:, :-1, :]) ** 2)
    w_tv = jnp.sum((plane[:, :, 1:] - plane[:, :, :-1]) ** 2)
    count_h = C * (H - 1) * W
    count_w = C * H * (W - 1)
    return 2.0 * (h_tv / count_h + w_tv / count_w)


def tv_loss_line(line: jnp.ndarray) -> jnp.ndarray:
    """TV over a [C, L] line along its length axis (fixed reference NaN bug)."""
    C, L = line.shape
    h_tv = jnp.sum((line[:, 1:] - line[:, :-1]) ** 2)
    return 2.0 * h_tv / (C * (L - 1))


def tv_loss_vm(planes, lines, plane_w: float = 1e-2, line_w: float = 1e-3) -> jnp.ndarray:
    """Σ_axes plane_w*TV(plane) + line_w*TV(line)
    (reference: tensoRF.py:100-116, 418-444)."""
    total = 0.0
    for p, l in zip(planes, lines):
        total = total + plane_w * tv_loss_plane(p) + line_w * tv_loss_line(l)
    return total


def vm_outer_l1(planes, lines, feature2density) -> jnp.ndarray:
    """mean |feature2density(Σ_axes plane ⊗ line)| over the dense volume
    (reference: tensoRF.py:80-98 density_L1 / 398-416 blending_L1).

    The reference materializes three [1, C, X, Y, Z] outer products and sums
    channels. Equivalent einsum form: for each axis i the dense contribution
    is Σ_c plane_c[m1, m0] * line_c[v]; summed over the 3 axis layouts into a
    full [X, Y, Z] volume.
    """
    # matMode/vecMode: axis0 plane [C, y, x], line z; axis1 plane [C, z, x],
    # line y; axis2 plane [C, z, y], line x.
    A = jnp.einsum("cyx,cz->xyz", planes[0], lines[0])
    B = jnp.einsum("czx,cy->xyz", planes[1], lines[1])
    Cc = jnp.einsum("czy,cx->xyz", planes[2], lines[2])
    return jnp.mean(jnp.abs(feature2density(A + B + Cc)))


def line_orthogonality(lines) -> jnp.ndarray:
    """Mean |off-diagonal Gram| of each line basis
    (reference: tensoRF.py:63-75 vectorDiffs)."""
    total = 0.0
    for line in lines:
        n_comp = line.shape[0]
        gram = line @ line.T  # [C, C]
        off = gram - jnp.diag(jnp.diag(gram))
        total = total + jnp.sum(jnp.abs(off)) / (n_comp * (n_comp - 1))
    return total

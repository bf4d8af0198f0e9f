"""Shading MLP heads and small-MLP building blocks.

Functional equivalents of the reference's render modules
(reference: models/tensorBase.py:37-278): `MLP_Fea`, `MLP_Fea_TimeEmbedding`,
`MLP_Fea_late_view`, `MLP_Fea_woView`, `MLP_PE`, `MLP`, `RGB` passthrough.

Initialization mirrors `torch.nn.Linear` defaults (kaiming-uniform a=√5 ⇒
U(±1/√fan_in) for both weight and bias) with the final layer's bias zeroed,
as the reference does (tensorBase.py:99 etc.).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.encoding import positional_encoding


def linear_init(key: jax.Array, fan_in: int, fan_out: int, zero_bias: bool = False):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = (
        jnp.zeros((fan_out,), jnp.float32)
        if zero_bias
        else jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    )
    return {"w": w, "b": b}


def linear(p, x):
    return x @ p["w"] + p["b"]


def mlp_init(key: jax.Array, dims: Sequence[int], zero_last_bias: bool = False):
    """Init a ReLU MLP with layer dims [d0, d1, ..., dn]."""
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, k in enumerate(keys):
        last = i == len(dims) - 2
        layers.append(linear_init(k, dims[i], dims[i + 1], zero_bias=zero_last_bias and last))
    return layers


def mlp_apply(layers, x):
    for i, p in enumerate(layers):
        x = linear(p, x)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# Shading heads. Each is (init(key, app_dim, view_pe, fea_pe, pos_pe,
# featureC) -> params, apply(params, cfg-ints, pts, viewdirs, feats, time)
# -> rgb). ``pts``/``viewdirs`` are normalized coords/directions [N, 3],
# feats [N, app_dim], time [N, 1] (or None for modes that ignore it).
# ---------------------------------------------------------------------------

def init_shading(key, mode, app_dim, view_pe, fea_pe, pos_pe, featureC):
    if mode == "MLP_Fea":
        in_c = 2 * view_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim
        return {"mlp": mlp_init(key, [in_c, featureC, featureC, 3], zero_last_bias=True)}
    if mode == "MLP_Fea_TimeEmbedding":
        in_c = 2 * fea_pe * app_dim + app_dim
        in_view = 2 * view_pe * 3 + 3
        k1, k2 = jax.random.split(key)
        return {
            "mlp": mlp_init(k1, [in_c, featureC, featureC]),
            "mlp_view": mlp_init(k2, [featureC + in_view, 3], zero_last_bias=True),
        }
    if mode == "MLP_Fea_late_view":
        in_c = 2 * fea_pe * app_dim + app_dim + 2 * 10 * 3 + 3 + 2 * 8 * 1 + 1
        in_view = 2 * view_pe * 3 + 3
        k1, k2 = jax.random.split(key)
        return {
            "mlp": mlp_init(k1, [in_c, featureC, featureC]),
            "mlp_view": mlp_init(k2, [featureC + in_view, 3], zero_last_bias=True),
        }
    if mode == "MLP_Fea_woView":
        in_c = 2 * view_pe * 3 + 2 * fea_pe * app_dim + app_dim
        return {"mlp": mlp_init(key, [in_c, featureC, featureC, 3], zero_last_bias=True)}
    if mode == "MLP_PE":
        in_c = (3 + 2 * view_pe * 3) + (3 + 2 * pos_pe * 3) + app_dim
        return {"mlp": mlp_init(key, [in_c, featureC, featureC, 3], zero_last_bias=True)}
    if mode == "MLP":
        in_c = (3 + 2 * view_pe * 3) + app_dim
        return {"mlp": mlp_init(key, [in_c, featureC, featureC, 3], zero_last_bias=True)}
    if mode == "RGB":
        assert app_dim == 3
        return {}
    raise ValueError(f"Unrecognized shading mode {mode}")


def apply_shading(params, mode, view_pe, fea_pe, pos_pe, pts, viewdirs, feats, time):
    """Dispatch matching reference forward passes (tensorBase.py:101-278)."""
    if mode == "RGB":
        return feats

    if mode == "MLP_Fea":
        indata = [feats, viewdirs]
        if fea_pe > 0:
            indata.append(positional_encoding(feats, fea_pe))
        if view_pe > 0:
            indata.append(positional_encoding(viewdirs, view_pe))
        return jax.nn.sigmoid(mlp_apply(params["mlp"], jnp.concatenate(indata, -1)))

    if mode == "MLP_Fea_TimeEmbedding":
        indata = [feats]
        if fea_pe > 0:
            indata.append(positional_encoding(feats, fea_pe))
        indata_view = [viewdirs]
        if view_pe > 0:
            indata_view.append(positional_encoding(viewdirs, view_pe))
        inter = mlp_apply(params["mlp"], jnp.concatenate(indata, -1))
        inter = jax.nn.relu(inter)
        view_in = jnp.concatenate([inter] + indata_view, -1)
        return jax.nn.sigmoid(mlp_apply(params["mlp_view"], view_in))

    if mode == "MLP_Fea_late_view":
        vd = jax.lax.stop_gradient(viewdirs)  # reference detaches viewdirs here
        indata = [feats]
        if fea_pe > 0:
            indata.append(positional_encoding(feats, fea_pe))
        indata += [pts, positional_encoding(pts, 10), time, positional_encoding(time, 8)]
        indata_view = [vd]
        if view_pe > 0:
            indata_view.append(positional_encoding(vd, view_pe))
        inter = mlp_apply(params["mlp"], jnp.concatenate(indata, -1))
        inter = jax.nn.relu(inter)
        view_in = jnp.concatenate([inter] + indata_view, -1)
        return jax.nn.sigmoid(mlp_apply(params["mlp_view"], view_in))

    if mode == "MLP_Fea_woView":
        indata = [feats]
        if fea_pe > 0:
            indata.append(positional_encoding(feats, fea_pe))
        return jax.nn.sigmoid(mlp_apply(params["mlp"], jnp.concatenate(indata, -1)))

    if mode == "MLP_PE":
        # raw pts is part of in_c at init ((3 + 2*pos_pe*3) block); the
        # reference's MLPRender_PE.forward omits it and therefore crashes on
        # a channel mismatch whenever this mode is selected
        # (tensorBase.py:165-199 init vs forward) — fixed, not copied.
        indata = [feats, viewdirs, pts]
        if pos_pe > 0:
            indata.append(positional_encoding(pts, pos_pe))
        if view_pe > 0:
            indata.append(positional_encoding(viewdirs, view_pe))
        return jax.nn.sigmoid(mlp_apply(params["mlp"], jnp.concatenate(indata, -1)))

    if mode == "MLP":
        indata = [feats, viewdirs]
        if view_pe > 0:
            indata.append(positional_encoding(viewdirs, view_pe))
        return jax.nn.sigmoid(mlp_apply(params["mlp"], jnp.concatenate(indata, -1)))

    raise ValueError(f"Unrecognized shading mode {mode}")

"""LPIPS perceptual metric, TPU-native JAX (AlexNet and VGG16 backbones).

The reference scores LPIPS through the `lpips` pip package
(reference: utils.py:68-84, renderer.py:956-964 writes lpips_alex/lpips_vgg
into mean.txt). That package is torch + downloaded weights; this module is a
from-scratch JAX implementation of the same metric (Zhang et al. 2018,
version 0.1 semantics: scaling layer, backbone feature taps, per-channel
unit normalization, learned non-negative 1x1 "lin" weights, spatial mean,
layer sum; inputs in [0, 1] with normalize=True mapping to [-1, 1]).

Weights convert from a torch `lpips.LPIPS(net=...).state_dict()` dump via
``load_lpips_torch_checkpoint`` (keys: scaling_layer.*, net.sliceK.i.*,
linK.model.1.weight). In zero-egress environments with no weights the
architecture is still exercised by random-weight parity tests
(tests/test_lpips.py).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# conv plans: (kernel, stride, pad, in_ch, out_ch, maxpool_before)
_ALEX_PLAN = [
    (11, 4, 2, 3, 64, False),
    (5, 1, 2, 64, 192, True),
    (3, 1, 1, 192, 384, True),
    (3, 1, 1, 384, 256, False),
    (3, 1, 1, 256, 256, False),
]
_ALEX_TAPS = [0, 1, 2, 3, 4]  # tap after every conv's relu

_VGG_CH = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_VGG_POOL_BEFORE = {2, 4, 7, 10}
_VGG_PLAN = [
    (3, 1, 1, (3 if i == 0 else _VGG_CH[i - 1]), _VGG_CH[i], i in _VGG_POOL_BEFORE)
    for i in range(13)
]
_VGG_TAPS = [1, 3, 6, 9, 12]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

PLANS = {"alex": (_ALEX_PLAN, _ALEX_TAPS), "vgg": (_VGG_PLAN, _VGG_TAPS)}

# lpips scaling layer constants (ImageNet statistics over [-1, 1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _maxpool_3x2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2) — VALID, no padding."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _backbone_features(params: Dict, x: jnp.ndarray, net: str) -> List[jnp.ndarray]:
    plan, taps = PLANS[net]
    feats = []
    for i, (k, stride, pad, _, _, pool) in enumerate(plan):
        if pool:
            x = _maxpool_3x2(x)
        w, b = params["convs"][i]["w"], params["convs"][i]["b"]
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x)
        if i in taps:
            feats.append(x)
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Channel-wise unit L2 norm (lpips normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips(params: Dict, img0: jnp.ndarray, img1: jnp.ndarray, net: str = "alex") -> jnp.ndarray:
    """LPIPS distance between [N, H, W, 3] images in [0, 1] -> [N]."""
    shift = params.get("shift", jnp.asarray(_SHIFT))
    scale = params.get("scale", jnp.asarray(_SCALE))

    def prep(img):
        return (2.0 * img - 1.0 - shift) / scale

    f0 = _backbone_features(params, prep(img0), net)
    f1 = _backbone_features(params, prep(img1), net)
    total = 0.0
    for a, b, lin_w in zip(f0, f1, params["lins"]):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        # learned non-negative 1x1 conv (no bias), then spatial mean
        total = total + jnp.mean(jnp.sum(diff * lin_w, axis=-1), axis=(1, 2))
    return total


def load_lpips_torch_checkpoint(path: str, net: str = "alex") -> Dict:
    """Convert a torch-saved full ``lpips.LPIPS(net=...).state_dict()``
    (scaling_layer.shift/scale, net.sliceK.i.weight/bias, linK.model.1.weight)
    to our params pytree."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(raw, dict):
        raw = raw.state_dict()
    sd = {k: v.detach().numpy() for k, v in raw.items()}
    return convert_lpips_state_dict(sd, net)


def convert_lpips_state_dict(sd: Dict[str, np.ndarray], net: str = "alex") -> Dict:
    plan, taps = PLANS[net]
    # conv layers ordered by (slice number, in-slice torchvision index)
    conv_keys: List[Tuple[int, int]] = sorted(
        (int(m.group(1)), int(m.group(2)))
        for k in sd
        if (m := re.fullmatch(r"net\.slice(\d+)\.(\d+)\.weight", k))
    )
    if len(conv_keys) != len(plan):
        raise ValueError(f"expected {len(plan)} convs for {net}, found {len(conv_keys)}")
    convs = []
    for s, i in conv_keys:
        w = sd[f"net.slice{s}.{i}.weight"].transpose(2, 3, 1, 0).copy()  # OIHW->HWIO
        b = sd[f"net.slice{s}.{i}.bias"].copy()
        convs.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    lins = [
        jnp.asarray(sd[f"lin{k}.model.1.weight"][0, :, 0, 0].copy())
        for k in range(len(taps))
    ]
    params: Dict = {"convs": convs, "lins": lins}
    if "scaling_layer.shift" in sd:
        params["shift"] = jnp.asarray(sd["scaling_layer.shift"].reshape(3))
        params["scale"] = jnp.asarray(sd["scaling_layer.scale"].reshape(3))
    return params


def init_lpips_params(key: jax.Array, net: str = "alex") -> Dict:
    """Random weights with the right architecture (parity tests / smoke)."""
    plan, taps = PLANS[net]
    keys = iter(jax.random.split(key, 2 * len(plan) + len(taps)))
    convs = []
    for k, stride, pad, cin, cout, _ in plan:
        s = 1.0 / np.sqrt(k * k * cin)
        convs.append(
            {
                "w": jax.random.uniform(next(keys), (k, k, cin, cout), jnp.float32, -s, s),
                "b": jax.random.uniform(next(keys), (cout,), jnp.float32, -s, s),
            }
        )
    lins = [
        jax.random.uniform(next(keys), (plan[t][4],), jnp.float32, 0.0, 0.1)
        for t in taps
    ]
    return {"convs": convs, "lins": lins}

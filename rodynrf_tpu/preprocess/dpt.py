"""DPT-Large monocular depth (ViT-L/16 backbone), TPU-native JAX.

Re-implementation of the vendored MiDaS/DPT model the reference uses for
depth priors (reference: scripts/midas/dpt_depth.py:28-123 DPTDepthModel,
vit.py:185-493 ViT backbone + reassemble, blocks.py:233-343 refinenet
fusion; config: vitl16_384, hooks [5, 11, 17, 23], reassemble features
[256, 512, 1024, 1024], scratch features 256, readout "project",
generate_DPT.py:39-60).

Architecture (inference): ViT-L/16 over [N, H, W, 3] with interpolated
position embeddings -> 4 hooked token maps -> project-readout + 1x1 conv +
resample to strides {4, 8, 16, 32} -> 3x3 layer_rn convs -> 4 refinenet
fusion stages (residual conv units + x2 upsample) -> depth head.

Weights convert from the official dpt_large-midas checkpoint via
``load_dpt_torch_checkpoint`` (timm ViT naming).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")


def conv2d(p, x, stride=1, padding=None):
    # default: torch-style symmetric (k-1)//2 padding — XLA "SAME" pads
    # asymmetrically for stride 2 (act_postprocess4's 3x3/2 resample,
    # vit.py:280-287) and would break torch parity
    if padding is None:
        kh, kw = p["w"].shape[:2]
        padding = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding, dimension_numbers=DN
    )
    return out + p["b"] if "b" in p else out


def conv_transpose2d(p, x, stride):
    # transpose_kernel=True gives torch ConvTranspose2d semantics (gradient-of-
    # conv): kernel spatially flipped, I/O roles swapped. The weight here is
    # the torch [in, out, kh, kw] tensor permuted to [kh, kw, out, in].
    out = jax.lax.conv_transpose(
        x, p["w"], (stride, stride), "VALID", dimension_numbers=DN,
        transpose_kernel=True,
    )
    return out + p["b"]


def layer_norm(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def linear(p, x):
    return x @ p["w"] + p["b"]


def _interp_matrix_half_pixel(n_out: int, n_in: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n_out, n_in] 1D linear interpolation matrix with half-pixel centers
    (torch F.interpolate align_corners=False semantics)."""
    pos = (jnp.arange(n_out, dtype=dtype) + 0.5) * (n_in / n_out) - 0.5
    pos = jnp.clip(pos, 0.0, n_in - 1.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(n_in - 2, 0))
    w = pos - i0
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), dtype)
    m = m.at[rows, i0].add(1.0 - w)
    m = m.at[rows, jnp.minimum(i0 + 1, n_in - 1)].add(w)
    return m


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners=True) -> jnp.ndarray:
    """[N, H, W, C] bilinear resize (matmul form). align_corners=False uses
    half-pixel centers, matching torch F.interpolate's default — the
    reference's ViT pos-embed resize relies on it (vit.py:103-117)."""
    from ..ops.grid_sample import _interp_matrix

    N, H, W, C = x.shape
    H2, W2 = out_hw
    make = _interp_matrix if align_corners else _interp_matrix_half_pixel
    Mh = make(H2, H, x.dtype)
    Mw = make(W2, W, x.dtype)
    return jnp.einsum(
        "hH,nHWc,wW->nhwc", Mh, x, Mw, precision=jax.lax.Precision.HIGHEST
    )


# ---------------------------------------------------------------------------
# ViT-L/16 backbone
# ---------------------------------------------------------------------------

from dataclasses import dataclass


@dataclass(frozen=True)
class DPTConfig:
    dim: int = 1024
    heads: int = 16
    blocks: int = 24
    hooks: tuple = (5, 11, 17, 23)
    patch: int = 16
    reassemble: tuple = (256, 512, 1024, 1024)
    features: int = 256


DPT_LARGE = DPTConfig()

# module-level aliases for the vitl16_384 configuration
VIT_DIM = DPT_LARGE.dim
VIT_HEADS = DPT_LARGE.heads
VIT_BLOCKS = DPT_LARGE.blocks
HOOKS = DPT_LARGE.hooks
PATCH = DPT_LARGE.patch


def vit_block(p, x, heads=VIT_HEADS):
    h = layer_norm(p["norm1"], x)
    N, T, C = h.shape
    qkv = linear(p["qkv"], h).reshape(N, T, 3, heads, C // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("nthd,nshd->nhts", q, k) / np.sqrt(C // heads)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("nhts,nshd->nthd", attn, v).reshape(N, T, C)
    x = x + linear(p["proj"], out)
    h = layer_norm(p["norm2"], x)
    h = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h), approximate=False))
    return x + h


def vit_forward(p, x: jnp.ndarray, cfg: DPTConfig = DPT_LARGE) -> List[jnp.ndarray]:
    """[N, H, W, 3] (ImageNet-normalized) -> hooked token activations
    [N, 1+hw, C] at cfg.hooks."""
    N, H, W, _ = x.shape
    dim = cfg.dim
    gh, gw = H // cfg.patch, W // cfg.patch
    tokens = conv2d(p["patch_embed"], x, stride=cfg.patch, padding="VALID")
    tokens = tokens.reshape(N, gh * gw, dim)

    pos = p["pos_embed"]  # [1, 1+g0*g0, C] at the training grid
    g0 = int(np.sqrt(pos.shape[1] - 1))
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    if (gh, gw) != (g0, g0):
        # reference _resize_pos_embed uses align_corners=False (vit.py:103-117)
        grid_pos = resize_bilinear(
            grid_pos.reshape(1, g0, g0, dim), (gh, gw), align_corners=False
        )
        grid_pos = grid_pos.reshape(1, gh * gw, dim)
    cls_tok = jnp.broadcast_to(p["cls_token"], (N, 1, dim))
    x = jnp.concatenate([cls_tok, tokens], 1) + jnp.concatenate([cls_pos, grid_pos], 1)

    outs = []
    for i in range(cfg.blocks):
        x = vit_block(p[f"block{i}"], x, cfg.heads)
        if i in cfg.hooks:
            outs.append(x)
    return outs


# ---------------------------------------------------------------------------
# Reassemble + fusion
# ---------------------------------------------------------------------------

def project_readout(p, tokens):
    """'project' readout: concat cls token to each patch token, project back
    (reference: vit.py:36-56 ProjectReadout)."""
    cls_tok = jnp.broadcast_to(tokens[:, :1], tokens[:, 1:].shape)
    feats = jnp.concatenate([tokens[:, 1:], cls_tok], -1)
    return jax.nn.gelu(linear(p, feats), approximate=False)


def reassemble(p, tokens, gh, gw, stage: int, cfg: DPTConfig = DPT_LARGE):
    """tokens -> spatial map at the stage's stride (vit.py:205-290
    act_postprocess1-4): project readout, 1x1 conv, then x4/x2 transposed
    conv (stages 1-2), identity (3), or 3x3/2 conv (4)."""
    x = project_readout(p["readout"], tokens)
    N = x.shape[0]
    x = x.reshape(N, gh, gw, x.shape[-1])
    x = conv2d(p["project"], x)  # 1x1 -> stage channels
    if stage == 0:
        x = conv_transpose2d(p["resample"], x, 4)
    elif stage == 1:
        x = conv_transpose2d(p["resample"], x, 2)
    elif stage == 3:
        x = conv2d(p["resample"], x, stride=2)
    return x


def residual_conv_unit(p, x):
    """(blocks.py:233-290, use_bn=False)."""
    out = jax.nn.relu(x)
    out = conv2d(p["conv1"], out)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out)
    return out + x


def fusion_block(p, x, skip=None):
    """(blocks.py:293-343 FeatureFusionBlock_custom)."""
    if skip is not None:
        x = x + residual_conv_unit(p["rcu1"], skip)
    x = residual_conv_unit(p["rcu2"], x)
    N, H, W, C = x.shape
    x = resize_bilinear(x, (2 * H, 2 * W))
    return conv2d(p["out_conv"], x)


# MiDaS DPT normalization (reference: generate_DPT.py:60
# NormalizeImage(mean=[0.5]*3, std=[0.5]*3))
IMAGENET_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
IMAGENET_STD = np.array([0.5, 0.5, 0.5], np.float32)


def dpt_forward(params: Dict, image: jnp.ndarray, cfg: DPTConfig = DPT_LARGE) -> jnp.ndarray:
    """[N, H, W, 3] in [0, 1] -> inverse depth [N, H, W]
    (reference: dpt_depth.py:69-123). H, W must be multiples of 32."""
    x = (image - IMAGENET_MEAN) / IMAGENET_STD
    N, H, W, _ = x.shape
    gh, gw = H // cfg.patch, W // cfg.patch

    hooked = vit_forward(params["vit"], x, cfg)
    layers = [
        reassemble(params[f"post{i + 1}"], h, gh, gw, i, cfg) for i, h in enumerate(hooked)
    ]
    rn = [conv2d(params[f"layer{i + 1}_rn"], l) for i, l in enumerate(layers)]

    path4 = fusion_block(params["refinenet4"], rn[3])
    path3 = fusion_block(params["refinenet3"], path4, rn[2])
    path2 = fusion_block(params["refinenet2"], path3, rn[1])
    path1 = fusion_block(params["refinenet1"], path2, rn[0])

    h = conv2d(params["head.conv1"], path1)
    h = resize_bilinear(h, (h.shape[1] * 2, h.shape[2] * 2))
    h = jax.nn.relu(conv2d(params["head.conv2"], h))
    out = jax.nn.relu(conv2d(params["head.conv3"], h))
    return out[..., 0]


# ---------------------------------------------------------------------------
# torch checkpoint conversion (dpt_large-midas-2f21e586.pt)
# ---------------------------------------------------------------------------

def _c(sd, name, transpose=True):
    p = {"w": sd[f"{name}.weight"].transpose(2, 3, 1, 0).copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def _ct(sd, name):
    # torch ConvTranspose2d weight is [in, out, kh, kw] -> HWIO with flipped roles
    w = sd[f"{name}.weight"]
    return {"w": w.transpose(2, 3, 1, 0).copy(), "b": sd[f"{name}.bias"].copy()}


def _lin(sd, name):
    return {"w": sd[f"{name}.weight"].T.copy(), "b": sd[f"{name}.bias"].copy()}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}


def load_dpt_torch_checkpoint(path: str) -> Dict:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    sd = {k: v.detach().numpy() for k, v in raw.items()}

    vit = {
        "patch_embed": _c(sd, "pretrained.model.patch_embed.proj"),
        "pos_embed": sd["pretrained.model.pos_embed"].copy(),
        "cls_token": sd["pretrained.model.cls_token"].copy(),
    }
    for i in range(VIT_BLOCKS):
        b = f"pretrained.model.blocks.{i}"
        vit[f"block{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "qkv": _lin(sd, f"{b}.attn.qkv"),
            "proj": _lin(sd, f"{b}.attn.proj"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "fc1": _lin(sd, f"{b}.mlp.fc1"),
            "fc2": _lin(sd, f"{b}.mlp.fc2"),
        }

    params: Dict = {"vit": vit}
    for i in range(4):
        pp = f"pretrained.act_postprocess{i + 1}"
        blk = {
            "readout": _lin(sd, f"{pp}.0.project.0"),
            "project": _c(sd, f"{pp}.3"),
        }
        if i in (0, 1):
            blk["resample"] = _ct(sd, f"{pp}.4")
        elif i == 3:
            blk["resample"] = _c(sd, f"{pp}.4")
        params[f"post{i + 1}"] = blk

    for i in range(4):
        params[f"layer{i + 1}_rn"] = _c(sd, f"scratch.layer{i + 1}_rn")
        rf = f"scratch.refinenet{i + 1}"
        params[f"refinenet{i + 1}"] = {
            "rcu1": {
                "conv1": _c(sd, f"{rf}.resConfUnit1.conv1"),
                "conv2": _c(sd, f"{rf}.resConfUnit1.conv2"),
            },
            "rcu2": {
                "conv1": _c(sd, f"{rf}.resConfUnit2.conv1"),
                "conv2": _c(sd, f"{rf}.resConfUnit2.conv2"),
            },
            "out_conv": _c(sd, f"{rf}.out_conv"),
        }

    params["head.conv1"] = _c(sd, "scratch.output_conv.0")
    params["head.conv2"] = _c(sd, "scratch.output_conv.2")
    params["head.conv3"] = _c(sd, "scratch.output_conv.4")
    return params


def init_dpt_params(key: jax.Array, cfg: DPTConfig = DPT_LARGE) -> Dict:
    """Random params with the given architecture (shape tests / no-weights
    environments)."""
    keys = iter(jax.random.split(key, 64 + 8 * cfg.blocks))

    def conv(kh, kw, cin, cout, bias=True):
        s = 1.0 / np.sqrt(kh * kw * cin)
        p = {"w": jax.random.uniform(next(keys), (kh, kw, cin, cout), jnp.float32, -s, s)}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    def lin(cin, cout):
        s = 1.0 / np.sqrt(cin)
        return {
            "w": jax.random.uniform(next(keys), (cin, cout), jnp.float32, -s, s),
            "b": jnp.zeros((cout,)),
        }

    def ln(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    dim, f = cfg.dim, cfg.features
    g0 = 384 // cfg.patch
    vit = {
        "patch_embed": conv(cfg.patch, cfg.patch, 3, dim),
        "pos_embed": 0.02 * jax.random.normal(next(keys), (1, 1 + g0 * g0, dim)),
        "cls_token": jnp.zeros((1, 1, dim)),
    }
    for i in range(cfg.blocks):
        vit[f"block{i}"] = {
            "norm1": ln(dim),
            "qkv": lin(dim, 3 * dim),
            "proj": lin(dim, dim),
            "norm2": ln(dim),
            "fc1": lin(dim, 4 * dim),
            "fc2": lin(4 * dim, dim),
        }
    params: Dict = {"vit": vit}
    for i, ch in enumerate(cfg.reassemble):
        blk = {"readout": lin(2 * dim, dim), "project": conv(1, 1, dim, ch)}
        if i == 0:
            blk["resample"] = conv(4, 4, ch, ch)
        elif i == 1:
            blk["resample"] = conv(2, 2, ch, ch)
        elif i == 3:
            blk["resample"] = conv(3, 3, ch, ch)
        params[f"post{i + 1}"] = blk
        params[f"layer{i + 1}_rn"] = conv(3, 3, ch, f, bias=False)
    for i in range(4):
        params[f"refinenet{i + 1}"] = {
            "rcu1": {"conv1": conv(3, 3, f, f), "conv2": conv(3, 3, f, f)},
            "rcu2": {"conv1": conv(3, 3, f, f), "conv2": conv(3, 3, f, f)},
            "out_conv": conv(1, 1, f, f),
        }
    params["head.conv1"] = conv(3, 3, f, f // 2)
    params["head.conv2"] = conv(3, 3, f // 2, 32)
    params["head.conv3"] = conv(1, 1, 32, 1)
    return params

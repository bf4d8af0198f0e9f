"""Minimal timm shim: just enough of timm's VisionTransformer for the
reference's vendored MiDaS/DPT backbone factory (reference
scripts/midas/vit.py:296-310 uses timm.create_model("vit_large_patch16_384")
and then only touches .patch_embed.proj/.pos_embed/.cls_token/.pos_drop/
.blocks/.norm plus the injected forward_flex). timm is not installed in this
environment; this shim reproduces timm 0.4-era ViT block math exactly
(pre-norm residual attention + MLP, qkv bias, exact GELU, LayerNorm eps 1e-6)
so that DPTDepthModel can be built with random weights for conversion-parity
testing against rodynrf_tpu.preprocess.dpt.
"""

import math

import torch
import torch.nn as nn


class _Attention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, C // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim, dim * 4)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class _PatchEmbed(nn.Module):
    def __init__(self, dim, patch=16):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)


class VisionTransformer(nn.Module):
    def __init__(self, img_size=384, patch=16, dim=1024, depth=24, heads=16):
        super().__init__()
        g = img_size // patch
        self.patch_embed = _PatchEmbed(dim, patch)
        self.cls_token = nn.Parameter(0.02 * torch.randn(1, 1, dim))
        self.pos_embed = nn.Parameter(0.02 * torch.randn(1, 1 + g * g, dim))
        self.pos_drop = nn.Dropout(0.0)
        self.blocks = nn.ModuleList(_Block(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)


_MODELS = {
    "vit_large_patch16_384": dict(img_size=384, patch=16, dim=1024, depth=24, heads=16),
    "vit_base_patch16_384": dict(img_size=384, patch=16, dim=768, depth=12, heads=12),
}


def create_model(name, pretrained=False, **kwargs):
    if pretrained:
        raise RuntimeError("timm shim has no pretrained weights (offline env)")
    if name not in _MODELS:
        raise KeyError(f"timm shim supports only {sorted(_MODELS)}, got {name}")
    return VisionTransformer(**_MODELS[name])

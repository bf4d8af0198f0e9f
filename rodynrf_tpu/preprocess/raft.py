"""RAFT optical flow, TPU-native JAX implementation.

Re-implementation of the vendored RAFT the reference uses for flow priors
(reference: scripts/RAFT/raft.py:26-147, extractor.py:8-180 BasicEncoder,
update.py:8-141 BasicUpdateBlock/SepConvGRU, corr.py:14-62 CorrBlock,
utils/utils.py:59-84 bilinear_sampler/coords_grid/upflow8). Differences are
architectural, not semantic:

  * NHWC layout throughout (TPU-native conv layout),
  * the all-pairs correlation volume is one big MXU matmul
    ``fmap1 [N, H1W1, C] @ fmap2^T`` (corr.py:55-62),
  * the iterative refinement runs under ``lax.scan`` (static iteration
    count; coords detached per-iteration exactly like raft.py:124),
  * correlation lookup is a vectorized bilinear gather over the
    (2r+1)^2-offset window at 4 pyramid levels.

Weights convert 1:1 from the official torch checkpoints
(``load_raft_torch_checkpoint``), including fnet instance-norm affines and
cnet batch-norm running stats (inference mode).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# layers (params are dicts of arrays, HWIO conv kernels)
# ---------------------------------------------------------------------------

DN = ("NHWC", "HWIO", "NHWC")


def conv2d(p, x, stride=1):
    # torch-style symmetric padding (k-1)//2 — NOT XLA "SAME", which pads
    # asymmetrically for stride 2 and breaks parity with the reference's
    # stride-2 encoder convs (extractor.py:124-131)
    kh, kw = p["w"].shape[:2]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pad, dimension_numbers=DN
    )
    return out + p["b"]


def instance_norm(p, x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in p:
        out = out * p["scale"] + p["bias"]
    return out


def batch_norm_eval(p, x, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


def _norm(p, x, kind):
    if kind == "instance":
        return instance_norm(p, x)
    if kind == "batch":
        return batch_norm_eval(p, x)
    if kind == "none":
        return x
    raise ValueError(kind)


def residual_block(p, x, kind, stride=1):
    """(reference: extractor.py:8-59)."""
    y = jax.nn.relu(_norm(p["norm1"], conv2d(p["conv1"], x, stride), kind))
    y = jax.nn.relu(_norm(p["norm2"], conv2d(p["conv2"], y), kind))
    if stride != 1:
        x = _norm(p["norm3"], conv2d(p["downsample"], x, stride), kind)
    return jax.nn.relu(x + y)


def basic_encoder(p, x, kind):
    """BasicEncoder: 7x7/2 stem + 3 residual stages + 1x1 head
    (reference: extractor.py:120-180). Output stride 8."""
    x = jax.nn.relu(_norm(p["norm1"], conv2d(p["conv1"], x, stride=2), kind))
    for i, stride in enumerate((1, 2, 2)):
        x = residual_block(p[f"layer{i + 1}.0"], x, kind, stride)
        x = residual_block(p[f"layer{i + 1}.1"], x, kind, 1)
    return conv2d(p["conv2"], x)


# ---------------------------------------------------------------------------
# correlation pyramid
# ---------------------------------------------------------------------------

def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] x2 -> [N*H1*W1, H2, W2] / sqrt(C) (corr.py:55-62)."""
    N, H, W, C = fmap1.shape
    a = fmap1.reshape(N, H * W, C)
    b = fmap2.reshape(N, H * W, C)
    corr = jnp.einsum("nic,njc->nij", a, b) / jnp.sqrt(jnp.asarray(C, fmap1.dtype))
    return corr.reshape(N * H * W, H, W)


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool over trailing spatial dims of [M, H, W]; odd
    trailing rows/cols are dropped (torch avg_pool2d floor semantics)."""
    M, H, W = x.shape
    H2, W2 = H // 2, W // 2
    x = x[:, : 2 * H2, : 2 * W2]
    return x.reshape(M, H2, 2, W2, 2).mean(axis=(2, 4))


def build_corr_pyramid(fmap1, fmap2, num_levels: int = 4) -> List[jnp.ndarray]:
    corr = all_pairs_correlation(fmap1, fmap2)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2(corr)
        pyramid.append(corr)
    return pyramid


def _bilinear_lookup(vol: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """vol [M, H, W], xy [M, K, 2] pixel coords -> [M, K]; zero padding,
    matching grid_sample on 2x/(W-1)-1 coords (utils.py:59-74)."""
    M, H, W = vol.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = vol.reshape(M, H * W)
        vals = jnp.take_along_axis(flat, yc * W + xc, axis=1)
        return vals * inb

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def lookup_corr(pyramid: List[jnp.ndarray], coords: jnp.ndarray, radius: int = 4):
    """coords [N, H, W, 2] -> correlation features [N, H, W, L*(2r+1)^2]
    (corr.py:31-52)."""
    N, H, W, _ = coords.shape
    r = radius
    d = jnp.arange(-r, r + 1, dtype=coords.dtype)
    ddy, ddx = jnp.meshgrid(d, d, indexing="ij")
    delta = jnp.stack([ddx, ddy], -1).reshape(-1, 2)  # [(2r+1)^2, 2] (x, y)

    out = []
    flat_coords = coords.reshape(N * H * W, 1, 2)
    for i, vol in enumerate(pyramid):
        centroid = flat_coords / (2**i)
        xy = centroid + delta[None]
        out.append(_bilinear_lookup(vol, xy))
    feats = jnp.concatenate(out, -1)
    return feats.reshape(N, H, W, -1)


# ---------------------------------------------------------------------------
# update block
# ---------------------------------------------------------------------------

def motion_encoder(p, flow, corr):
    """(update.py:84-102 BasicMotionEncoder)."""
    cor = jax.nn.relu(conv2d(p["convc1"], corr))
    cor = jax.nn.relu(conv2d(p["convc2"], cor))
    flo = jax.nn.relu(conv2d(p["convf1"], flow))
    flo = jax.nn.relu(conv2d(p["convf2"], flo))
    out = jax.nn.relu(conv2d(p["conv"], jnp.concatenate([cor, flo], -1)))
    return jnp.concatenate([out, flow], -1)


def sep_conv_gru(p, h, x):
    """(update.py:35-63 SepConvGRU): horizontal then vertical 1D GRU."""
    for axis in ("1", "2"):
        hx = jnp.concatenate([h, x], -1)
        z = jax.nn.sigmoid(conv2d(p[f"convz{axis}"], hx))
        r = jax.nn.sigmoid(conv2d(p[f"convr{axis}"], hx))
        q = jnp.tanh(conv2d(p[f"convq{axis}"], jnp.concatenate([r * h, x], -1)))
        h = (1 - z) * h + z * q
    return h


def update_block(p, net, inp, corr, flow):
    """(update.py:117-141 BasicUpdateBlock)."""
    motion = motion_encoder(p["encoder"], flow, corr)
    x = jnp.concatenate([inp, motion], -1)
    net = sep_conv_gru(p["gru"], net, x)
    h = jax.nn.relu(conv2d(p["flow_head.conv1"], net))
    delta_flow = conv2d(p["flow_head.conv2"], h)
    m = jax.nn.relu(conv2d(p["mask.0"], net))
    mask = 0.25 * conv2d(p["mask.2"], m)
    return net, mask, delta_flow


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 2], [N, H, W, 576] -> [N, 8H, 8W, 2] (raft.py:76-88)."""
    N, H, W, _ = flow.shape
    mask = mask.reshape(N, H, W, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    pad = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood patches, same offset order as F.unfold (row-major dy, dx)
    patches = jnp.stack(
        [pad[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # [N, H, W, 9, 2]
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", mask, patches)  # [N, H, W, 8, 8, 2]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(N, 8 * H, 8 * W, 2)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def coords_grid(N: int, H: int, W: int) -> jnp.ndarray:
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return jnp.broadcast_to(jnp.stack([x, y], -1)[None], (N, H, W, 2))


def raft_forward(
    params: Dict,
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    iters: int = 20,
    radius: int = 4,
):
    """images [N, H, W, 3] uint8-range floats -> flow [N, H, W, 2]
    (reference: raft.py:91-147). H, W must be multiples of 8."""
    x1 = 2.0 * (image1 / 255.0) - 1.0
    x2 = 2.0 * (image2 / 255.0) - 1.0

    fmap1 = basic_encoder(params["fnet"], x1, "instance")
    fmap2 = basic_encoder(params["fnet"], x2, "instance")
    pyramid = build_corr_pyramid(fmap1, fmap2)

    cnet = basic_encoder(params["cnet"], x1, "batch")
    net, inp = jnp.split(cnet, 2, axis=-1)
    net = jnp.tanh(net)
    inp = jax.nn.relu(inp)

    N, H8, W8, _ = fmap1.shape
    coords0 = coords_grid(N, H8, W8)

    def step(carry, _):
        net, coords1 = carry
        coords1 = jax.lax.stop_gradient(coords1)
        corr = lookup_corr(pyramid, coords1, radius)
        flow = coords1 - coords0
        net, mask, delta = update_block(params["update"], net, inp, corr, flow)
        coords1 = coords1 + delta
        return (net, coords1), mask

    (net, coords1), masks = jax.lax.scan(step, (net, coords0), None, length=iters)
    flow8 = coords1 - coords0
    return convex_upsample(flow8, masks[-1])


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _conv_p(sd, name):
    return {
        "w": sd[f"{name}.weight"].transpose(2, 3, 1, 0).copy(),  # OIHW -> HWIO
        "b": sd[f"{name}.bias"].copy(),
    }


def _norm_p(sd, name, kind):
    if kind == "none":
        return {}
    p = {}
    # torch InstanceNorm2d defaults to affine=False: official RAFT ckpts have
    # no weight/bias for the fnet norms (extractor.py:30-34)
    if f"{name}.weight" in sd:
        p["scale"] = sd[f"{name}.weight"].copy()
        p["bias"] = sd[f"{name}.bias"].copy()
    if kind == "batch":
        p["mean"] = sd[f"{name}.running_mean"].copy()
        p["var"] = sd[f"{name}.running_var"].copy()
    return p


def _encoder_params(sd, prefix, kind):
    p = {
        "conv1": _conv_p(sd, f"{prefix}.conv1"),
        "norm1": _norm_p(sd, f"{prefix}.norm1", kind),
        "conv2": _conv_p(sd, f"{prefix}.conv2"),
    }
    for li in (1, 2, 3):
        for bi in (0, 1):
            name = f"{prefix}.layer{li}.{bi}"
            blk = {
                "conv1": _conv_p(sd, f"{name}.conv1"),
                "conv2": _conv_p(sd, f"{name}.conv2"),
                "norm1": _norm_p(sd, f"{name}.norm1", kind),
                "norm2": _norm_p(sd, f"{name}.norm2", kind),
            }
            if f"{name}.downsample.0.weight" in sd:
                blk["downsample"] = _conv_p(sd, f"{name}.downsample.0")
                blk["norm3"] = _norm_p(sd, f"{name}.downsample.1", kind)
            p[f"layer{li}.{bi}"] = blk
    return p


def load_raft_torch_checkpoint(path: str) -> Dict:
    """Convert an official RAFT checkpoint (e.g. raft-things.pth) to our
    params pytree. Accepts DataParallel 'module.'-prefixed keys."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    sd = {k.replace("module.", ""): v.detach().numpy() for k, v in raw.items()}

    upd = "update_block"
    update = {
        "encoder": {
            n: _conv_p(sd, f"{upd}.encoder.{n}")
            for n in ("convc1", "convc2", "convf1", "convf2", "conv")
        },
        "gru": {
            n: _conv_p(sd, f"{upd}.gru.{n}")
            for n in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")
        },
        "flow_head.conv1": _conv_p(sd, f"{upd}.flow_head.conv1"),
        "flow_head.conv2": _conv_p(sd, f"{upd}.flow_head.conv2"),
        "mask.0": _conv_p(sd, f"{upd}.mask.0"),
        "mask.2": _conv_p(sd, f"{upd}.mask.2"),
    }
    return {
        "fnet": _encoder_params(sd, "fnet", "instance"),
        "cnet": _encoder_params(sd, "cnet", "batch"),
        "update": update,
    }


def init_raft_params(key: jax.Array) -> Dict:
    """Random params with the BasicEncoder/BasicUpdateBlock shapes, for
    shape tests when no pretrained checkpoint is present."""

    def conv(key, kh, kw, cin, cout):
        k1, k2 = jax.random.split(key)
        scale = 1.0 / np.sqrt(kh * kw * cin)
        return {
            "w": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -scale, scale),
            "b": jnp.zeros((cout,)),
        }

    def norm(c, kind):
        if kind == "none":
            return {}
        p = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        if kind == "batch":
            p["mean"] = jnp.zeros((c,))
            p["var"] = jnp.ones((c,))
        return p

    keys = iter(jax.random.split(key, 200))

    def encoder(out_dim, kind):
        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        p = {
            "conv1": conv(next(keys), 7, 7, 3, 64),
            "norm1": norm(64, kind),
            "conv2": conv(next(keys), 1, 1, 128, out_dim),
        }
        for li, (cin, cout, stride) in enumerate(dims, start=1):
            for bi in (0, 1):
                c_in = cin if bi == 0 else cout
                s = stride if bi == 0 else 1
                blk = {
                    "conv1": conv(next(keys), 3, 3, c_in, cout),
                    "conv2": conv(next(keys), 3, 3, cout, cout),
                    "norm1": norm(cout, kind),
                    "norm2": norm(cout, kind),
                }
                if s != 1 or c_in != cout:
                    blk["downsample"] = conv(next(keys), 1, 1, c_in, cout)
                    blk["norm3"] = norm(cout, kind)
                p[f"layer{li}.{bi}"] = blk
        return p

    cor_planes = 4 * (2 * 4 + 1) ** 2
    update = {
        "encoder": {
            "convc1": conv(next(keys), 1, 1, cor_planes, 256),
            "convc2": conv(next(keys), 3, 3, 256, 192),
            "convf1": conv(next(keys), 7, 7, 2, 128),
            "convf2": conv(next(keys), 3, 3, 128, 64),
            "conv": conv(next(keys), 3, 3, 256, 126),
        },
        "gru": {
            "convz1": conv(next(keys), 1, 5, 128 + 256, 128),
            "convr1": conv(next(keys), 1, 5, 128 + 256, 128),
            "convq1": conv(next(keys), 1, 5, 128 + 256, 128),
            "convz2": conv(next(keys), 5, 1, 128 + 256, 128),
            "convr2": conv(next(keys), 5, 1, 128 + 256, 128),
            "convq2": conv(next(keys), 5, 1, 128 + 256, 128),
        },
        "flow_head.conv1": conv(next(keys), 3, 3, 128, 256),
        "flow_head.conv2": conv(next(keys), 3, 3, 256, 2),
        "mask.0": conv(next(keys), 3, 3, 128, 256),
        "mask.2": conv(next(keys), 1, 1, 256, 64 * 9),
    }
    return {
        "fnet": encoder(256, "instance"),
        "cnet": encoder(256, "batch"),
        "update": update,
    }

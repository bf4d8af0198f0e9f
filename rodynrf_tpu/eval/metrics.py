"""Quality metrics: PSNR, SSIM, (optional) LPIPS, depth visualization.

Equivalents of the reference metrics (reference: utils.py:98-151 rgb_ssim,
79-84 rgb_lpips, 13-55 visualize_depth). LPIPS requires the `lpips` pip
package with pretrained weights; when unavailable (zero-egress environments)
it is reported as None, matching the reference's compute_extra_metrics=False
path.
"""

from __future__ import annotations

import numpy as np
import scipy.signal


def psnr(img0: np.ndarray, img1: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(img0) - np.asarray(img1)) ** 2))
    return -10.0 * np.log(mse) / np.log(10.0)


def rgb_ssim(
    img0,
    img1,
    max_val,
    filter_size=11,
    filter_sigma=1.5,
    k1=0.01,
    k2=0.03,
    return_map=False,
):
    """Gaussian-window SSIM (reference: utils.py:98-151, mipnerf-derived)."""
    img0 = np.asarray(img0)
    img1 = np.asarray(img1)
    assert img0.ndim == 3 and img0.shape[-1] == 3 and img0.shape == img1.shape

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= np.sum(filt)

    def convolve2d(z, f):
        return scipy.signal.convolve2d(z, f, mode="valid")

    def filt_fn(z):
        return np.stack(
            [convolve2d(convolve2d(z[..., i], filt[:, None]), filt[None, :]) for i in range(z.shape[-1])],
            -1,
        )

    mu0 = filt_fn(img0)
    mu1 = filt_fn(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = filt_fn(img0**2) - mu00
    sigma11 = filt_fn(img1**2) - mu11
    sigma01 = filt_fn(img0 * img1) - mu01

    sigma00 = np.maximum(0.0, sigma00)
    sigma11 = np.maximum(0.0, sigma11)
    sigma01 = np.sign(sigma01) * np.minimum(np.sqrt(sigma00 * sigma11), np.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else float(np.mean(ssim_map))


_LPIPS_CACHE = {}
_LPIPS_MISS_LOGGED = set()


def _torch_lpips_fallback(np_gt, np_im, net_name):
    """Score with the torch `lpips` pip package if present; else None."""
    try:
        import lpips
        import torch
    except ImportError:
        return None
    if net_name not in _LPIPS_CACHE:
        _LPIPS_CACHE[net_name] = lpips.LPIPS(net=net_name, version="0.1").eval()
    import numpy as np

    gt = torch.from_numpy(np.ascontiguousarray(np_gt.transpose(2, 0, 1)))
    im = torch.from_numpy(np.ascontiguousarray(np_im.transpose(2, 0, 1)))
    with torch.no_grad():
        return float(_LPIPS_CACHE[net_name](gt, im, normalize=True).item())


def rgb_lpips(np_gt: np.ndarray, np_im: np.ndarray, net_name: str = "alex"):
    """LPIPS (reference: utils.py:68-84). Scored by the native JAX
    implementation (eval/lpips_jax.py) with weights converted from a
    torch-saved lpips.LPIPS state_dict — point $LPIPS_WEIGHTS_{ALEX,VGG} (or
    $LPIPS_WEIGHTS_DIR/lpips_{net}.pth) at the dump. Falls back to the torch
    `lpips` pip package if installed; returns None when no weights exist."""
    import os

    key = f"jax_{net_name}"
    if key not in _LPIPS_CACHE:
        path = os.environ.get(f"LPIPS_WEIGHTS_{net_name.upper()}")
        if not path:
            d = os.environ.get("LPIPS_WEIGHTS_DIR")
            if d:
                cand = os.path.join(d, f"lpips_{net_name}.pth")
                path = cand if os.path.exists(cand) else None
        if path and os.path.exists(path):
            from .lpips_jax import load_lpips_torch_checkpoint

            _LPIPS_CACHE[key] = load_lpips_torch_checkpoint(path, net_name)
        else:
            # do NOT cache the miss: weights may appear later in the process
            # (env set after import, path typo fixed mid-run); re-check each
            # call so mean.txt doesn't silently lose its lpips columns
            if key not in _LPIPS_MISS_LOGGED:
                print(f"[lpips] no weights for '{net_name}' "
                      "(set $LPIPS_WEIGHTS_DIR); scoring without lpips")
                _LPIPS_MISS_LOGGED.add(key)
            return _torch_lpips_fallback(np_gt, np_im, net_name)
    from .lpips_jax import lpips as lpips_jax

    d = lpips_jax(_LPIPS_CACHE[key], np_gt[None], np_im[None], net_name)
    return float(np.asarray(d)[0])


def visualize_depth_numpy(depth: np.ndarray, minmax=None, cmap_id=None):
    """Depth -> turbo-like colormap uint8 (reference: utils.py:13-35)."""
    import cv2

    x = np.nan_to_num(depth)
    if minmax is None:
        mi = np.min(x[x > 0]) if np.any(x > 0) else 0.0
        ma = np.max(x)
    else:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    x_ = cv2.applyColorMap(x, cmap_id if cmap_id is not None else cv2.COLORMAP_JET)
    return x_[..., ::-1], [mi, ma]  # BGR -> RGB

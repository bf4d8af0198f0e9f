"""Motion-mask generation: Sampson epipolar error ∪ semantic segmentation.

Functional equivalent of the reference's mask pipeline
(reference: scripts/generate_mask.py:29-67 uv grid + Sampson error,
150-302 main loop): per frame, fit a fundamental matrix to flow
correspondences (LMedS), score each pixel's Sampson epipolar error, keep the
top-quantile outliers, morphologically clean, and union with an optional
Mask-RCNN semantic mask of movable classes.

Sampson scoring is pure JAX (device-friendly); fundamental-matrix LMedS and
morphology stay host-side via cv2 (tiny workloads).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def get_uv_grid(H: int, W: int, align_corners: bool = False) -> np.ndarray:
    """Pixel-center uv grid in [-1, 1], (H, W, 2)
    (reference: generate_mask.py:29-50)."""
    yy, xx = np.meshgrid(
        np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij"
    )
    if align_corners:
        xx = 2 * xx / (W - 1) - 1
        yy = 2 * yy / (H - 1) - 1
    else:
        xx = 2 * (xx + 0.5) / W - 1
        yy = 2 * (yy + 0.5) / H - 1
    return np.stack([xx, yy], -1)


def compute_sampson_error(x1: np.ndarray, x2: np.ndarray, F: np.ndarray) -> np.ndarray:
    """First-order epipolar distance (reference: generate_mask.py:53-67)."""
    h1 = np.concatenate([x1, np.ones_like(x1[..., :1])], -1)
    h2 = np.concatenate([x2, np.ones_like(x2[..., :1])], -1)
    d1 = h1 @ np.swapaxes(F, -1, -2)
    d2 = h2 @ F
    z = (h2 * d1).sum(-1)
    return z**2 / (d1[..., 0] ** 2 + d1[..., 1] ** 2 + d2[..., 0] ** 2 + d2[..., 1] ** 2)


def epipolar_error_map(flow: np.ndarray, H: int, W: int) -> np.ndarray:
    """One flow field -> per-pixel scaled Sampson error map
    (reference: generate_mask.py:195-224): normalize flow to uv units, fit F
    via LMedS, scale error by ((H+W)/2)^2."""
    import cv2

    x1 = get_uv_grid(H, W).reshape(-1, 2)
    nflow = np.stack(
        [2.0 * flow[..., 0] / (W - 1), 2.0 * flow[..., 1] / (H - 1)], -1
    ).reshape(-1, 2)
    x2 = x1 + nflow
    F, _ = cv2.findFundamentalMat(x1, x2, cv2.FM_LMEDS)
    if F is None:
        return np.zeros((H, W), np.float32)
    err = compute_sampson_error(x1, x2, F.astype(np.float32)).reshape(H, W)
    fac = (H + W) / 2
    return err * fac**2


def _binary_opening_disk1(mask: np.ndarray) -> np.ndarray:
    import cv2

    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    return cv2.morphologyEx(mask.astype(np.uint8), cv2.MORPH_OPEN, kernel).astype(bool)


def _dilation_disk2(mask: np.ndarray) -> np.ndarray:
    import cv2

    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    return cv2.dilate(mask.astype(np.uint8), kernel).astype(np.float32)


def motion_mask_for_frame(
    err_maps: List[np.ndarray],
    H: int,
    W: int,
    semantic_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fuse epipolar error maps + optional semantic mask into the final
    binary motion mask (reference: generate_mask.py:258-276)."""
    err = np.max(np.stack(err_maps, 0), 0)
    thresh = np.quantile(err, 0.8)
    err = np.where(err <= thresh, 0.0, err)
    mask = _binary_opening_disk1(err > (H * W / 8100.0))
    if semantic_mask is not None:
        mask = mask | (semantic_mask > 0.5)
    return _dilation_disk2(mask)


def run_semantic_segmentation(img_path: str, model=None) -> Optional[np.ndarray]:
    """Mask-RCNN movable-class mask (person/vehicle/accessory/animal/sports,
    reference: generate_mask.py:70-121). Requires torchvision pretrained
    weights; returns None when unavailable (zero-egress environments)."""
    try:
        import torch
        import torchvision
        from PIL import Image

        if model is None:
            model = torchvision.models.detection.maskrcnn_resnet50_fpn(
                weights="DEFAULT"
            ).eval()
    except Exception:
        return None

    o_image = Image.open(img_path).convert("RGB")
    width, height = o_image.size
    if width > height:
        int_h, int_w = 576, 1024
    else:
        int_h, int_w = 1024, 576
    image = o_image.resize((int_w, int_h), Image.LANCZOS)
    tensor = torchvision.transforms.functional.to_tensor(image)
    movable = torch.zeros(int_h, int_w)
    with torch.no_grad():
        pred = model([tensor])[0]
    movable_label = lambda l: (
        l == 1 or 2 <= l <= 9 or 26 <= l <= 33 or 16 <= l <= 25 or 34 <= l <= 43
    )
    for i in range(pred["masks"].size(0)):
        if pred["scores"][i].item() > 0.5 and movable_label(pred["labels"][i].item()):
            movable[pred["masks"][i, 0] > 0.5] = 1.0
    return movable.numpy()


def generate_motion_masks(datadir: str, zfill: int = 5, out_dir: str = "epipolar_error_png"):
    """CLI main: read flow sidecars, write epipolar_error_png/%0Nd.png
    (reference: generate_mask.py:150-302)."""
    import glob

    from PIL import Image

    images = sorted(glob.glob(os.path.join(datadir, "images", "*")))
    first = np.asarray(Image.open(images[0]))
    H, W = first.shape[:2]

    os.makedirs(os.path.join(datadir, out_dir), exist_ok=True)
    for idx in range(len(images)):
        err_maps = []
        if idx - 1 >= 0:
            data = np.load(os.path.join(datadir, "flow", str(idx).zfill(zfill) + "_bwd.npz"))
            err_maps.append(epipolar_error_map(data["flow"], H, W))
        if idx + 1 < len(images):
            data = np.load(os.path.join(datadir, "flow", str(idx).zfill(zfill) + "_fwd.npz"))
            err_maps.append(epipolar_error_map(data["flow"], H, W))
        semantic = run_semantic_segmentation(images[idx])
        if semantic is not None:
            import cv2

            semantic = cv2.resize(semantic, (W, H), interpolation=cv2.INTER_NEAREST)
        mask = motion_mask_for_frame(err_maps, H, W, semantic)
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(datadir, out_dir, str(idx).zfill(zfill) + ".png")
        )

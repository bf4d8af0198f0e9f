#!/usr/bin/env python
"""Monocular-depth preprocessing: DPT-Large per frame, on TPU.

Equivalent of the reference's depth CLI (reference:
scripts/generate_DPT.py:39-160): resizes each frame to 384 lower-bound
(keep-aspect, multiple of 32), runs DPT, resizes the inverse-depth map back
to full resolution, and writes disp/%03d.npy (+ 16-bit PNGs).

    python scripts/generate_depth.py --dataset_path <dir> --model dpt_large-midas-2f21e586.pt
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def lower_bound_size(H: int, W: int, target: int = 384, mult: int = 32):
    """Smaller side >= target, keep aspect, both multiples of `mult`
    (reference: generate_DPT.py:55-75 Resize lower_bound)."""
    scale = target / min(H, W)
    h = max(target, int(np.ceil(H * scale / mult) * mult))
    w = max(target, int(np.ceil(W * scale / mult) * mult))
    return h, w


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--model", type=str, required=True, help="DPT torch checkpoint")
    parser.add_argument("--out_dir", type=str, default="disp")
    parser.add_argument("--zfill", type=int, default=3)
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rodynrf_tpu.preprocess.dpt import dpt_forward, load_dpt_torch_checkpoint

    params = load_dpt_torch_checkpoint(args.model)
    forward = jax.jit(dpt_forward)

    images = sorted(glob.glob(os.path.join(args.dataset_path, "images", "*")))
    out_path = os.path.join(args.dataset_path, args.out_dir)
    png_path = os.path.join(args.dataset_path, args.out_dir + "_png")
    os.makedirs(out_path, exist_ok=True)
    os.makedirs(png_path, exist_ok=True)

    for idx, path in enumerate(images):
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        H, W = img.shape[:2]
        h, w = lower_bound_size(H, W)
        inp = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
        pred = np.asarray(forward(params, jnp.asarray(inp[None])))[0]
        disp = cv2.resize(pred, (W, H), interpolation=cv2.INTER_CUBIC)

        z = args.zfill
        np.save(os.path.join(out_path, f"%0{z}d.npy" % idx), disp)
        d16 = (65535 * (disp - disp.min()) / (disp.ptp() + 1e-8)).astype(np.uint16)
        cv2.imwrite(os.path.join(png_path, f"%0{z}d.png" % idx), d16)
        print(f"[{idx + 1}/{len(images)}] depth done")


if __name__ == "__main__":
    main()

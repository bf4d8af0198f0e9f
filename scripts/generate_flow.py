#!/usr/bin/env python
"""Optical-flow preprocessing: RAFT fwd+bwd per frame pair, on TPU.

Equivalent of the reference's flow CLI (reference:
scripts/generate_flow.py:91-169): for each adjacent pair, runs RAFT at
768-long-side resolution (20 iterations), computes forward/backward
consistency masks, and writes flow/%05d_{fwd,bwd}.npz sidecars + flow_png
visualizations. The model runs as ONE jitted function on the accelerator.

    python scripts/generate_flow.py --dataset_path <dir> --model raft-things.pth
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pad_to_multiple(img: np.ndarray, mult: int = 8):
    H, W = img.shape[:2]
    ph = (mult - H % mult) % mult
    pw = (mult - W % mult) % mult
    out = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return out, (H, W)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--model", type=str, required=True, help="RAFT torch checkpoint")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--long_side", type=int, default=768)
    parser.add_argument("--zfill", type=int, default=5)
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rodynrf_tpu.data.llff import resize_flow
    from rodynrf_tpu.preprocess.flow_utils import compute_fwdbwd_mask
    from rodynrf_tpu.preprocess.raft import load_raft_torch_checkpoint, raft_forward
    from rodynrf_tpu.utils.flow_viz import flow_to_image

    params = load_raft_torch_checkpoint(args.model)
    forward = jax.jit(lambda p, a, b: raft_forward(p, a, b, iters=args.iters))

    input_path = os.path.join(args.dataset_path, "images")
    out_path = os.path.join(args.dataset_path, "flow")
    out_img_path = os.path.join(args.dataset_path, "flow_png")
    os.makedirs(out_path, exist_ok=True)
    os.makedirs(out_img_path, exist_ok=True)

    images = sorted(
        glob.glob(os.path.join(input_path, "*.png")) + glob.glob(os.path.join(input_path, "*.jpg"))
    )
    first = np.asarray(Image.open(images[0]).convert("RGB"))
    H0, W0 = first.shape[:2]
    scale = args.long_side / max(H0, W0)
    Hs, Ws = int(round(H0 * scale)), int(round(W0 * scale))

    def load(path):
        img = np.asarray(Image.open(path).convert("RGB"), np.float32)
        img = cv2.resize(img, (Ws, Hs), interpolation=cv2.INTER_AREA)
        img, orig = pad_to_multiple(img)
        return img, orig

    for i in range(len(images) - 1):
        img1, orig = load(images[i])
        img2, _ = load(images[i + 1])
        batch = jnp.stack([img1, img2])  # both directions in one batch
        flows = forward(params, batch, batch[::-1])
        flow_fwd = np.asarray(flows[0])[: orig[0], : orig[1]]
        flow_bwd = np.asarray(flows[1])[: orig[0], : orig[1]]

        flow_fwd = resize_flow(flow_fwd, H0, W0)
        flow_bwd = resize_flow(flow_bwd, H0, W0)
        mask_fwd, mask_bwd = compute_fwdbwd_mask(flow_fwd, flow_bwd)

        z = args.zfill
        np.savez(os.path.join(out_path, f"%0{z}d_fwd.npz" % i), flow=flow_fwd, mask=mask_fwd)
        np.savez(os.path.join(out_path, f"%0{z}d_bwd.npz" % (i + 1)), flow=flow_bwd, mask=mask_bwd)
        Image.fromarray(flow_to_image(flow_fwd)).save(
            os.path.join(out_img_path, f"%0{z}d_fwd.png" % i)
        )
        Image.fromarray(flow_to_image(flow_bwd)).save(
            os.path.join(out_img_path, f"%0{z}d_bwd.png" % (i + 1))
        )
        print(f"[{i + 1}/{len(images) - 1}] flow pair done")


if __name__ == "__main__":
    main()

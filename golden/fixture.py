"""Write the synthetic test scene to disk in the reference's dataset layout.

Produces exactly the sidecar tree the reference's NvidiaDataset reads
(reference: dataLoader/nvidia.py:255-428):

    images/%03d.png          8-bit RGB frames
    motion_masks/%03d.png    8-bit binary foreground masks
    flow/%03d_fwd.npz        {flow [H,W,2] f32, mask [H,W] f32}   i in 0..T-2
    flow/%03d_bwd.npz        same                                  i in 1..T-1
    disp/%03d.npy            [H,W] f32 disparity
    poses_bounds.npy         [T, 17] LLFF poses (3x5 flattened + near/far)

Both the reference loader and rodynrf_tpu's load_nvidia_scene read this same
tree, so the two training runs in the golden comparison consume bit-identical
pixel data (PNG quantization applied equally to both).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def write_reference_fixture(out_dir: str, T: int = 4, H: int = 24, W: int = 32, seed: int = 0):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from rodynrf_tpu.data.synthetic import make_synthetic_scene

    scene = make_synthetic_scene(T=T, H=H, W=W, ray_type="ndc", seed=seed)
    rgbs = scene.rgbs_stack  # [T, H, W, 3] float
    fg = scene.fg_masks.reshape(T, H, W)
    flows_f = scene.flows_f.reshape(T, H, W, 2)
    flows_b = scene.flows_b.reshape(T, H, W, 2)
    disps = scene.disps.reshape(T, H, W)

    for sub in ("images", "motion_masks", "flow", "disp"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    for t in range(T):
        img8 = np.clip(rgbs[t] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(img8).save(os.path.join(out_dir, "images", f"{t:03d}.png"))
        mask8 = (fg[t] > 0.5).astype(np.uint8) * 255
        Image.fromarray(np.stack([mask8] * 3, -1)).save(
            os.path.join(out_dir, "motion_masks", f"{t:03d}.png")
        )
        np.save(os.path.join(out_dir, "disp", f"{t:03d}.npy"), disps[t].astype(np.float32))
        if t < T - 1:
            np.savez(
                os.path.join(out_dir, "flow", f"{t:03d}_fwd.npz"),
                flow=flows_f[t].astype(np.float32),
                mask=np.ones((H, W), np.float32),
            )
        if t > 0:
            np.savez(
                os.path.join(out_dir, "flow", f"{t:03d}_bwd.npz"),
                flow=flows_b[t].astype(np.float32),
                mask=np.ones((H, W), np.float32),
            )

    # LLFF-format GT poses: near-identity rotations in the "down right back"
    # convention with a small per-frame sideways translation. Geometric
    # consistency with the painted pixels is irrelevant for the golden
    # comparison — both loaders apply the identical recentering pipeline
    # (reference: dataLoader/nvidia.py:289-341) to this same file.
    focal = 40.0
    pb = np.zeros((T, 17), np.float64)
    for t in range(T):
        m = np.zeros((3, 5))
        m[:, :3] = np.eye(3)
        m[:, 3] = [0.05 * (t - (T - 1) / 2), 0.01 * t, 0.02]
        m[:, 4] = [H, W, focal]
        pb[t, :15] = m.reshape(-1)
        pb[t, 15:] = [1.0, 10.0]
    np.save(os.path.join(out_dir, "poses_bounds.npy"), pb)
    return out_dir


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "out", "fixture"))
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--H", type=int, default=24)
    p.add_argument("--W", type=int, default=32)
    a = p.parse_args()
    write_reference_fixture(a.out, a.T, a.H, a.W)
    print("fixture written to", a.out)

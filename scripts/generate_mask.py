#!/usr/bin/env python
"""Motion-mask preprocessing: Sampson epipolar error ∪ Mask-RCNN.

Equivalent of the reference's mask CLI (reference:
scripts/generate_mask.py:150-302). Requires flow sidecars (run
generate_flow.py first); Mask-RCNN is used when torchvision weights are
available, otherwise masks come from epipolar error alone.

    python scripts/generate_mask.py --dataset_path <dir>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--zfill", type=int, default=5)
    args = parser.parse_args()

    from rodynrf_tpu.preprocess.motion_masks import generate_motion_masks

    generate_motion_masks(args.dataset_path, zfill=args.zfill)


if __name__ == "__main__":
    main()

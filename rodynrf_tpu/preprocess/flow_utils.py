"""Flow post-processing: warping and forward/backward consistency masks.

Functional equivalents of the reference's flow utilities
(reference: scripts/generate_flow.py:50-88 warp_flow/compute_fwdbwd_mask,
scripts/flow_utils.py). Pure numpy + cv2; host-side.
"""

from __future__ import annotations

import numpy as np


def warp_flow(img: np.ndarray, flow: np.ndarray, interp: str = "cubic") -> np.ndarray:
    """Backward-warp ``img`` by ``flow`` (reference: generate_flow.py:50-63)."""
    import cv2

    h, w = flow.shape[:2]
    flow_new = flow.copy()
    flow_new[:, :, 0] += np.arange(w)
    flow_new[:, :, 1] += np.arange(h)[:, np.newaxis]
    mode = cv2.INTER_CUBIC if interp == "cubic" else cv2.INTER_LINEAR
    return cv2.remap(img, flow_new, None, mode, borderMode=cv2.BORDER_CONSTANT)


def compute_fwdbwd_mask(fwd_flow: np.ndarray, bwd_flow: np.ndarray):
    """Consistency masks: ‖f + w(b)‖ < α1(‖f‖+‖w(b)‖) + α2 with α1=α2=0.5
    (reference: generate_flow.py:65-88)."""
    alpha_1, alpha_2 = 0.5, 0.5

    bwd2fwd = warp_flow(bwd_flow, fwd_flow)
    fwd_err = np.linalg.norm(fwd_flow + bwd2fwd, axis=-1)
    fwd_mask = fwd_err < alpha_1 * (
        np.linalg.norm(fwd_flow, axis=-1) + np.linalg.norm(bwd2fwd, axis=-1)
    ) + alpha_2

    fwd2bwd = warp_flow(fwd_flow, bwd_flow)
    bwd_err = np.linalg.norm(bwd_flow + fwd2bwd, axis=-1)
    bwd_mask = bwd_err < alpha_1 * (
        np.linalg.norm(bwd_flow, axis=-1) + np.linalg.norm(fwd2bwd, axis=-1)
    ) + alpha_2

    return fwd_mask, bwd_mask

"""Pure-torch shim for the `torch_efficient_distloss` pip package.

Implements the mip-NeRF-360 / DVGO distortion loss

    L = sum_rays [ sum_{i,j} w_i w_j |m_i - m_j|  +  (1/3) sum_i w_i^2 * dt ]

in the O(N) two-prefix-sum form (midpoints ascending within a ray):

    sum_{i,j} w_i w_j |m_i - m_j| = 2 * sum_i w_i (m_i * P_i - Q_i)
    with exclusive prefix sums P_i = sum_{j<i} w_j, Q_i = sum_{j<i} w_j m_j.

Only the API surface the reference imports (reference: train.py:19-23) is
provided: eff_distloss, eff_distloss_native, flatten_eff_distloss. The
reference always calls flatten_eff_distloss with row-major-flattened
[rays, samples] tensors and a scalar interval (train.py:1299-1317,
1685-1716, 1840-1861), i.e. ray_id is sorted — which this implementation
relies on for its segmented prefix sums.
"""

import torch


def eff_distloss(w, m, interval):
    """w, m: [R, S]; interval: scalar or [R, S]."""
    wm = w * m
    P = torch.cumsum(w, dim=-1) - w  # exclusive prefix
    Q = torch.cumsum(wm, dim=-1) - wm
    loss_bi = 2.0 * (w * (m * P - Q)).sum()
    loss_uni = (1.0 / 3.0) * (w.pow(2) * interval).sum()
    return loss_bi + loss_uni


eff_distloss_native = eff_distloss


def flatten_eff_distloss(w, m, interval, ray_id):
    """w, m, ray_id: flat [N]; interval: scalar or [N]. ray_id must be sorted."""
    wm = w * m
    cw = torch.cumsum(w, 0)
    cwm = torch.cumsum(wm, 0)
    # index of the first element of each ray's segment
    starts = torch.cat(
        [torch.zeros(1, dtype=torch.bool, device=w.device), ray_id[1:] != ray_id[:-1]]
    )
    seg_first = torch.cumsum(starts.long(), 0)  # segment ordinal per element, 0-based...
    # offset = inclusive cumsum value just before the segment start
    start_idx = torch.nonzero(starts, as_tuple=False).flatten()
    seg_offset_w = torch.cat([torch.zeros(1, dtype=w.dtype, device=w.device), cw[start_idx - 1]])
    seg_offset_wm = torch.cat([torch.zeros(1, dtype=w.dtype, device=w.device), cwm[start_idx - 1]])
    P = (cw - w) - seg_offset_w[seg_first]
    Q = (cwm - wm) - seg_offset_wm[seg_first]
    loss_bi = 2.0 * (w * (m * P - Q)).sum()
    loss_uni = (1.0 / 3.0) * (w.pow(2) * interval).sum()
    return loss_bi + loss_uni

from .flow_utils import compute_fwdbwd_mask, warp_flow
from .motion_masks import (
    compute_sampson_error,
    epipolar_error_map,
    generate_motion_masks,
    get_uv_grid,
    motion_mask_for_frame,
)
from . import raft, dpt

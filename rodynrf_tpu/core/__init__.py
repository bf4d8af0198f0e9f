from .encoding import positional_encoding
from .se3 import (
    pose_to_mtx,
    mtx_to_pose,
    make_pose,
    pose_invert,
    pose_compose,
    pose_compose_pair,
    so3_to_SO3,
    SO3_to_so3,
    se3_to_SE3,
    SE3_to_se3,
    q_to_R,
    R_to_q,
    q_invert,
    q_product,
    world2cam,
    cam2world,
    rotation_distance,
    procrustes_analysis,
    prealign_cameras,
    evaluate_camera_alignment,
    get_novel_view_poses,
)
from .rays import (
    ids2pixel,
    get_ray_directions_lean,
    get_ray_directions_blender,
    get_rays_lean,
    get_rays,
    ndc_rays_blender,
    make_rays,
)
from .spaces import ndc2world, world2ndc, contract, contract2world

from .rotations import (
    aa_to_rotmat,
    quat_to_rotmat,
    quat_to_aa,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    rotmat_to_quat,
    rotmat_to_aa,
)
from .projection import (
    perspective_projection,
    convert_pare_to_full_img_cam,
    points_coord_trans,
)

__all__ = [
    "aa_to_rotmat",
    "quat_to_rotmat",
    "quat_to_aa",
    "rot6d_to_rotmat",
    "rotmat_to_rot6d",
    "rotmat_to_quat",
    "rotmat_to_aa",
    "perspective_projection",
    "convert_pare_to_full_img_cam",
    "points_coord_trans",
]

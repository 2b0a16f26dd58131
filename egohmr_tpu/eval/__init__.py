from .metrics import (
    apd,
    diversity_std,
    joint_visibility_mask,
    mpjpe,
    pa_mpjpe,
    similarity_transform,
    similarity_transform_vis_mask,
    v2v,
)

__all__ = [
    "apd",
    "diversity_std",
    "joint_visibility_mask",
    "mpjpe",
    "pa_mpjpe",
    "similarity_transform",
    "similarity_transform_vis_mask",
    "v2v",
]

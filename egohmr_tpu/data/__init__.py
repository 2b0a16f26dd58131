from .augment import (
    AugmentConfig,
    AugmentParams,
    crop_transform,
    draw_augment_params,
    get_example,
    recompute_transl,
    warp_affine,
)
from .egobody import EgoBodyDataset, MoCapDataset, collate
from .stats import compute_body_rep_stats, load_stats, save_stats
from .synthetic import synthetic_batch

__all__ = [
    "AugmentConfig",
    "AugmentParams",
    "crop_transform",
    "draw_augment_params",
    "get_example",
    "recompute_transl",
    "warp_affine",
    "EgoBodyDataset",
    "MoCapDataset",
    "collate",
    "compute_body_rep_stats",
    "load_stats",
    "save_stats",
    "synthetic_batch",
]

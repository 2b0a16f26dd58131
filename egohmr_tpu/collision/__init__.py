from .sdf import (
    NearestResult,
    bbox_mask,
    chamfer_distance,
    collision_loss,
    collision_ratio,
    min_body_scene_distance,
    nearest_k_vertices,
    nearest_vertex,
    signed_distance,
    signed_distance_winding,
    winding_number,
)

__all__ = [
    "NearestResult",
    "bbox_mask",
    "chamfer_distance",
    "collision_loss",
    "collision_ratio",
    "min_body_scene_distance",
    "nearest_k_vertices",
    "nearest_vertex",
    "signed_distance",
    "signed_distance_winding",
    "winding_number",
]

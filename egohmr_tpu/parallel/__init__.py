from .mesh import batch_sharding, make_mesh, replicate, replicated, shard_batch
from .tp import (
    egohmr_tp_specs,
    gcn_tp_specs,
    make_dp_tp_mesh,
    place_params,
    pointnet_tp_specs,
)

__all__ = [
    "batch_sharding",
    "egohmr_tp_specs",
    "gcn_tp_specs",
    "make_dp_tp_mesh",
    "make_mesh",
    "place_params",
    "pointnet_tp_specs",
    "replicate",
    "replicated",
    "shard_batch",
]

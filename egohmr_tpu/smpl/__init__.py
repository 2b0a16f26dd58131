from . import constants
from .model import SMPLModel, SMPLOutput, lbs, vertex_normals
from .loader import (
    create,
    load_smpl_pkl,
    make_synthetic_model,
    make_synthetic_watertight_model,
)

__all__ = [
    "constants",
    "SMPLModel",
    "SMPLOutput",
    "lbs",
    "vertex_normals",
    "create",
    "load_smpl_pkl",
    "make_synthetic_model",
    "make_synthetic_watertight_model",
]

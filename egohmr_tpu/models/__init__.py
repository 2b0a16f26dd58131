from .egohmr import (
    BodyRepStats,
    Condition,
    EgoHMRConfig,
    LossWeights,
    compute_condition,
    compute_loss,
    denoise_x0,
    init_egohmr,
    make_denoise_fn,
    make_guidance_fn,
    model_outputs,
)
from .discriminator import discriminator_forward, init_discriminator
from . import prohmr

__all__ = [
    "BodyRepStats",
    "Condition",
    "EgoHMRConfig",
    "LossWeights",
    "compute_condition",
    "compute_loss",
    "denoise_x0",
    "init_egohmr",
    "make_denoise_fn",
    "make_guidance_fn",
    "model_outputs",
    "discriminator_forward",
    "init_discriminator",
]

"""egohmr_tpu: TPU-native probabilistic human mesh recovery in 3D scenes.

A ground-up JAX/XLA/Pallas framework with the capabilities of
sanweiliti/EgoHMR (ICCV 2023). See README.md for the architecture map and
SURVEY.md for the reference analysis.
"""

__version__ = "0.1.0"

from . import (  # noqa: F401
    collision,
    data,
    diffusion,
    eval,
    flow,
    geometry,
    models,
    nn,
    parallel,
    smpl,
)

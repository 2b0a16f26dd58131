from .glow import (
    GlowConfig,
    glow_forward,
    glow_inverse,
    glow_log_prob,
    glow_sample_and_log_prob,
    init_glow,
    initialize_actnorms,
)

__all__ = [
    "GlowConfig",
    "glow_forward",
    "glow_inverse",
    "glow_log_prob",
    "glow_sample_and_log_prob",
    "init_glow",
    "initialize_actnorms",
]

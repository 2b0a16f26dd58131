from .schedule import (
    DiffusionSchedule,
    betas_for_alpha_bar,
    get_named_beta_schedule,
    make_schedule,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean,
    q_sample,
    space_timesteps,
)
from .sampler import GuidanceConfig, sample_loop

__all__ = [
    "DiffusionSchedule",
    "betas_for_alpha_bar",
    "get_named_beta_schedule",
    "make_schedule",
    "predict_eps_from_xstart",
    "predict_xstart_from_eps",
    "q_posterior_mean",
    "q_sample",
    "space_timesteps",
    "GuidanceConfig",
    "sample_loop",
]

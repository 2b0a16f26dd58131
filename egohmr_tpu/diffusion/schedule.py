"""Diffusion noise schedules and timestep respacing.

TPU-native redesign of the reference diffusion engine's precompute
(reference diffusion/gaussian_diffusion.py:22-169, diffusion/respace.py:8-129).

All schedule math happens once on the host in float64 (the reference does the
same; keeping f64 here is essential because downstream posterior coefficients
amplify rounding), then the per-timestep coefficient tables are frozen into a
`DiffusionSchedule` pytree of float32 device arrays. Samplers gather rows of
these tables inside `lax.scan` — no host round-trips per step.

Respacing ("ddim5" etc.) is applied at table-construction time: instead of the
reference's `_WrappedModel` that remaps timesteps per call
(reference diffusion/respace.py:117-129), we bake the `timestep_map` into the
schedule so the scan iterates over the compressed steps directly.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Set, Union

import jax
import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(
    schedule_name: str, num_diffusion_timesteps: int, scale_betas: float = 1.0
) -> np.ndarray:
    """Named beta schedules; float64 (reference gaussian_diffusion.py:22-46)."""
    if schedule_name == "linear":
        scale = scale_betas * 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(
    num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999
) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas
    (reference gaussian_diffusion.py:49-66)."""
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def space_timesteps(
    num_timesteps: int, section_counts: Union[str, Sequence[int]]
) -> Set[int]:
    """Select a strided subset of original timesteps
    (reference diffusion/respace.py:8-61; 'ddimN' uses DDIM-paper striding)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into {section_count}"
            )
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DiffusionSchedule:
    """Per-timestep coefficient tables, all shape [T] float32.

    Field names mirror the reference's attribute names
    (reference gaussian_diffusion.py:133-169) so converted state is auditable.
    `timestep_map` maps compressed index -> original timestep; identity when no
    respacing is applied (reference diffusion/respace.py:85).
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    alphas_cumprod_next: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    timestep_map: jax.Array  # int32 [T]

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def _build_tables(betas: np.ndarray, timestep_map: np.ndarray) -> DiffusionSchedule:
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )

    f32 = lambda a: jnp.asarray(np.asarray(a, dtype=np.float32))
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        timestep_map=jnp.asarray(timestep_map.astype(np.int32)),
    )


def make_schedule(
    num_timesteps: int = 50,
    schedule_name: str = "cosine",
    timestep_respacing: str = "",
    scale_betas: float = 1.0,
) -> DiffusionSchedule:
    """Build a (possibly respaced) schedule.

    Equivalent of reference diffusion/model_util.py:4-23 +
    diffusion/respace.py:73-87: when `timestep_respacing` is non-empty, new
    betas are recomputed from the kept alpha-bar products and `timestep_map`
    records the original timestep of each kept step.
    """
    betas = get_named_beta_schedule(schedule_name, num_timesteps, scale_betas)
    if not timestep_respacing:
        return _build_tables(betas, np.arange(num_timesteps))

    use_timesteps = space_timesteps(num_timesteps, timestep_respacing)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    last = 1.0
    new_betas, tmap = [], []
    for i, ac in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - ac / last)
            last = ac
            tmap.append(i)
    return _build_tables(np.array(new_betas), np.array(tmap))


def q_sample(
    schedule: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """Sample q(x_t | x_0) (reference gaussian_diffusion.py:189-207).

    x_start: [B, D]; t: int [B]; noise: [B, D].
    """
    c1 = schedule.sqrt_alphas_cumprod[t][:, None]
    c2 = schedule.sqrt_one_minus_alphas_cumprod[t][:, None]
    return c1 * x_start + c2 * noise


def q_posterior_mean(
    schedule: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array
) -> jax.Array:
    """Posterior mean of q(x_{t-1} | x_t, x_0)
    (reference gaussian_diffusion.py:209-231)."""
    c1 = schedule.posterior_mean_coef1[t][:, None]
    c2 = schedule.posterior_mean_coef2[t][:, None]
    return c1 * x_start + c2 * x_t


def predict_eps_from_xstart(
    schedule: DiffusionSchedule, x_t: jax.Array, t: jax.Array, pred_xstart: jax.Array
) -> jax.Array:
    """Recover epsilon implied by an x0 prediction
    (reference gaussian_diffusion.py:286-290)."""
    c1 = schedule.sqrt_recip_alphas_cumprod[t][:, None]
    c2 = schedule.sqrt_recipm1_alphas_cumprod[t][:, None]
    return (c1 * x_t - pred_xstart) / c2


def predict_xstart_from_eps(
    schedule: DiffusionSchedule, x_t: jax.Array, t: jax.Array, eps: jax.Array
) -> jax.Array:
    """Invert predict_eps_from_xstart (reference gaussian_diffusion.py:279-284)."""
    c1 = schedule.sqrt_recip_alphas_cumprod[t][:, None]
    c2 = schedule.sqrt_recipm1_alphas_cumprod[t][:, None]
    return c1 * x_t - c2 * eps

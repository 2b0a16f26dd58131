"""Stage-2 training step: diffusion loss + optax AdamW, SPMD over a mesh.

Replaces the reference's Python train loop with optimizer-inside-the-model
(reference train_egohmr.py:146-163 + models/egohmr/egohmr.py:453-472,140-147)
with a functional jitted step:

  * the whole step (q_sample -> denoise -> SMPL -> losses -> grads -> AdamW)
    is ONE compiled program per phase,
  * data parallelism via `jax.shard_map` over a 1-D mesh: batch sharded,
    params replicated, gradient/metric reduction with `psum`/`pmean` on ICI,
    cross-replica BatchNorm included (the reference has no multi-device path
    at all; SURVEY.md §2.7),
  * BatchNorm running stats are threaded functionally and excluded from the
    optimizer via an optax mask (the reference mutates module buffers).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..diffusion import DiffusionSchedule, q_sample
from ..geometry import aa_to_rotmat, rotmat_to_rot6d
from ..models import (
    BodyRepStats,
    EgoHMRConfig,
    LossWeights,
    compute_condition,
    compute_loss,
    denoise_x0,
    model_outputs,
)
from ..nn.core import cast_params_bf16, is_bn_state
from ..smpl import SMPLModel

Array = jax.Array


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4                 # reference configs/prohmr.yaml:5
    weight_decay: float = 1e-4       # reference configs/prohmr.yaml:6
    use_collision_loss: bool = False  # flips on at start_coap_epoch
    # static top-K scene cap for the collision loss, ranked by distance to
    # the posed body's bbox (exact while bbox points <= K; analogue of the
    # reference's <=4000-point crop, egohmr.py:406-412); None = full cloud
    max_collision_points: Optional[int] = 4096
    # mixed-precision training: run the conditioning encoders + denoiser
    # forward/backward in bfloat16 (BN batch stats, SMPL, losses, grads,
    # master params and AdamW state all stay f32 — bf16 shares f32's
    # exponent range, so no loss scaling is needed). The reference trains
    # pure f32 on GPU; bf16-mixed is the TPU-native TRAINING DEFAULT since
    # round 4: measured 1.73x step rate (bench.py --train, BENCH_extra.json)
    # with convergence evidence committed in
    # artifacts/train_precision_overlay.json (1.5k on-chip steps: train-loss
    # tail within 0.7% of f32, train-batch val kp3d_vis within 1.1%).
    # Set False for exact-parity f32 training (CLI --mixed_precision false).
    mixed_precision: bool = True


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW over everything except BN running stats
    (reference egohmr.py:140-147 builds AdamW over all submodules)."""
    opt = optax.adamw(tcfg.lr, weight_decay=tcfg.weight_decay)

    def mask(tree):
        def walk(node, path):
            if isinstance(node, dict):
                return {k: walk(v, path + (k,)) for k, v in node.items()}
            if isinstance(node, (list, tuple)):
                return type(node)(walk(v, path + (str(i),)) for i, v in enumerate(node))
            return not is_bn_state(path)

        return walk(tree, ())

    return optax.masked(opt, mask)


def gt_pose_to_x_start(batch: Dict, stats: BodyRepStats) -> Array:
    """GT axis-angle -> rot6d('diffusion') -> normalized 144-d x0
    (reference gaussian_diffusion.py:731-737)."""
    B = batch["smpl_params"]["betas"].shape[0]
    aa = jnp.concatenate(
        [batch["smpl_params"]["global_orient"].reshape(B, 3),
         batch["smpl_params"]["body_pose"].reshape(B, 69)], axis=1
    ).reshape(B, 24, 3)
    rotmat = aa_to_rotmat(aa.reshape(-1, 3))
    rot6d = rotmat_to_rot6d(rotmat, "diffusion").reshape(B, 144)
    return (rot6d - stats.mean) / stats.std


def stage2_loss(
    params: dict,
    cfg: EgoHMRConfig,
    weights: LossWeights,
    schedule: DiffusionSchedule,
    stats: BodyRepStats,
    smpl_neutral: SMPLModel,
    smpl_male: SMPLModel,
    smpl_female: SMPLModel,
    batch: Dict,
    key: Array,
    *,
    use_collision: bool,
    max_collision_points: Optional[int] = 4096,
    axis_name: Optional[str] = None,
    mixed_precision: bool = False,
) -> Tuple[Array, Tuple[Dict, dict]]:
    """One training forward: sample t ~ U, q_sample, denoise, loss.

    Equivalent of reference diffusion.training_losses + model.training_step
    (gaussian_diffusion.py:721-746, egohmr.py:453-472) minus the optimizer.
    Returns (loss, (metrics, params_with_new_bn_state)).

    `mixed_precision`: cast (non-BN) params + image + x_t to bf16 for the
    conditioning/denoiser forward — the backward through the casts lands f32
    gradients on the f32 master params automatically (convert_element_type
    transposes to a convert back). q_sample, SMPL, reprojection and all loss
    terms stay f32; BN batch stats are f32 inside `nn.core.batchnorm`.
    """
    B = batch["img"].shape[0]
    # Per-sample keys derived from the GLOBAL sample index: an N-way sharded
    # step draws exactly the same t/noise/cond-mask as the 1-way step on the
    # concatenated batch, so data parallelism changes nothing but wall-clock
    # (guarded by tests/test_train_infra.py DP-parity allclose).
    if axis_name is not None:
        offset = jax.lax.axis_index(axis_name) * B
    else:
        offset = 0
    sample_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        offset + jnp.arange(B)
    )
    ks = jax.vmap(lambda k: jax.random.split(k, 3))(sample_keys)
    k_t, k_noise, k_mask = ks[:, 0], ks[:, 1], ks[:, 2]

    # UniformSampler (reference resample.py:61; the only sampler in use)
    t = jax.vmap(
        lambda k: jax.random.randint(k, (), 0, schedule.num_timesteps)
    )(k_t)

    x_start = gt_pose_to_x_start(batch, stats)
    noise = jax.vmap(
        lambda k, x: jax.random.normal(k, x.shape, x.dtype)
    )(k_noise, x_start)
    x_t = q_sample(schedule, x_start, t, noise)

    fwd_params = params
    if mixed_precision:
        fwd_params = cast_params_bf16(params)
        batch = dict(batch)
        batch["img"] = batch["img"].astype(jnp.bfloat16)
    cond, p1 = compute_condition(
        fwd_params, cfg, batch, train=True, rng=k_mask, axis_name=axis_name
    )
    t_orig = schedule.timestep_map[t]
    x_t_in = x_t.astype(jnp.bfloat16) if mixed_precision else x_t
    x0_pred, p2 = denoise_x0(
        fwd_params, cfg, cond, x_t_in, t_orig, fuse=False, train=True,
        axis_name=axis_name,
    )
    if mixed_precision:
        # loss consumers (SMPL, reprojection, collision, all 8 terms) are f32
        x0_pred = x0_pred.astype(jnp.float32)
        cond = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x, cond)
    outputs = model_outputs(cfg, smpl_neutral, cond, x0_pred, stats)
    total, losses = compute_loss(
        cfg, weights, smpl_neutral, smpl_male, smpl_female, batch, cond, outputs,
        train=True, use_collision=use_collision,
        max_collision_points=max_collision_points,
    )
    new_params = dict(p1)
    new_params["diffusion_model"] = p2["diffusion_model"]
    return total, (losses, new_params)


def _merge_bn_state(params: dict, new_params: dict):
    """Take optimizer-updated weights but BN running stats from the fwd pass."""
    def walk(p, n, path):
        if isinstance(p, dict):
            return {k: walk(p[k], n[k], path + (k,)) for k in p}
        if isinstance(p, (list, tuple)):
            return type(p)(walk(a, b, path + (str(i),))
                           for i, (a, b) in enumerate(zip(p, n)))
        return n if is_bn_state(path) else p

    return walk(params, new_params, ())


def make_train_step(
    cfg: EgoHMRConfig,
    tcfg: TrainConfig,
    weights: LossWeights,
    schedule: DiffusionSchedule,
    stats: BodyRepStats,
    smpl_neutral: SMPLModel,
    smpl_male: SMPLModel,
    smpl_female: SMPLModel,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
):
    """Build the jitted SPMD train step.

    With a mesh: batch sharded over `axis`, params/opt_state replicated,
    `psum`-mean of grads and metrics, cross-replica BN. Without a mesh:
    single-device jit.
    """

    def step(params, opt_state, batch, key, *, axis_name=None):
        # per-shard RNG decorrelation happens inside stage2_loss via
        # global-sample-index keys (shard-count invariant)
        (loss, (metrics, fwd_params)), grads = jax.value_and_grad(
            stage2_loss, has_aux=True
        )(
            params, cfg, weights, schedule, stats,
            smpl_neutral, smpl_male, smpl_female, batch, key,
            use_collision=tcfg.use_collision_loss,
            max_collision_points=tcfg.max_collision_points,
            axis_name=axis_name,
            mixed_precision=tcfg.mixed_precision,
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = _merge_bn_state(new_params, fwd_params)
        return new_params, new_opt_state, metrics

    if mesh is None:
        return jax.jit(functools.partial(step, axis_name=None))

    def sharded_step(params, opt_state, batch, key):
        f = functools.partial(step, axis_name=axis)
        return jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(params, opt_state, batch, key)

    return jax.jit(sharded_step)

"""Stage-1 (ProHMR-scene) GAN training steps.

Functional version of reference models/prohmr/prohmr_scene.py:404-453 +
train_prohmr_scene.py:116-138: generator step (flow losses + adversarial)
and discriminator step on mocap real samples, as two pure jitted functions
with separate optax states (the reference hides two AdamW optimizers inside
the module, prohmr_scene.py:74-80).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import aa_to_rotmat
from ..models.discriminator import discriminator_forward
from ..models.prohmr import (
    ProHMRConfig,
    ProHMRLossWeights,
    compute_loss,
    forward,
)
from ..smpl import SMPLModel

Array = jax.Array


def generator_loss(
    params: dict,
    disc_params: dict,
    cfg: ProHMRConfig,
    w: ProHMRLossWeights,
    smpl_neutral: SMPLModel,
    smpl_male: SMPLModel,
    smpl_female: SMPLModel,
    batch: Dict,
    key: Array,
    *,
    scene_cano: bool = False,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Tuple[Dict, dict]]:
    k_sample, k_noise = jax.random.split(key)
    out, new_params = forward(
        params, cfg, smpl_neutral, batch, k_sample, cfg.num_train_samples,
        train=True, scene_cano=scene_cano, axis_name=axis_name,
    )
    loss, losses = compute_loss(
        params, cfg, w, smpl_male, smpl_female, batch, out, k_noise, train=True,
    )
    B, S = out.pred_betas.shape[:2]
    disc_out = discriminator_forward(
        disc_params,
        out.pred_pose_rotmat[:, :, 1:].reshape(B * S, 23, 3, 3),
        out.pred_betas.reshape(B * S, 10),
    )
    loss_adv = jnp.sum(jnp.square(disc_out - 1.0)) / B  # reference :436-438
    total = loss + w.adversarial * loss_adv
    losses = dict(losses)
    losses["loss_gen"] = loss_adv
    aux_out = (out.pred_pose_rotmat[:, :, 1:].reshape(B * S, 23, 3, 3),
               out.pred_betas.reshape(B * S, 10))
    return total, (losses, new_params, aux_out)


def discriminator_loss(
    disc_params: dict,
    w: ProHMRLossWeights,
    mocap_batch: Dict,
    fake_pose_rotmat: Array,
    fake_betas: Array,
) -> Tuple[Array, Dict]:
    """reference prohmr_scene.py:404-419 (LSGAN objective)."""
    gt_body_pose = mocap_batch["body_pose"]  # [B, 69] axis-angle
    gt_betas = mocap_batch["betas"]
    B = gt_body_pose.shape[0]
    gt_rotmat = aa_to_rotmat(gt_body_pose.reshape(-1, 3)).reshape(B, 23, 3, 3)

    fake_out = discriminator_forward(
        disc_params, jax.lax.stop_gradient(fake_pose_rotmat),
        jax.lax.stop_gradient(fake_betas))
    loss_fake = jnp.sum(jnp.square(fake_out - 0.0)) / fake_out.shape[0]
    real_out = discriminator_forward(disc_params, gt_rotmat, gt_betas)
    loss_real = jnp.sum(jnp.square(real_out - 1.0)) / real_out.shape[0]
    loss_disc = loss_fake + loss_real
    return w.adversarial * loss_disc, {"loss_disc": loss_disc}


def make_prohmr_train_step(
    cfg: ProHMRConfig,
    w: ProHMRLossWeights,
    smpl_neutral: SMPLModel,
    smpl_male: SMPLModel,
    smpl_female: SMPLModel,
    optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
    *,
    scene_cano: bool = False,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
):
    """G step then D step, one jitted program
    (reference train order: prohmr_scene.py:422-453)."""
    from .loop import _merge_bn_state

    def step(params, disc_params, opt_state, disc_opt_state, batch,
             mocap_batch, key, *, axis_name=None):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        (g_total, (losses, fwd_params, fake)), g_grads = jax.value_and_grad(
            generator_loss, has_aux=True
        )(params, disc_params, cfg, w, smpl_neutral, smpl_male, smpl_female,
          batch, key, scene_cano=scene_cano, axis_name=axis_name)

        (d_total, d_losses), d_grads = jax.value_and_grad(
            discriminator_loss, has_aux=True
        )(disc_params, w, mocap_batch, fake[0], fake[1])

        if axis_name is not None:
            g_grads = jax.lax.pmean(g_grads, axis_name)
            d_grads = jax.lax.pmean(d_grads, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
            d_losses = jax.lax.pmean(d_losses, axis_name)

        g_updates, new_opt_state = optimizer.update(g_grads, opt_state, params)
        new_params = optax.apply_updates(params, g_updates)
        new_params = _merge_bn_state(new_params, fwd_params)

        d_updates, new_disc_opt_state = disc_optimizer.update(
            d_grads, disc_opt_state, disc_params)
        new_disc_params = optax.apply_updates(disc_params, d_updates)

        metrics = dict(losses)
        metrics.update(d_losses)
        return (new_params, new_disc_params, new_opt_state,
                new_disc_opt_state, metrics)

    if mesh is None:
        return jax.jit(functools.partial(step, axis_name=None))

    def sharded(params, disc_params, opt_state, disc_opt_state, batch,
                mocap_batch, key):
        f = functools.partial(step, axis_name=axis)
        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(axis), P(axis), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )(params, disc_params, opt_state, disc_opt_state, batch, mocap_batch, key)

    return jax.jit(sharded)

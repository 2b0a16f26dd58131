"""Learned part-wise body SIGNED-DISTANCE field (VolumetricSMPL-family).

The reference's volsmpl variant attaches VolumetricSMPL — a pretrained
compositional neural SDF — to SMPL for collision queries (reference
models/egohmr/egohmr_volsmpl.py:134-135 `attach_volume`; eval_coll queries
`volume.query_fast(points, smpl_out)` and counts `sdf < 0` at :566-580;
guide_coll calls the batched `volume.collision_loss(points, smpl_out)` at
:608-620). Its pretrained weights are distributed out-of-band, so — like
`neural_occupancy.py` for COAP — this module provides the same *family*
TPU-natively:

  * same part decomposition / canonicalization as the occupancy net (one
    part per SMPL joint, points taken into each part's posed bone frame);
  * a per-part latent from the part's bone transform + betas + a learned
    part code;
  * a shared MLP regresses a TRUNCATED part-local signed distance;
  * part fields compose with a min (distance to a union of parts).

Weights are obtained IN-framework by distilling the exact mesh SDF
(`collision/sdf.py` — `distill_sdf` below; CLI
`python -m egohmr_tpu.train.distill_sdf`), and a released VolumetricSMPL
checkpoint converts through `interop/volsmpl_convert.py` into the
`per_part_networks` layout. The query/loss surface matches what the
reference calls:

  reference                                   here
  volume.query_fast(pts, smpl_out) -> sdf     sdf_query(...) -> [B, P]
  volume.collision_loss(pts, smpl_out) -> [B] sdf_collision_loss(...)
  (guide_coll volsmpl path :583-626)          make_volsdf_guidance_fn(...)

Note the reference's eval_coll loops over the batch in Python with a
per-item dynamic bbox crop (egohmr_volsmpl.py:562-579); here the query is
one batched program over [B, P] with a bbox MASK — same statistic, static
shapes, one device dispatch.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn.core import linear_init
from ..smpl.model import SMPLModel, SMPLOutput
from .neural_occupancy import (
    NUM_PARTS,
    _load_collision_net,
    make_learned_guidance_fn,
    masked_mean_loss,
    part_field_raw,
    sample_labeled_batch,
)

Array = jax.Array


@dataclass(frozen=True)
class SDFNetConfig:
    latent_dim: int = 64
    hidden_dim: int = 128
    num_layers: int = 4
    # learned per-part identity code (see OccupancyConfig.part_embed_dim —
    # without it the encoder cannot tell parts apart from the bone
    # transform alone)
    part_embed_dim: int = 32
    # truncation radius (meters): distillation clamps labels to ±trunc and
    # the net's output is bounded to the same range (tanh). Queries beyond
    # the truncation band saturate — collision losses only need the
    # near-surface/inside region, exactly like DeepSDF-style truncated SDFs.
    trunc: float = 0.15
    # exact-release layout: SEPARATE per-part MLP weights stacked over the
    # part axis ([K, in, out] leaves, one part-batched einsum — the same
    # TPU-native formulation as OccupancyConfig.per_part_networks).
    # Populated by interop.volsmpl_convert.convert_volsmpl().
    per_part_networks: bool = False
    activation: str = "relu"
    leaky_slope: float = 0.01
    # converted releases regress raw (unbounded) signed distance; the
    # distilled family regresses tanh-bounded truncated SDF
    bounded_output: bool = True


def init_sdfnet(key: Array, cfg: SDFNetConfig = SDFNetConfig()) -> dict:
    ks = jax.random.split(key, cfg.num_layers + 4)
    enc_in = 12 + 10 + cfg.part_embed_dim
    params = {
        "encoder": {
            "l0": linear_init(ks[0], enc_in, cfg.latent_dim),
            "l1": linear_init(ks[1], cfg.latent_dim, cfg.latent_dim),
        },
        "decoder": [],
    }
    if cfg.part_embed_dim:
        params["part_embed"] = 0.1 * jax.random.normal(
            ks[-1], (NUM_PARTS, cfg.part_embed_dim))
    in_dim = 3 + cfg.latent_dim
    for i in range(cfg.num_layers):
        out_dim = cfg.hidden_dim if i < cfg.num_layers - 1 else 1
        params["decoder"].append(linear_init(ks[2 + i], in_dim, out_dim))
        in_dim = cfg.hidden_dim
    return params


def load_sdfnet(path: str) -> Tuple[dict, SDFNetConfig]:
    """Load collision-net weights for the volsdf backend.

    * `.npz` (+ `.json` sidecar): a distilled artifact written by
      `python -m egohmr_tpu.train.distill_sdf`;
    * `.pt` / `.pth` / `.ckpt`: a pretrained VolumetricSMPL release —
      converted through `interop.volsmpl_convert.convert_volsmpl`
      (reference egohmr_volsmpl.py:134-135 `attach_volume`).
    """
    def convert(sd):
        from ..interop.volsmpl_convert import convert_volsmpl

        return convert_volsmpl(sd)

    return _load_collision_net(path, SDFNetConfig, "sdf_config",
                               convert, init_sdfnet)


def sdf_query(
    params: dict,
    cfg: SDFNetConfig,
    model: SMPLModel,
    smpl_out: SMPLOutput,
    betas: Array,
    points: Array,
) -> Array:
    """Signed distance (meters) to the posed body for scene points.

    points: [B, P, 3] -> [B, P]; < 0 means inside the body. Batched
    equivalent of reference `self.smpl_volsmpl.volume.query_fast(points,
    smpl_out)` (egohmr_volsmpl.py:574).
    """
    # the shared COAP/VolSMPL-family part-field forward; only the head
    # below differs from the occupancy backend
    raw = part_field_raw(params, cfg, model, smpl_out, betas, points)
    if cfg.bounded_output:
        raw = cfg.trunc * jnp.tanh(raw)
    # union of parts: distance to the union is the min over part fields
    return jnp.min(raw, axis=1)


def sdf_collision_loss(sdf: Array, mask: Array | None = None) -> Array:
    """Squared penetration depth, averaged per batch item; [B, P] -> [B].

    Batched equivalent of reference
    `volume.collision_loss(points, smpl_out)` (egohmr_volsmpl.py:608-620
    — the volsmpl path is batched in the reference too, unlike COAP's).
    """
    return masked_mean_loss(jnp.square(jnp.maximum(-sdf, 0.0)), mask)


def make_volsdf_guidance_fn(
    sdf_params: dict,
    sdf_cfg: SDFNetConfig,
    model: SMPLModel,
    cond,                       # models.egohmr.Condition
    stats,                      # models.egohmr.BodyRepStats
    *,
    max_scene_points: int | None = 4096,
):
    """Collision guidance through the LEARNED SDF — drop-in alternative for
    models.egohmr.make_guidance_fn, mirroring the reference volsmpl
    guide_coll (egohmr_volsmpl.py:583-626: grad of -collision_loss wrt x_t
    through rot6d -> LBS -> volume, lower-body joints only with the same
    1x/2x scaling). Selected by the eval CLI's --collision_backend volsdf.
    """
    def collision_mean(out, betas, scene):
        sdf = sdf_query(sdf_params, sdf_cfg, model, out, betas, scene)
        return jnp.mean(sdf_collision_loss(sdf))

    return make_learned_guidance_fn(collision_mean, model, cond, stats,
                                    max_scene_points=max_scene_points)


def sdf_agreement(
    params: dict,
    cfg: SDFNetConfig,
    model: SMPLModel,
    key: Array,
    *,
    n_bodies: int = 16,
    points_per_body: int = 1024,
    label_mode: str = "winding",
    sign_k: int = 4,
) -> dict:
    """Held-out quality of the learned SDF vs the exact mesh SDF on fresh
    poses: inside/outside SIGN agreement (the shipped-artifact bar, same
    as the occupancy family's) plus the truncated-value MAE and the MAE
    restricted to the near-surface band (|sdf| < trunc/2) where guidance
    gradients live."""
    betas, out, pts, sdf = sample_labeled_batch(
        key, model, batch_bodies=n_bodies, points_per_body=points_per_body,
        label_mode=label_mode, sign_k=sign_k)
    pred = sdf_query(params, cfg, model, out, betas, pts)
    label = jnp.clip(sdf, -cfg.trunc, cfg.trunc)
    agree = (pred < 0.0) == (sdf < 0.0)
    err = jnp.abs(pred - label)
    band = (jnp.abs(sdf) < cfg.trunc / 2).astype(jnp.float32)
    return {
        "sign_agreement": float(jnp.mean(agree.astype(jnp.float32))),
        "mae_truncated_m": float(jnp.mean(err)),
        "mae_near_surface_m": float(
            jnp.sum(err * band) / jnp.maximum(jnp.sum(band), 1.0)),
    }


def distill_sdf(
    key: Array,
    model: SMPLModel,
    cfg: SDFNetConfig = SDFNetConfig(),
    *,
    steps: int = 300,
    batch_bodies: int = 4,
    points_per_body: int = 512,
    lr: float = 1e-3,
    label_mode: str = "winding",
    sign_k: int = 4,
    log_every: int = 0,
) -> dict:
    """Train the SDF net against the exact mesh SDF on random poses.

    Labels are truncated to ±cfg.trunc (DeepSDF-style): the collision use
    case only needs the near-surface/inside field. Loss is L2 on the
    truncated value plus a sign hinge that sharpens the zero crossing
    (value regression alone leaves the boundary soft exactly where
    collision queries read it).
    """
    import optax

    params = init_sdfnet(key, cfg)
    opt = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1)))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        betas, out, pts, sdf = sample_labeled_batch(
            k, model, batch_bodies=batch_bodies,
            points_per_body=points_per_body, label_mode=label_mode,
            sign_k=sign_k)
        label = jnp.clip(sdf, -cfg.trunc, cfg.trunc)
        sign = jnp.sign(sdf)

        def loss_fn(p):
            pred = sdf_query(p, cfg, model, out, betas, pts)
            value = jnp.mean(jnp.square(pred - label))
            # hinge: prediction must carry the label's sign with a small
            # margin; weights the decision boundary the value loss blurs
            hinge = jnp.mean(jnp.maximum(0.01 - sign * pred, 0.0))
            return value + 0.1 * hinge

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    k = key
    for i in range(steps):
        k, sub = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, sub)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"[distill-sdf] step {i} loss {float(loss):.6f}")
    return params

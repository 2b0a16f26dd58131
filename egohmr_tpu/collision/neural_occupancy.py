"""Learned part-wise body occupancy (COAP-family) in JAX.

The reference attaches COAP — a pretrained compositional neural-occupancy
model — to SMPL for collision queries (reference models/egohmr/egohmr.py:117,
416, 509, 555). Its pretrained weights are distributed out-of-band, so this
module provides the same *family* of model TPU-natively:

  * the body is decomposed into K parts along the kinematic tree;
  * scene points are canonicalized into each part's local frame (the part's
    root-bone rigid transform — COAP's localization step);
  * a per-part latent comes from the part's posed bone transforms;
  * a shared MLP decodes occupancy logits conditioned on the part latent;
  * part occupancies compose with a max (a point is inside the body if it is
    inside any part).

Weights are obtained IN-framework by distilling the exact mesh SDF
(`collision/sdf.py`) — `distill_occupancy` below — rather than imported, so
the collision backend is learnable end-to-end and testable without any
external release. The query/loss interface matches what the reference calls
(`coap.query`, `coap.collision_loss`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import linear, linear_init, relu
from ..smpl import constants as C
from ..smpl.model import SMPLModel, SMPLOutput, lbs, vertex_normals
from .sdf import signed_distance

Array = jax.Array

# part decomposition: one part per skeleton joint, points canonicalized by
# that joint's global transform. 24 parts like COAP's SMPL setting.
NUM_PARTS = 24


@dataclass(frozen=True)
class OccupancyConfig:
    latent_dim: int = 64
    hidden_dim: int = 128
    num_layers: int = 4
    # learned per-part identity code fed to the latent encoder (COAP keys its
    # part networks by index; without this the encoder must infer "which part
    # am I" from the bone transform alone — measurably unlearnable past ~0.87
    # signed agreement). 0 keeps the round-2 tree layout (old artifacts).
    part_embed_dim: int = 0
    # soft scale applied to the sdf -> occupancy label during distillation
    label_sharpness: float = 50.0
    # exact-COAP layout: SEPARATE encoder/decoder weights per part (the
    # published COAP keys its networks by part index) instead of one shared
    # net + part code. Param leaves are STACKED over the part axis
    # ([K, in, out]) so the forward is one part-batched einsum — the
    # TPU-native formulation of "24 small MLPs" (no Python loop over parts,
    # one MXU-friendly contraction). Populated by interop.convert_coap().
    per_part_networks: bool = False
    # activation of the per-part nets (the published COAP uses LeakyReLU;
    # the distilled family uses ReLU)
    activation: str = "relu"
    leaky_slope: float = 0.01


def _activation(cfg):
    """Activation from a collision-net config (duck-typed: OccupancyConfig
    or neural_sdf.SDFNetConfig — both carry activation/leaky_slope)."""
    if cfg.activation == "relu":
        return relu
    if cfg.activation == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, cfg.leaky_slope)
    if cfg.activation == "softplus":
        return jax.nn.softplus
    raise ValueError(f"unknown collision-net activation: {cfg.activation}")


def init_occupancy(key: Array, cfg: OccupancyConfig = OccupancyConfig()) -> dict:
    # jax.random.split is prefix-stable in the count (split(k, n)[i] does not
    # depend on n), so the extra key appended for part_embed leaves the
    # part-code-free round-2 streams — and the shipped artifacts'
    # seed-reproducibility — unchanged.
    ks = jax.random.split(key, cfg.num_layers + 4)
    # per-part latent from the part's bone transform (12 numbers) + betas
    # (+ the learned part code when enabled)
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


def load_occupancy(path: str) -> Tuple[dict, OccupancyConfig]:
    """Load collision-net weights for the occupancy backend.

    * `.npz` (+ `.json` sidecar): a distilled artifact written by
      `python -m egohmr_tpu.train.distill_occupancy`;
    * `.pt` / `.pth` / `.ckpt`: a pretrained COAP release checkpoint —
      converted through `interop.coap_convert.convert_coap` into the
      `per_part_networks` layout (weight drop-in path; reference
      egohmr.py:117 `attach_coap`).
    """
    def convert(sd):
        from ..interop.coap_convert import convert_coap

        return convert_coap(sd)

    return _load_collision_net(path, OccupancyConfig, "occupancy_config",
                               convert, init_occupancy)


def _load_collision_net(path: str, cfg_cls, meta_key: str, convert_torch,
                        init_fn):
    """Shared loader for the learned collision backends (occupancy and
    neural_sdf's volsdf).

    * `.npz` (+ `.json` sidecar): a distilled or re-saved artifact. A
      `per_part_networks` config means a converted-release layout that the
      init fn can't template — the tree is rebuilt from the flat keys
      (utils.checkpoint.load_npz_tree).
    * `.pt` / `.pth` / `.ckpt`: a pretrained torch release, mapped through
      `convert_torch` (a lazy-importing callable on the raw state dict).
    """
    import json
    import os

    if path.endswith((".pt", ".pth", ".ckpt")):
        from ..interop.torch_convert import load_torch_checkpoint

        return convert_torch(load_torch_checkpoint(path))

    from ..utils.checkpoint import load_npz_into, load_npz_tree

    cfg = cfg_cls()
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        cfg = cfg_cls(**meta.get(meta_key, {}))
    if cfg.per_part_networks:
        return load_npz_tree(path), cfg
    return load_npz_into(path, init_fn(jax.random.PRNGKey(0), cfg)), cfg


def _part_transforms(model: SMPLModel, out: SMPLOutput) -> Tuple[Array, Array]:
    """Per-part global rigid transforms from the posed skeleton.

    Rebuilt from joints + rotations: part k's frame = (R_k_global, j_k).
    Returns (rot [B,24,3,3], trans [B,24,3]).
    """
    # accumulate global rotations down the chain
    parents = np.asarray(C.PARENTS)
    rots = [out.full_pose[:, 0]]
    for k in range(1, 24):
        rots.append(jnp.matmul(rots[parents[k]], out.full_pose[:, k]))
    rot = jnp.stack(rots, axis=1)  # [B, 24, 3, 3]
    return rot, out.joints_smpl[:, :24]


def part_field_raw(
    params: dict,
    cfg,
    model: SMPLModel,
    smpl_out: SMPLOutput,
    betas: Array,
    points: Array,
) -> Array:
    """Raw per-part field for scene points: [B, P, 3] -> [B, 24, P].

    The shared COAP/VolumetricSMPL-family forward (canonicalize each point
    into every part's posed bone frame, encode a per-part latent from the
    bone transform + betas (+ part code), decode a per-point scalar) —
    only the output head differs between the occupancy and signed-distance
    backends, so both `occupancy_query` and `neural_sdf.sdf_query` call
    this. `cfg` is duck-typed (OccupancyConfig or SDFNetConfig):
    part_embed_dim / per_part_networks / activation fields only.
    """
    B, P, _ = points.shape
    rot, trans = _part_transforms(model, smpl_out)  # [B,24,3,3], [B,24,3]

    # canonicalize: x_local = R_kᵀ (x - j_k)   [B, 24, P, 3]
    rel = points[:, None, :, :] - trans[:, :, None, :]
    local = jnp.einsum("bkij,bkpi->bkpj", rot, rel)

    # per-part latent from flattened bone transform + betas (+ part code)
    enc_feats = [rot.reshape(B, 24, 9), trans,
                 jnp.broadcast_to(betas[:, None, :], (B, 24, 10))]
    if cfg.part_embed_dim:
        enc_feats.append(jnp.broadcast_to(
            params["part_embed"][None], (B, 24, cfg.part_embed_dim)))
    feats = jnp.concatenate(enc_feats, axis=-1)

    if cfg.per_part_networks:
        # exact-release layout: per-part weight stacks, part-batched einsums
        act = _activation(cfg)
        h = feats  # [B, 24, Din]
        enc = params["part_encoder"]
        for i, lp in enumerate(enc):
            h = jnp.einsum("bkd,kdo->bko", h, lp["w"]) + lp["b"]
            if i < len(enc) - 1:
                h = act(h)
        latent = h
        x = jnp.concatenate(
            [local, jnp.broadcast_to(latent[:, :, None, :],
                                     (B, 24, P, latent.shape[-1]))], axis=-1)
        dec = params["part_decoder"]
        for i, lp in enumerate(dec):
            x = (jnp.einsum("bkpd,kdo->bkpo", x, lp["w"])
                 + lp["b"][:, None, :])
            if i < len(dec) - 1:
                x = act(x)
        return x[..., 0]  # [B, 24, P]

    h = relu(linear(params["encoder"]["l0"], feats))
    latent = linear(params["encoder"]["l1"], h)  # [B, 24, D]

    x = jnp.concatenate(
        [local, jnp.broadcast_to(latent[:, :, None, :],
                                 (B, 24, P, latent.shape[-1]))], axis=-1)
    for i, lp in enumerate(params["decoder"]):
        x = linear(lp, x)
        if i < len(params["decoder"]) - 1:
            x = relu(x)
    return x[..., 0]  # [B, 24, P]


def occupancy_query(
    params: dict,
    cfg: OccupancyConfig,
    model: SMPLModel,
    smpl_out: SMPLOutput,
    betas: Array,
    points: Array,
) -> Array:
    """Occupancy in [0, 1] for scene points. points: [B, P, 3] -> [B, P].

    Equivalent surface to reference `self.smpl.coap.query(points, smpl_out)`
    (egohmr.py:509). >0.5 means inside the body.
    """
    logits = part_field_raw(params, cfg, model, smpl_out, betas, points)
    # compose parts: inside any part -> inside body (smooth max)
    return jax.nn.sigmoid(jnp.max(logits, axis=1))


def masked_mean_loss(pen: Array, mask: Array | None = None) -> Array:
    """Mean of a per-point penalty over valid points; [B, P] -> [B].
    Shared normalization of the learned-collision losses (occupancy and
    neural_sdf's volsdf)."""
    if mask is not None:
        pen = pen * mask
        return jnp.sum(pen, axis=-1) / jnp.maximum(jnp.sum(mask, -1), 1.0)
    return jnp.mean(pen, axis=-1)


def occupancy_collision_loss(occ: Array, mask: Array | None = None) -> Array:
    """Penalize scene points predicted inside the body; [B, P] -> [B].
    Mirrors COAP's collision loss usage (egohmr.py:416-418)."""
    return masked_mean_loss(jnp.square(jnp.maximum(occ - 0.5, 0.0)), mask)


def make_learned_guidance_fn(
    collision_mean,
    model: SMPLModel,
    cond,                       # models.egohmr.Condition
    stats,                      # models.egohmr.BodyRepStats
    *,
    max_scene_points: int | None = 4096,
):
    """Shared scaffold of the learned-collision guidance closures — the
    drop-in alternatives for models.egohmr.make_guidance_fn, mirroring the
    reference guide_coll structure (egohmr.py:517-605 /
    egohmr_volsmpl.py:583-626): grad of -collision wrt x_t through
    rot6d -> LBS -> the learned field, with the reference's per-joint 1x/2x
    scaling. `collision_mean(smpl_out, betas, scene)` evaluates the
    backend's scalar mean collision loss (see make_occupancy_guidance_fn /
    neural_sdf.make_volsdf_guidance_fn)."""
    from ..geometry import rot6d_to_rotmat
    from ..models.egohmr import _GUIDE_JOINT_SCALE
    from .sdf import topk_scene_points

    scale = jnp.asarray(_GUIDE_JOINT_SCALE)[None, :, None]
    betas = jax.lax.stop_gradient(cond.pred_betas)
    scene = topk_scene_points(
        jax.lax.stop_gradient(cond.scene_pcd), max_scene_points)

    def neg_collision(x_t: Array) -> Array:
        pose6d = x_t * stats.std + stats.mean
        rotmat = rot6d_to_rotmat(pose6d, "diffusion").reshape(-1, 24, 3, 3)
        out = lbs(model, betas, rotmat[:, :1], rotmat[:, 1:], pose2rot=False)
        return -collision_mean(out, betas, scene)

    def fn(x_t: Array, t: Array) -> Array:
        grad = jax.grad(neg_collision)(x_t).reshape(-1, 24, 6) * scale
        return grad.reshape(x_t.shape[0], 144)

    return fn


def make_occupancy_guidance_fn(
    occ_params: dict,
    occ_cfg: OccupancyConfig,
    model: SMPLModel,
    cond,                       # models.egohmr.Condition
    stats,                      # models.egohmr.BodyRepStats
    *,
    max_scene_points: int | None = 4096,
):
    """Collision guidance through the LEARNED occupancy instead of the mesh
    SDF — drop-in alternative for models.egohmr.make_guidance_fn, mirroring
    the reference's COAP-gradient path (egohmr.py:517-605). Selected by the
    eval CLI's --collision_backend occupancy."""
    def collision_mean(out, betas, scene):
        occ = occupancy_query(occ_params, occ_cfg, model, out, betas, scene)
        return jnp.mean(occupancy_collision_loss(occ))

    return make_learned_guidance_fn(collision_mean, model, cond, stats,
                                    max_scene_points=max_scene_points)


def sample_labeled_batch(
    k: Array,
    model: SMPLModel,
    *,
    batch_bodies: int,
    points_per_body: int,
    label_mode: str = "signed",
    proximity_tau: float = 0.08,
    sign_k: int = 4,
):
    """Random posed bodies + query points + exact mesh-SDF labels.

    Shared by distillation training and the held-out agreement metric.
    Returns (betas, smpl_out, points [B,P,3], sdf [B,P]).

    label_mode 'signed' uses the normal-signed SDF with the robust k-NN
    sign vote (sign_k); 'winding' uses the EXACT generalized-winding-number
    inside test (the ground truth for a watertight mesh — near part overlaps
    the normal vote mislabels ~12% of near-surface points, which caps any
    distilled net's agreement; measured on make_synthetic_watertight_model);
    'proximity' uses unsigned distance < tau — the right target for point
    clouds without trustworthy normals.
    """
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    betas = jax.random.normal(k1, (batch_bodies, 10)) * 0.5
    aa = jax.random.normal(k2, (batch_bodies, 24, 3)) * 0.2
    out = lbs(model, betas, aa[:, :1].reshape(-1, 3),
              aa[:, 1:].reshape(batch_bodies, 69), pose2rot=True)
    # half uniform in the bbox, half biased near the surface (COAP-style
    # sampling): surface points + gaussian jitter
    half = points_per_body // 2
    lo = jnp.min(out.vertices, axis=1, keepdims=True) - 0.2
    hi = jnp.max(out.vertices, axis=1, keepdims=True) + 0.2
    u = jax.random.uniform(k3, (batch_bodies, half, 3))
    pts_uniform = lo + u * (hi - lo)
    vid = jax.random.randint(
        k4, (batch_bodies, points_per_body - half),
        0, model.v_template.shape[0])
    surf = jnp.take_along_axis(out.vertices, vid[..., None], axis=1)
    pts_near = surf + 0.05 * jax.random.normal(k5, surf.shape)
    pts = jnp.concatenate([pts_uniform, pts_near], axis=1)
    if label_mode == "signed":
        normals = vertex_normals(out.vertices, model.faces)
        sdf = signed_distance(pts, out.vertices, normals, block_size=512,
                              sign_k=sign_k)
    elif label_mode == "winding":
        from .sdf import signed_distance_winding

        sdf = signed_distance_winding(pts, out.vertices, model.faces,
                                      block_size=512, face_block_size=1024)
    elif label_mode == "proximity":
        # proximity: inside = within tau of the surface point cloud
        from .sdf import nearest_vertex

        sdf = nearest_vertex(pts, out.vertices,
                             block_size=512).dist - proximity_tau
    else:
        raise ValueError(f"unknown label_mode: {label_mode}")
    return betas, out, pts, sdf


def occupancy_agreement(
    params: dict,
    cfg: OccupancyConfig,
    model: SMPLModel,
    key: Array,
    *,
    n_bodies: int = 16,
    points_per_body: int = 1024,
    label_mode: str = "signed",
    proximity_tau: float = 0.08,
    sign_k: int = 4,
) -> float:
    """Held-out inside/outside agreement of the learned occupancy vs the
    exact mesh SDF on freshly sampled poses — the accuracy bar for the
    distilled artifact (round-1 verdict, Next #3)."""
    betas, out, pts, sdf = sample_labeled_batch(
        key, model, batch_bodies=n_bodies, points_per_body=points_per_body,
        label_mode=label_mode, proximity_tau=proximity_tau, sign_k=sign_k)
    occ = occupancy_query(params, cfg, model, out, betas, pts)
    agree = (occ > 0.5) == (sdf < 0.0)
    return float(jnp.mean(agree.astype(jnp.float32)))


def distill_occupancy(
    key: Array,
    model: SMPLModel,
    cfg: OccupancyConfig = OccupancyConfig(),
    *,
    steps: int = 300,
    batch_bodies: int = 4,
    points_per_body: int = 512,
    lr: float = 1e-3,
    label_mode: str = "signed",
    proximity_tau: float = 0.08,
    sign_k: int = 4,
    log_every: int = 0,
) -> dict:
    """Train the occupancy net against the exact mesh SDF on random poses.

    Returns trained params. This is how the framework obtains 'pretrained'
    collision weights without any external release (CLI:
    `python -m egohmr_tpu.train.distill_occupancy`).
    """
    import optax

    params = init_occupancy(key, cfg)
    # cosine decay to ~0: the late low-lr phase sharpens the decision
    # boundary near the surface, worth several points of agreement
    opt = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1)))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        betas, out, pts, sdf = sample_labeled_batch(
            k, model, batch_bodies=batch_bodies,
            points_per_body=points_per_body, label_mode=label_mode,
            proximity_tau=proximity_tau, sign_k=sign_k)
        label = jax.nn.sigmoid(-cfg.label_sharpness * sdf)  # inside -> 1

        def loss_fn(p):
            occ = occupancy_query(p, cfg, model, out, betas, pts)
            return jnp.mean(jnp.square(occ - label))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    k = key
    for i in range(steps):
        k, sub = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, sub)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"[distill] step {i} loss {float(loss):.5f}")
    return params

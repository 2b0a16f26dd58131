"""Stage-1 ProHMR-scene: conditional-flow HMR with scene conditioning (JAX).

Functional restructuring of reference models/prohmr/prohmr_scene.py:16-464.
Used in the two-stage pipeline for its camera/body translation prediction
(reference README.md:74-77; its pkl of `pred_cam_full_list` feeds stage 2,
test_prohmr_scene.py:417-427).

Key changes vs the reference:
  * ActNorm lazy init (mutable `initialized` buffer, prohmr_scene.py:71,82-97)
    becomes an explicit `initialize(params, batch)` pass returning new params.
  * The mode (z=0) and the random samples go through the flow in ONE batched
    inverse pass instead of two calls (prohmr_scene.py:144-150).
  * The GAN steps are pure functions returning grads/params (the reference
    owns optimizers inside the module, prohmr_scene.py:74-80,404-453).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..flow import (
    GlowConfig,
    glow_log_prob,
    glow_sample_and_log_prob,
    init_glow,
    initialize_actnorms,
)
from ..geometry import (
    aa_to_rotmat,
    convert_pare_to_full_img_cam,
    perspective_projection,
    rot6d_to_rotmat,
)
from ..nn import (
    fc_head,
    init_fc_head,
    init_pointnet,
    init_resnet,
    pointnet_forward,
    resnet_forward,
)
from ..smpl import SMPLModel, lbs
from ..smpl import constants as C

Array = jax.Array


@dataclass(frozen=True)
class ProHMRConfig:
    """Defaults per reference configs/prohmr.yaml + train_prohmr_scene.py."""

    img_feat_dim: int = 2048
    resnet_layers: int = 50
    backbone_type: str = "resnet"
    scene_feat_dim: int = 512
    pointnet_hidden_dim: int = 256
    # "fused" = whole-network Pallas scene encoder at inference
    # (nn/pointnet_fused.py); CPU/training always use "xla"
    pointnet_impl: str = "xla"
    flow_dim: int = 144
    flow_hidden: int = 1024
    flow_layers: int = 4
    flow_depth: int = 2
    fc_head_hidden: int = 1024
    with_focal_length: bool = True
    with_bbox_info: bool = True
    with_cam_center: bool = True
    num_train_samples: int = 2   # prohmr.yaml:7
    num_test_samples: int = 4    # prohmr.yaml:8 (well, 4; mode + 3)
    fx_norm_coeff: float = 1500.0
    default_focal_length: float = 5000.0
    img_size: int = 224
    full_img_w: float = 1920.0
    full_img_h: float = 1080.0
    smpl_param_noise_ratio: float = 0.005  # prohmr.yaml:10

    @property
    def cam_feat_dim(self) -> int:
        return (1 if self.with_focal_length else 0) + \
               (3 if self.with_bbox_info else 0) + \
               (2 if self.with_cam_center else 0)

    @property
    def context_feats_dim(self) -> int:
        return self.img_feat_dim + self.cam_feat_dim + self.scene_feat_dim

    def glow_config(self) -> GlowConfig:
        return GlowConfig(
            features=self.flow_dim,
            hidden_features=self.flow_hidden,
            num_layers=self.flow_layers,
            num_blocks_per_layer=self.flow_depth,
            context_features=self.context_feats_dim,
        )


def init_prohmr(
    key: Array, cfg: ProHMRConfig,
    mean_betas: Optional[Array] = None, mean_cam: Optional[Array] = None,
) -> dict:
    ks = jax.random.split(key, 4)
    if mean_betas is None:
        mean_betas = jnp.zeros((10,))
    if mean_cam is None:
        mean_cam = jnp.array([0.9, 0.0, 0.0])
    if cfg.backbone_type == "resnet":
        backbone = init_resnet(ks[0], cfg.resnet_layers)
    else:
        from ..nn.core import conv_init, linear_init

        backbone = {
            "conv": conv_init(ks[0], 8, 8, 3, 16),
            "proj": linear_init(jax.random.fold_in(ks[0], 1), 16, cfg.img_feat_dim),
        }
    return {
        "backbone": backbone,
        "scene_enc": init_pointnet(ks[1], cfg.scene_feat_dim, cfg.pointnet_hidden_dim),
        "flow": init_glow(ks[2], cfg.glow_config()),
        "fc_head": init_fc_head(ks[3], cfg.context_feats_dim, mean_betas, mean_cam,
                                cfg.fc_head_hidden),
    }


def _backbone_feats(params, cfg, img, *, train, axis_name):
    if cfg.backbone_type == "resnet":
        feats, new_bb = resnet_forward(params["backbone"], img, train=train,
                                       axis_name=axis_name)
    else:
        from ..nn.core import conv2d, linear, relu

        h = relu(conv2d(params["backbone"]["conv"], img, stride=8))
        feats = linear(params["backbone"]["proj"], jnp.mean(h, axis=(1, 2)))
        new_bb = params["backbone"]
    return feats, new_bb


def conditioning_feats(
    params: dict, cfg: ProHMRConfig, batch: Dict[str, Array], *,
    train: bool = False, scene_cano: bool = False,
    axis_name: Optional[str] = None,
) -> Tuple[Array, dict]:
    """Image + camera-info + scene context [B, ctx]
    (reference prohmr_scene.py:110-130; order: [cam_center][bbox][fx][img][scene])."""
    img_feats, new_bb = _backbone_feats(params, cfg, batch["img"],
                                        train=train, axis_name=axis_name)
    feats = img_feats
    orig_fx = batch["fx"] * cfg.fx_norm_coeff
    if cfg.with_focal_length:
        feats = jnp.concatenate([batch["fx"][:, None], feats], axis=-1)
    if cfg.with_bbox_info:
        bbox_info = jnp.stack(
            [batch["box_center"][:, 0] / orig_fx,
             batch["box_center"][:, 1] / orig_fx,
             batch["box_size"] / orig_fx], axis=-1)
        feats = jnp.concatenate([bbox_info, feats], axis=-1)
    if cfg.with_cam_center:
        cc = jnp.stack([batch["cam_cx"] / orig_fx, batch["cam_cy"] / orig_fx],
                       axis=-1)
        feats = jnp.concatenate([cc, feats], axis=-1)

    scene = batch["scene_pcd_verts_full"]
    if scene_cano:
        scene = scene - batch["smpl_params"]["transl"][:, None, :]
    use_fused = (
        getattr(cfg, "pointnet_impl", "xla") == "fused" and not train
        and jax.default_backend() not in ("cpu",)
    )
    if use_fused:
        from ..nn.pointnet_fused import pointnet_forward_fused

        scene_feats = pointnet_forward_fused(params["scene_enc"], scene)
    else:
        scene_feats = pointnet_forward(params["scene_enc"], scene)
    feats = jnp.concatenate([feats, scene_feats], axis=-1)

    new_params = dict(params)
    new_params["backbone"] = new_bb
    return feats, new_params


def gt_pose_prohmr_6d(batch: Dict[str, Array]) -> Array:
    """GT pose -> 144-d rot6d in the 'prohmr' layout
    (reference prohmr_scene.py:91-92,340-341)."""
    B = batch["smpl_params"]["betas"].shape[0]
    aa = jnp.concatenate(
        [batch["smpl_params"]["global_orient"].reshape(B, 1, 3),
         batch["smpl_params"]["body_pose"].reshape(B, 23, 3)], axis=1)
    rotmat = aa_to_rotmat(aa.reshape(-1, 3))  # [B*24, 3, 3]
    six = jnp.transpose(rotmat[:, :, :2], (0, 2, 1)).reshape(B, 24 * 6)
    return six


def initialize(params: dict, cfg: ProHMRConfig, batch: Dict[str, Array],
               *, scene_cano: bool = False) -> dict:
    """Explicit ActNorm data-dependent init from GT poses
    (reference prohmr_scene.py:82-97)."""
    ctx, _ = conditioning_feats(params, cfg, batch, train=False,
                                scene_cano=scene_cano)
    x = gt_pose_prohmr_6d(batch)
    new_params = dict(params)
    new_params["flow"] = initialize_actnorms(params["flow"], cfg.glow_config(),
                                             x, ctx)
    return new_params


class ProHMROutput(NamedTuple):
    pred_pose_6d: Array        # [B, S, 144] ('prohmr' layout)
    pred_pose_rotmat: Array    # [B, S, 24, 3, 3]
    pred_betas: Array          # [B, S, 10]
    pred_cam: Array            # [B, S, 3] weak-perspective
    pred_cam_t: Array          # [B, S, 3] crop camera translation
    pred_cam_t_full: Array     # [B, S, 3] full-image translation (stage-2 input)
    log_prob: Array            # [B, S]
    pred_keypoints_3d: Array   # [B, S, 45, 3]
    pred_vertices: Array       # [B, S, V, 3]
    pred_keypoints_3d_full: Array  # [B, S, 45, 3]
    pred_keypoints_2d: Array   # [B, S, 45, 2] crop, normalized
    pred_keypoints_2d_full: Array  # [B, S, 45, 2] full, normalized
    conditioning_feats: Array  # [B, ctx]


def forward(
    params: dict,
    cfg: ProHMRConfig,
    smpl: SMPLModel,
    batch: Dict[str, Array],
    key: Optional[Array],
    num_samples: int,
    *,
    train: bool = False,
    scene_cano: bool = False,
    axis_name: Optional[str] = None,
) -> Tuple[ProHMROutput, dict]:
    """Sample num_samples poses; sample 0 is ALWAYS the z=0 mode
    (reference prohmr_scene.py:100-224, mode/exp convention :138-150).
    """
    B = batch["img"].shape[0]
    ctx, new_params = conditioning_feats(
        params, cfg, batch, train=train, scene_cano=scene_cano,
        axis_name=axis_name,
    )
    gcfg = cfg.glow_config()

    z = jnp.zeros((B, num_samples, cfg.flow_dim))
    if num_samples > 1:
        assert key is not None
        z_rand = jax.random.normal(key, (B, num_samples - 1, cfg.flow_dim))
        z = z.at[:, 1:].set(z_rand)

    pose_6d, log_prob, _ = glow_sample_and_log_prob(
        params["flow"], gcfg, ctx, noise=z)  # [B, S, 144]
    S = num_samples
    rotmat = rot6d_to_rotmat(pose_6d.reshape(B * S, -1), "prohmr")
    rotmat = rotmat.reshape(B, S, 24, 3, 3)

    betas, cam = fc_head(params["fc_head"], ctx)  # [B, 10], [B, 3]
    betas = jnp.broadcast_to(betas[:, None], (B, S, 10))
    cam = jnp.broadcast_to(cam[:, None], (B, S, 3))

    out = lbs(
        smpl,
        betas.reshape(B * S, 10),
        rotmat[:, :, :1].reshape(B * S, 1, 3, 3),
        rotmat[:, :, 1:].reshape(B * S, 23, 3, 3),
        pose2rot=False,
    )
    kp3d = out.joints.reshape(B, S, -1, 3)
    verts = out.vertices.reshape(B, S, -1, 3)

    # cameras (reference :176-222)
    if cfg.with_focal_length:
        fl = (batch["fx"] * cfg.fx_norm_coeff)[:, None, None]
        fl = jnp.broadcast_to(fl, (B, S, 2))
        cc_full = jnp.stack([batch["cam_cx"], batch["cam_cy"]], axis=-1)[:, None]
        cc_full = jnp.broadcast_to(cc_full, (B, S, 2))
    else:
        fl = jnp.full((B, S, 2), cfg.default_focal_length)
        cc_full = jnp.broadcast_to(
            jnp.array([cfg.full_img_w / 2, cfg.full_img_h / 2]), (B, S, 2))

    pred_cam_t = jnp.stack(
        [cam[..., 1], cam[..., 2],
         2 * fl[..., 0] / (cfg.img_size * cam[..., 0] + 1e-9)], axis=-1)

    flat = lambda a: a.reshape(B * S, *a.shape[2:])
    cam_t_full = convert_pare_to_full_img_cam(
        pare_cam=flat(cam),
        bbox_height=jnp.broadcast_to(batch["box_size"][:, None], (B, S)).reshape(-1),
        bbox_center=jnp.broadcast_to(
            batch["box_center"][:, None], (B, S, 2)).reshape(-1, 2),
        img_w=flat(cc_full)[:, 0] * 2,
        img_h=flat(cc_full)[:, 1] * 2,
        focal_length=flat(fl)[:, 0],
        crop_res=cfg.img_size,
    )  # [B*S, 3]

    kp3d_flat = flat(kp3d)
    kp3d_full = (kp3d_flat + cam_t_full[:, None]).reshape(B, S, -1, 3)

    kp2d_full = perspective_projection(
        kp3d_flat, cam_t_full, flat(fl), flat(cc_full))
    kp2d_full = jnp.stack(
        [kp2d_full[..., 0] / cfg.full_img_w - 0.5,
         kp2d_full[..., 1] / cfg.full_img_h - 0.5], axis=-1).reshape(B, S, -1, 2)

    kp2d_crop = perspective_projection(kp3d_flat, flat(pred_cam_t), flat(fl))
    kp2d_crop = (kp2d_crop / cfg.img_size).reshape(B, S, -1, 2)

    return ProHMROutput(
        pred_pose_6d=pose_6d,
        pred_pose_rotmat=rotmat,
        pred_betas=betas,
        pred_cam=cam,
        pred_cam_t=pred_cam_t,
        pred_cam_t_full=cam_t_full.reshape(B, S, 3),
        log_prob=log_prob,
        pred_keypoints_3d=kp3d,
        pred_vertices=verts,
        pred_keypoints_3d_full=kp3d_full,
        pred_keypoints_2d=kp2d_crop,
        pred_keypoints_2d_full=kp2d_full,
        conditioning_feats=ctx,
    ), new_params


@dataclass(frozen=True)
class ProHMRLossWeights:
    """reference configs/prohmr.yaml:11-36."""

    v2v_exp: float = 0.0
    v2v_mode: float = 0.5
    keypoints_3d_exp: float = 0.0
    keypoints_3d_mode: float = 0.05
    keypoints_3d_full_exp: float = 0.0
    keypoints_3d_full_mode: float = 0.02
    keypoints_2d_exp: float = 0.001
    keypoints_2d_mode: float = 0.01
    keypoints_2d_full_exp: float = 0.001
    keypoints_2d_full_mode: float = 0.01
    global_orient_exp: float = 0.0
    global_orient_mode: float = 0.001
    body_pose_exp: float = 0.0
    body_pose_mode: float = 0.001
    betas_exp: float = 0.0
    betas_mode: float = 0.0005
    orthogonal: float = 0.1
    nll: float = 0.001
    adversarial: float = 0.0005
    with_full_2d_loss: bool = True     # train_prohmr_scene.py default
    with_global_3d_loss: bool = True


def compute_loss(
    params: dict,
    cfg: ProHMRConfig,
    w: ProHMRLossWeights,
    smpl_male: SMPLModel,
    smpl_female: SMPLModel,
    batch: Dict[str, Array],
    out: ProHMROutput,
    key: Optional[Array],
    *,
    train: bool,
) -> Tuple[Array, Dict[str, Array]]:
    """Mode/expectation-split losses + NLL + ortho
    (reference prohmr_scene.py:227-397)."""
    B, S = out.pred_pose_6d.shape[:2]
    s2o = jnp.asarray(C.SMPL_TO_OPENPOSE)

    pred_kp3d = out.pred_keypoints_3d[:, :, :24]
    pred_kp3d_full = out.pred_keypoints_3d_full[:, :, :24]
    pred_kp2d = out.pred_keypoints_2d[:, :, s2o]
    pred_kp2d_full = out.pred_keypoints_2d_full[:, :, s2o]

    gt_kp2d = batch["keypoints_2d"]            # [B, 25, 3]
    gt_kp2d_full = batch["orig_keypoints_2d"]
    gt_kp3d = batch["keypoints_3d"][:, :24]
    gt_kp3d_full = batch["keypoints_3d_full"][:, :24]
    gtp = batch["smpl_params"]

    ign = jnp.ones((25,)).at[jnp.asarray(C.KEYPOINT_2D_IGNORE_JOINTS)].set(0.0)

    def kp2d_loss(pred, gt):  # [B,S,25,2] vs [B,25,3] -> [B,S]
        conf = gt[:, None, :, 2:] * ign[None, None, :, None]
        return jnp.sum(conf * jnp.abs(pred - gt[:, None, :, :2]), axis=(2, 3))

    def kp3d_loss(pred, gt, align):  # -> [B,S]
        g = gt[:, None]
        if align:
            pred = pred - pred[:, :, :1]
            g = g - g[:, :, :1]
        return jnp.sum(jnp.abs(pred - g), axis=(2, 3))

    l_kp2d = kp2d_loss(pred_kp2d, gt_kp2d)
    l_kp2d_full = kp2d_loss(pred_kp2d_full, gt_kp2d_full)
    l_kp3d = kp3d_loss(pred_kp3d, gt_kp3d, True)
    l_kp3d_full = kp3d_loss(pred_kp3d_full, gt_kp3d_full, False)

    # gendered GT bodies for v2v (reference :272-286)
    gt_m = lbs(smpl_male, gtp["betas"], gtp["global_orient"], gtp["body_pose"],
               pose2rot=True)
    gt_f = lbs(smpl_female, gtp["betas"], gtp["global_orient"], gtp["body_pose"],
               pose2rot=True)
    is_f = (batch["gender"] == 1)[:, None, None]
    gt_verts = jnp.where(is_f, gt_f.vertices, gt_m.vertices)
    gt_pelvis = jnp.where(is_f, gt_f.joints[:, :1], gt_m.joints[:, :1])
    l_v2v = jnp.mean(jnp.abs(
        (out.pred_vertices - out.pred_keypoints_3d[:, :, :1, :][:, :, :, :])
        - (gt_verts - gt_pelvis)[:, None]), axis=(2, 3))  # [B, S]

    # SMPL param mse (reference :294-304)
    gt_go = aa_to_rotmat(gtp["global_orient"].reshape(-1, 3)).reshape(B, 1, 1, 3, 3)
    gt_bp = aa_to_rotmat(gtp["body_pose"].reshape(-1, 3)).reshape(B, 1, 23, 3, 3)
    l_go = jnp.sum(jnp.square(out.pred_pose_rotmat[:, :, :1] - gt_go), axis=(2, 3, 4))
    l_bp = jnp.sum(jnp.square(out.pred_pose_rotmat[:, :, 1:] - gt_bp), axis=(2, 3, 4))
    l_betas = jnp.sum(jnp.square(out.pred_betas - gtp["betas"][:, None]), axis=-1)

    def mode_exp(l):  # [B, S] -> (mode, exp) per reference :306-337
        mode = jnp.sum(l[:, 0]) / B
        exp = jnp.sum(l[:, 1:]) / (B * max(S - 1, 1)) if S > 1 else jnp.zeros(())
        return mode, exp

    kp2d_m, kp2d_e = mode_exp(l_kp2d)
    kp2df_m, kp2df_e = mode_exp(l_kp2d_full)
    kp3d_m, kp3d_e = mode_exp(l_kp3d)
    kp3df_m, kp3df_e = mode_exp(l_kp3d_full)
    go_m, go_e = mode_exp(l_go)
    bp_m, bp_e = mode_exp(l_bp)
    betas_m, betas_e = mode_exp(l_betas)
    v2v_m = jnp.mean(l_v2v[:, 0])
    v2v_e = jnp.mean(l_v2v[:, 1:]) if S > 1 else jnp.zeros(())

    # NLL on (noised) GT pose (reference :339-353)
    gt_6d = gt_pose_prohmr_6d(batch)
    gt_betas = gtp["betas"]
    if train and key is not None:
        k1, k2 = jax.random.split(key)
        gt_6d = gt_6d + cfg.smpl_param_noise_ratio * jax.random.normal(
            k1, gt_6d.shape)
        gt_betas = gt_betas + cfg.smpl_param_noise_ratio * jax.random.normal(
            k2, gt_betas.shape)
    del gt_betas  # betas are not part of the flow's 144-d space
    log_prob, _ = glow_log_prob(params["flow"], cfg.glow_config(), gt_6d,
                                out.conditioning_feats)
    l_nll = -jnp.mean(log_prob)

    # orthogonality on 'prohmr'-layout 6d (reference :355-360)
    p6 = out.pred_pose_6d.reshape(-1, 2, 3)
    gram = jnp.einsum("bij,bkj->bik", p6, p6)  # rows dot rows
    l_orth = jnp.square(gram - jnp.eye(2))
    l_orth = l_orth.reshape(B, S, -1)
    orth_m = jnp.mean(l_orth[:, 0])
    orth_e = jnp.mean(l_orth[:, 1:]) if S > 1 else jnp.zeros(())

    f2d = 1.0 if w.with_full_2d_loss else 0.0
    g3d = 1.0 if w.with_global_3d_loss else 0.0
    total = (w.keypoints_3d_exp * kp3d_e
             + w.keypoints_3d_full_exp * kp3df_e * g3d
             + w.v2v_exp * v2v_e
             + w.keypoints_2d_exp * kp2d_e * (1 - f2d)
             + w.keypoints_2d_full_exp * kp2df_e * f2d
             + w.nll * l_nll
             + w.orthogonal * (orth_e + orth_m)
             + w.global_orient_exp * go_e + w.body_pose_exp * bp_e
             + w.betas_exp * betas_e
             + w.keypoints_3d_mode * kp3d_m
             + w.keypoints_3d_full_mode * kp3df_m * g3d
             + w.v2v_mode * v2v_m
             + w.keypoints_2d_mode * kp2d_m * (1 - f2d)
             + w.keypoints_2d_full_mode * kp2df_m * f2d
             + w.global_orient_mode * go_m + w.body_pose_mode * bp_m
             + w.betas_mode * betas_m)

    losses = {
        "loss": total, "loss_nll": l_nll,
        "loss_keypoints_3d_mode": kp3d_m, "loss_keypoints_3d_exp": kp3d_e,
        "loss_keypoints_3d_full_mode": kp3df_m, "loss_keypoints_3d_full_exp": kp3df_e,
        "loss_keypoints_2d_mode": kp2d_m, "loss_keypoints_2d_exp": kp2d_e,
        "loss_keypoints_2d_full_mode": kp2df_m, "loss_keypoints_2d_full_exp": kp2df_e,
        "loss_v2v_mode": v2v_m, "loss_v2v_exp": v2v_e,
        "loss_pose_6d_mode": orth_m, "loss_pose_6d_exp": orth_e,
        "loss_global_orient_mode": go_m, "loss_body_pose_mode": bp_m,
        "loss_betas_mode": betas_m,
    }
    return total, losses

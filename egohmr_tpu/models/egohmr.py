"""Stage-2 EgoHMR: scene-aware diffusion-based human mesh recovery (JAX).

TPU-native restructuring of reference models/egohmr/egohmr.py:28-605. The
monolithic `EgoHMR.forward` (which reruns the ResNet50 backbone and the scene
PointNet on every one of the 50 denoising steps) is split into:

  compute_condition   — image/scene/camera/translation conditioning + the
                        beta head, computed ONCE per batch
  make_denoise_fn     — the per-step x0 predictor: timestep embed + x_t embed
                        + ModulatedGCN; CFG "diffuse_fuse" runs cond and
                        uncond through ONE doubled-batch GCN call and splices
                        visible joints (reference egohmr.py:239-254)
  make_guidance_fn    — ∇_{x_t} collision score through rot6d→rotmat→LBS→SDF
                        (reference guide_coll, egohmr.py:517-605) — fully
                        batched, jit-safe, used inside the sampling lax.scan
  model_outputs       — SMPL forward + full-image reprojection for the final
                        denoised pose (reference egohmr.py:256-303)
  compute_loss        — training/val losses (reference egohmr.py:307-449)

Batch dict keys follow the reference dataloader (egobody_dataset.py:241-277)
with images in NHWC.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..collision import bbox_mask, collision_loss, collision_ratio, signed_distance
from ..geometry import aa_to_rotmat, perspective_projection, rot6d_to_rotmat
from ..nn import (
    fc_head_beta,
    init_fc_head_beta,
    init_input_process,
    init_modulated_gcn,
    init_pointnet,
    init_resnet,
    init_timestep_embedder,
    init_transl_enc,
    input_process,
    modulated_gcn_forward,
    pointnet_forward,
    resnet_forward,
    timestep_embed,
    transl_enc,
)
from ..smpl import SMPLModel, lbs, vertex_normals
from ..smpl import constants as C

Array = jax.Array


@dataclass(frozen=True)
class EgoHMRConfig:
    """Model hyperparameters (defaults = reference train_egohmr.py:17-67 +
    configs/prohmr.yaml)."""

    img_feat_dim: int = 2048
    resnet_layers: int = 50
    backbone_type: str = "resnet"  # "resnet" | "stub" (tiny conv, for tests)
    scene_feat_dim: int = 512
    pointnet_hidden_dim: int = 256
    transl_embed_dim: int = 128
    timestep_embed_dim: int = 512
    input_process_dim: int = 512
    gcn_hid_dim: int = 1024
    gcn_layers: int = 4
    # embedded-gaussian non-local block before gconv_output (reference
    # egohmr.py:37 gcn_nonlocal_layer=False, modulated_gcn.py:96-110)
    gcn_nonlocal_layer: bool = False
    # TPU execution knob (no reference analogue): "xla" runs the scene
    # encoder as plain XLA matmuls; "fused" uses the whole-network Pallas
    # kernel (nn/pointnet_fused.py) at inference — bf16 storage, one HBM
    # read of the cloud. Training and CPU backends always use "xla".
    pointnet_impl: str = "xla"
    # NOTE: there is deliberately no gcn_impl knob. A whole-denoiser Pallas
    # kernel was built and measured (git 29aaacc): 0.97 ms/call vs XLA's
    # 0.58-0.85 — XLA already schedules the 24-node GCN's small weights
    # well. See BASELINE.md "GCN denoiser kernel" for the write-up.
    with_focal_length: bool = True
    with_bbox_info: bool = True
    with_cam_center: bool = True
    cond_mask_prob: float = 0.01
    only_mask_img_cond: bool = True
    pelvis_vis_loosen: bool = False
    diffuse_fuse: bool = True
    fx_norm_coeff: float = 1500.0
    default_focal_length: float = 5000.0
    img_size: int = 224
    full_img_w: float = 1920.0
    full_img_h: float = 1080.0

    @property
    def cam_feat_dim(self) -> int:
        return (1 if self.with_focal_length else 0) + \
               (3 if self.with_bbox_info else 0) + \
               (2 if self.with_cam_center else 0)

    @property
    def context_feats_dim(self) -> int:
        return (self.img_feat_dim + self.scene_feat_dim
                + self.transl_embed_dim + self.cam_feat_dim)

    @property
    def gcn_in_dim(self) -> int:
        return (self.context_feats_dim + self.input_process_dim
                + self.timestep_embed_dim)


class BodyRepStats(NamedTuple):
    """144-d rot6d pose normalization stats (reference preprocess_stats.npz;
    egobody_dataset.py:101-117)."""

    mean: Array  # [144]
    std: Array   # [144]


class Condition(NamedTuple):
    """Everything the denoiser needs that does not depend on (x_t, t)."""

    cond: Array          # [B, 24, Dc] conditioning features (possibly masked)
    cond_uncond: Array   # [B, 24, Dc] image-features-zeroed variant
    vis_mask_smpl: Array  # [B, 24] bool per-joint visibility
    pred_betas: Array    # [B, 10]
    img_feats: Array     # [B, 2048]
    scene_feats: Array   # [B, Ds]
    input_transl: Array  # [B, 3]
    scene_pcd: Array     # [B, P, 3] (canonicalized when scene_cano)
    focal_length: Array  # [B, 2]
    camera_center: Array  # [B, 2]


def init_egohmr(key: Array, cfg: EgoHMRConfig, mean_betas: Optional[Array] = None) -> dict:
    ks = jax.random.split(key, 7)
    if mean_betas is None:
        mean_betas = jnp.zeros((10,))
    if cfg.backbone_type == "resnet":
        backbone = init_resnet(ks[0], cfg.resnet_layers)
    elif cfg.backbone_type == "stub":
        from ..nn.core import conv_init, linear_init

        backbone = {
            "conv": conv_init(ks[0], 8, 8, 3, 16),
            "proj": linear_init(jax.random.fold_in(ks[0], 1), 16, cfg.img_feat_dim),
        }
    else:
        raise ValueError(cfg.backbone_type)
    return {
        "backbone": backbone,
        "scene_enc": init_pointnet(ks[1], cfg.scene_feat_dim, cfg.pointnet_hidden_dim),
        "transl_enc": init_transl_enc(ks[2], 3, cfg.transl_embed_dim),
        "embed_timestep": init_timestep_embedder(ks[3], cfg.timestep_embed_dim),
        "input_process": init_input_process(ks[4], 6, cfg.input_process_dim),
        "diffusion_model": init_modulated_gcn(
            ks[5], cfg.gcn_in_dim, cfg.gcn_hid_dim, 6, cfg.gcn_layers,
            nonlocal_layer=cfg.gcn_nonlocal_layer
        ),
        "beta_layer": init_fc_head_beta(ks[6], cfg.context_feats_dim, mean_betas),
    }


# NUMPY on purpose: a module-level jnp.asarray would initialize the JAX
# backend at `import egohmr_tpu` time — on the axon platform that blocks on
# the remote TPU tunnel before the caller can force CPU (jax converts and
# constant-folds this at trace time anyway)
_ADJ = np.asarray(C.joint_adjacency(), dtype=np.float32)


def _cam_feats(cfg: EgoHMRConfig, batch: Dict[str, Array]) -> Array:
    """Camera conditioning features [B, cam_feat_dim]
    (reference egohmr.py:194-205; order: [cam_center][bbox][fx])."""
    feats = []
    orig_fx = batch["fx"] * cfg.fx_norm_coeff
    if cfg.with_cam_center:
        feats.append(jnp.stack(
            [batch["cam_cx"] / orig_fx, batch["cam_cy"] / orig_fx], axis=-1))
    if cfg.with_bbox_info:
        feats.append(jnp.stack(
            [batch["box_center"][:, 0] / orig_fx,
             batch["box_center"][:, 1] / orig_fx,
             batch["box_size"] / orig_fx], axis=-1))
    if cfg.with_focal_length:
        feats.append(batch["fx"][:, None])
    if not feats:
        return jnp.zeros((batch["fx"].shape[0], 0))
    return jnp.concatenate(feats, axis=-1)


def compute_condition(
    params: dict,
    cfg: EgoHMRConfig,
    batch: Dict[str, Array],
    *,
    train: bool = False,
    rng: Optional[Array] = None,
    scene_cano: bool = True,
    axis_name: Optional[str] = None,
) -> Tuple[Condition, dict]:
    """Run all conditioners once (reference egohmr.py:177-228, :262-265).

    Returns (Condition, params-with-updated-BN-state).
    """
    B = batch["img"].shape[0]
    new_params = dict(params)

    if cfg.backbone_type == "resnet":
        img_feats, new_params["backbone"] = resnet_forward(
            params["backbone"], batch["img"], train=train, axis_name=axis_name
        )
    else:  # stub backbone for tests
        from ..nn.core import conv2d, linear, relu as _relu

        h = _relu(conv2d(params["backbone"]["conv"], batch["img"], stride=8))
        img_feats = linear(params["backbone"]["proj"], jnp.mean(h, axis=(1, 2)))

    # per-joint visibility from openpose confidences (reference :186-191)
    vis_openpose = batch["orig_keypoints_2d"][:, :, -1] > 0
    vis_openpose = vis_openpose.at[:, 8].set(True)  # pelvis always visible
    o2s = jnp.asarray(
        C.OPENPOSE_TO_SMPL_PELVIS_LOOSENED if cfg.pelvis_vis_loosen
        else C.OPENPOSE_TO_SMPL
    )
    vis_mask_smpl = vis_openpose[:, o2s]  # [B, 24]

    cam_feats = _cam_feats(cfg, batch)

    input_transl = batch["smpl_params"]["transl"]
    scene_pcd = batch["scene_pcd_verts_full"]
    if scene_cano:
        scene_pcd = scene_pcd - input_transl[:, None, :]
    # run the encoder in the image dtype (bf16 inference path) but keep the
    # f32 cloud in Condition: scene_pcd feeds guidance gradients and the
    # collision/contact metrics, where bf16 coordinates would cost ~1 cm of
    # precision at room scale
    scene_in = scene_pcd.astype(batch["img"].dtype)
    use_fused_pointnet = (
        cfg.pointnet_impl == "fused" and not train
        and jax.default_backend() not in ("cpu",)  # Pallas needs the TPU
    )
    if use_fused_pointnet:
        from ..nn.pointnet_fused import pointnet_forward_fused

        scene_feats = pointnet_forward_fused(params["scene_enc"], scene_in)
    else:
        scene_feats = pointnet_forward(params["scene_enc"], scene_in)
    transl_feat = transl_enc(params["transl_enc"], input_transl)

    # keep the whole conditioning tensor in the encoder dtype: transl/cam
    # features are computed in f32 (their inputs are f32 even when params are
    # bf16 — mixed matmuls promote), and concatenating them un-cast would
    # silently promote `cond` — and with it the ENTIRE denoiser — back to
    # f32, undoing the low-precision path (measured round 3: the "bf16"
    # pipeline was running the GCN in f32 because of exactly this)
    cdt = scene_feats.dtype
    shared = jnp.concatenate(
        [scene_feats, transl_feat.astype(cdt), cam_feats.astype(cdt)], axis=-1
    )
    shared24 = jnp.broadcast_to(shared[:, None, :], (B, 24, shared.shape[-1]))
    img24 = jnp.broadcast_to(img_feats[:, None, :], (B, 24, img_feats.shape[-1]))
    img24_vis = img24 * vis_mask_smpl[..., None].astype(img24.dtype)
    cond = jnp.concatenate([img24_vis, shared24], axis=-1)  # [B, 24, Dc]

    # unconditional branch: zero the image features only
    # (only_mask_img_cond=True, reference :153-156; force_mask path)
    if cfg.only_mask_img_cond:
        cond_uncond = jnp.concatenate([jnp.zeros_like(img24), shared24], axis=-1)
    else:
        cond_uncond = jnp.zeros_like(cond)

    # train-time condition dropout with prob cond_mask_prob (reference :159-167)
    if train and cfg.cond_mask_prob > 0.0:
        assert rng is not None, "training condition masking needs an rng"
        # rng may be one key (batch draw) or B per-sample keys — the latter
        # makes the draw invariant to data-parallel sharding (train/loop.py)
        batched = (
            jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key)
            and rng.ndim == 1
        ) or rng.ndim == 2
        if batched:
            drop = jax.vmap(
                lambda k: jax.random.bernoulli(k, cfg.cond_mask_prob, ())
            )(rng)
        else:
            drop = jax.random.bernoulli(rng, cfg.cond_mask_prob, (B,))
        cond = jnp.where(drop[:, None, None], cond_uncond, cond)

    # betas head sees the UNMASKED image features (reference :262-265).
    # Deliberately UN-cast transl/cam feats here: the mixed concat promotes
    # beta_in to f32, so pred_betas (which drives SMPL shape in the loss and
    # the compact outputs) keeps full precision even on the bf16 path — the
    # head is a single tiny [B,1024] MLP, not worth low-precision savings.
    beta_in = jnp.concatenate(
        [img_feats, scene_feats, transl_feat, cam_feats], axis=-1
    )
    pred_betas = fc_head_beta(params["beta_layer"], beta_in)

    # full-image camera (reference :282-291)
    if cfg.with_focal_length:
        fl = (batch["fx"] * cfg.fx_norm_coeff)[:, None].repeat(2, axis=1)
        cc = jnp.stack([batch["cam_cx"], batch["cam_cy"]], axis=-1)
    else:
        fl = jnp.full((B, 2), cfg.default_focal_length)
        cc = jnp.broadcast_to(
            jnp.array([cfg.full_img_w / 2, cfg.full_img_h / 2]), (B, 2)
        )

    return (
        Condition(
            cond=cond,
            cond_uncond=cond_uncond,
            vis_mask_smpl=vis_mask_smpl,
            pred_betas=pred_betas,
            img_feats=img_feats,
            scene_feats=scene_feats,
            input_transl=input_transl,
            scene_pcd=scene_pcd,
            focal_length=fl,
            camera_center=cc,
        ),
        new_params,
    )


def denoise_x0(
    params: dict,
    cfg: EgoHMRConfig,
    cond: Condition,
    x_t: Array,
    t_orig: Array,
    *,
    fuse: bool,
    train: bool = False,
    axis_name: Optional[str] = None,
) -> Tuple[Array, dict]:
    """Predict normalized x0 rot6d from (x_t, t) (reference egohmr.py:230-257).

    With `fuse` (eval-time diffuse_fuse, reference :239-254): run cond and
    uncond through ONE GCN call on a doubled batch, then take the uncond
    output (guidance_param = 0) with visible joints spliced from the cond
    output. Returns (pred_x_start [B,144], new_params).
    """
    B = x_t.shape[0]
    t_emb = timestep_embed(params["embed_timestep"], t_orig)  # [B, 512]
    t_emb24 = jnp.broadcast_to(t_emb[:, None, :], (B, 24, t_emb.shape[-1]))
    x_feat = input_process(params["input_process"], x_t.reshape(B, 24, 6))

    if fuse:
        feats = jnp.concatenate([
            jnp.concatenate([cond.cond, x_feat, t_emb24], axis=-1),
            jnp.concatenate([cond.cond_uncond, x_feat, t_emb24], axis=-1),
        ], axis=0)  # [2B, 24, D]
        out, new_gcn = modulated_gcn_forward(
            params["diffusion_model"], _ADJ, feats, train=train, axis_name=axis_name
        )
        out_cond, out_uncond = out[:B], out[B:]
        vis = cond.vis_mask_smpl[..., None]
        out = jnp.where(vis, out_cond, out_uncond)
    else:
        feats = jnp.concatenate([cond.cond, x_feat, t_emb24], axis=-1)
        out, new_gcn = modulated_gcn_forward(
            params["diffusion_model"], _ADJ, feats, train=train, axis_name=axis_name
        )

    new_params = dict(params)
    new_params["diffusion_model"] = new_gcn
    return out.reshape(B, 24 * 6), new_params


def make_denoise_fn(params: dict, cfg: EgoHMRConfig, cond: Condition, *,
                    fuse: Optional[bool] = None):
    """Closure for the diffusion sampler: (x_t, t_orig) -> pred x0.

    The GCN input layer sees x = [cond | input_process(x_t) | t_emb], so
    x@W splits as cond@W_c + xt@W_x + temb@W_t (feature concat). The cond
    term is identical on every denoising step; we project it through BOTH
    input-layer weight matrices here, once per sampling run, and the scanned
    step only pays the small x_t/t projections. Exact same math as
    `denoise_x0` up to f32 summation order (reference recomputes the whole
    input matmul per step: egohmr.py:230-257 + modulated_gcn_conv.py:38-44).
    """
    fuse = cfg.diffuse_fuse if fuse is None else fuse
    gcn = params["diffusion_model"]

    def gcn_apply(h0, h1):
        out, _ = modulated_gcn_forward(
            gcn, _ADJ, None, train=False, input_h=(h0, h1))
        return out
    W = gcn["gconv_input"]["gconv"]["W"]  # [2, gcn_in_dim, hid]
    Dc = cfg.context_feats_dim
    Dx = cfg.input_process_dim
    Wc, Wx, Wt = W[:, :Dc], W[:, Dc:Dc + Dx], W[:, Dc + Dx:]

    ch = jnp.einsum("bjd,wdh->wbjh", cond.cond, Wc)          # [2,B,24,hid]
    if fuse:
        cuh = jnp.einsum("bjd,wdh->wbjh", cond.cond_uncond, Wc)

    def fn(x_t: Array, t_orig: Array) -> Array:
        B = x_t.shape[0]
        t_emb = timestep_embed(params["embed_timestep"], t_orig)   # [B, Dt]
        x_feat = input_process(params["input_process"], x_t.reshape(B, 24, 6))
        base = (jnp.einsum("bjd,wdh->wbjh", x_feat, Wx)
                + jnp.einsum("bd,wdh->wbh", t_emb, Wt)[:, :, None])
        if fuse:
            h_c = ch + base
            h_u = cuh + base
            h0 = jnp.concatenate([h_c[0], h_u[0]], axis=0)     # [2B,24,hid]
            h1 = jnp.concatenate([h_c[1], h_u[1]], axis=0)
            out = gcn_apply(h0, h1)
            out_cond, out_uncond = out[:B], out[B:]
            vis = cond.vis_mask_smpl[..., None]
            out = jnp.where(vis, out_cond, out_uncond)
        else:
            h = ch + base
            out = gcn_apply(h[0], h[1])
        return out.reshape(B, 24 * 6)

    return fn


# --------------------------------------------------------------- guidance
# grad scaling per joint (reference egohmr.py:563-567): joints 0-2 x1,
# joints 3-23 x2, then upper-body joints zeroed — only pelvis-adjacent leg
# joints [1,2] (x1) and [4,5,7,8,10,11] (x2) keep gradient.
_GUIDE_JOINT_SCALE = np.zeros((24,), np.float32)
_GUIDE_JOINT_SCALE[[1, 2]] = 1.0
_GUIDE_JOINT_SCALE[[4, 5, 7, 8, 10, 11]] = 2.0


def make_guidance_fn(
    params: dict,
    cfg: EgoHMRConfig,
    smpl_model: SMPLModel,
    cond: Condition,
    stats: BodyRepStats,
    *,
    sdf_block_size: int = 2048,
    max_scene_points: Optional[int] = 4096,
    per_step_points: Optional[int] = 1024,
    selection_refresh_every: int = 1,
    grad_mode: str = "exact",
):
    """Collision-score gradient w.r.t. x_t (reference guide_coll,
    egohmr.py:517-605), batched with static shapes.

    The body is posed WITHOUT translation and compared against the
    canonicalized scene cloud (scene_cano), exactly like the reference
    (scene_pcd_verts = scene - transl; egohmr.py:211-213,537).

    `max_scene_points`: static top-K pre-filter of scene points nearest the
    (canonical-frame) body origin, computed once per sampling run — the
    static-shape analogue of the reference's <=4000-point bbox cap
    (egohmr.py:409-412). The per-step SDF cost drops ~scene_points/K.
    Exact when every point within the body's reach fits in K; on dense
    body-centered crops where more points sit within reach, the farthest
    of them are dropped — comparable lossiness to the reference, which
    RANDOMLY subsamples its bbox crop past 4000 points. Raise K (or pass
    None to disable) to trade SDF cost for coverage.

    `per_step_points`: second-stage cap INSIDE each guided step — the K2
    points nearest the CURRENT posed body's bbox (`topk_scene_points_near_
    body`). The loss only scores bbox-masked points, so this is EXACT
    whenever the bbox point count fits in K2 (every bbox point ranks before
    any outside point); it cuts the per-step nearest-vertex argmin — the
    dominant guided-step cost (profiled: 2.1 of 3.2 ms at K=4096, B=16) —
    by K/K2. None disables.

    TPU notes baked in here:

    * `normals` are computed from stop-gradient inputs because they only
      enter through sign() (zero gradient) — their backward subgraph
      (incidence gathers + cross products) is dead weight XLA cannot prove
      away; the true gradient is identical.
    * the BACKWARD runs through `lbs_apply_select`: only the per-point
      nearest vertices are re-posed differentiably, so the gradient is
      gathers-on-constants + matmuls over K2 points — no [B,K2]→[B,V,3]
      scatter (serial on TPU) and no V-sized skinning backward. Exact: the
      argmin index and the inside/outside sign are piecewise-constant in
      x_t, so differentiating only the selected-vertex distance IS the
      full gradient (tests pin it against the straightforward formulation).

    `selection_refresh_every`: cross-step reuse of the gradient-free
    selection pass. 1 (default) recomputes selection every guided step —
    exact. N>1 returns a `StatefulGuidanceFn`: the sampler carries
    (pts, mask, nn_idx, sign) across guided steps and refreshes them on
    every N-th guided step; between refreshes only the differentiable
    selective re-pose runs. APPROXIMATION: between refreshes the selected
    points/vertices/signs are those of a body a few denoising steps old —
    adjacent low-noise guided steps (t<=3 DDIM / t<=10 DDPM) move the
    body millimeters, so the gradient direction error is small (pinned by
    tests/test_egohmr_model.py); the final sample deviation is measured
    in PARITY.md.
    """
    scale = jnp.asarray(_GUIDE_JOINT_SCALE)[None, :, None]  # [1,24,1]
    betas = jax.lax.stop_gradient(cond.pred_betas)
    from ..collision.sdf import (
        nearest_vertex,
        topk_scene_points,
        topk_scene_points_near_body,
    )
    from ..diffusion.sampler import StatefulGuidanceFn
    from ..smpl.model import lbs_apply_select, lbs_transforms

    scene = topk_scene_points(
        jax.lax.stop_gradient(cond.scene_pcd), max_scene_points)
    do_cap = (per_step_points is not None
              and per_step_points < scene.shape[1])
    if do_cap:
        # fixed pre-shuffle: the per-step top-K ranks all in-bbox points at
        # distance 0, so ties break by ARRAY index — on spatially-ordered
        # crops that eviction is spatially biased when the bbox holds > K2
        # points. A fixed permutation makes the tie-break spatially unbiased
        # (the static-shape analogue of the reference's random subsample,
        # egohmr.py:409-412) while staying deterministic across runs.
        perm = np.random.RandomState(0).permutation(scene.shape[1])
        scene = scene[:, jnp.asarray(perm)]
    K2 = per_step_points if do_cap else scene.shape[1]

    def selection(x_t: Array):
        """Gradient-free full pass: posed mesh -> (pts, mask, nn_idx, sign)."""
        pose6d = x_t * stats.std + stats.mean
        rotmat = rot6d_to_rotmat(pose6d, "diffusion").reshape(-1, 24, 3, 3)
        rotmat_sg = jax.lax.stop_gradient(rotmat)
        out = lbs(smpl_model, betas, rotmat_sg[:, :1], rotmat_sg[:, 1:],
                  pose2rot=False)
        verts_sg = out.vertices
        normals = vertex_normals(verts_sg, smpl_model.faces)
        pts = scene
        if do_cap:
            pts = topk_scene_points_near_body(scene, verts_sg, K2)
        mask = bbox_mask(pts, verts_sg)
        nn = nearest_vertex(pts, verts_sg, block_size=sdf_block_size)
        n_sel = jnp.take_along_axis(normals, nn.idx[..., None], axis=1)
        v_sel_sg = jnp.take_along_axis(verts_sg, nn.idx[..., None], axis=1)
        sign = jnp.sign(jnp.sum((pts - v_sel_sg) * n_sel, axis=-1))
        sign = jnp.where(sign == 0, 1.0, sign)
        return (pts, mask, nn.idx, sign)

    def neg_collision(x_t: Array, sel) -> Array:
        # differentiable selective pass: re-pose ONLY the selected verts
        pts, mask, idx, sign = sel
        pose6d = x_t * stats.std + stats.mean
        rotmat = rot6d_to_rotmat(pose6d, "diffusion").reshape(-1, 24, 3, 3)
        _, pf, _, rel = lbs_transforms(smpl_model, betas, rotmat)
        v_near = lbs_apply_select(smpl_model, betas, pf, rel, idx)
        sdf = sign * jnp.linalg.norm(pts - v_near, axis=-1)
        loss = collision_loss(sdf, mask.astype(sdf.dtype))  # [B]
        return -jnp.mean(loss)

    assert grad_mode in ("exact", "forward-only"), grad_mode

    def grad_given(x_t: Array, sel) -> Array:
        if grad_mode == "forward-only":
            # PROFILING-ONLY (tools/probe_guided_backward.py): run the
            # differentiable pass forward but skip its backward, to measure
            # the zero-backward floor of a guided step. The 1e-24 coupling
            # keeps the forward live against DCE while making the applied
            # guidance numerically nil — NOT a product mode.
            val = neg_collision(x_t, sel)
            return jnp.broadcast_to(val * 1e-24, x_t.shape)
        grad = jax.grad(neg_collision)(x_t, sel)  # [B, 144]
        grad = grad.reshape(-1, 24, 6) * scale
        return grad.reshape(x_t.shape[0], 144)

    if selection_refresh_every <= 1:
        def fn(x_t: Array, t: Array) -> Array:
            return grad_given(x_t, selection(x_t))

        return fn

    def init_state(x: Array):
        B = x.shape[0]
        return (jnp.zeros((B, K2, 3), scene.dtype),
                jnp.zeros((B, K2), bool),
                jnp.zeros((B, K2), jnp.int32),
                jnp.zeros((B, K2), scene.dtype))

    def sfn(x_t: Array, t: Array, state, refresh: Array):
        sel = jax.lax.cond(refresh, selection, lambda _: state, x_t)
        return grad_given(x_t, sel), sel

    return StatefulGuidanceFn(init_state, sfn, selection_refresh_every)


# ----------------------------------------------------------------- outputs
def model_outputs(
    cfg: EgoHMRConfig,
    smpl_model: SMPLModel,
    cond: Condition,
    pred_x_start: Array,
    stats: BodyRepStats,
) -> Dict[str, Array]:
    """SMPL forward + projections for a denoised pose
    (reference egohmr.py:256-303)."""
    B = pred_x_start.shape[0]
    pred_pose_6d = pred_x_start * stats.std + stats.mean
    rotmat = rot6d_to_rotmat(pred_pose_6d, "diffusion").reshape(B, 24, 3, 3)

    out = lbs(smpl_model, cond.pred_betas, rotmat[:, :1], rotmat[:, 1:],
              pose2rot=False)
    kp3d = out.joints  # [B, 45, 3]
    kp3d_full = kp3d + cond.input_transl[:, None, :]
    kp2d_full = perspective_projection(
        kp3d, cond.input_transl, cond.focal_length, cond.camera_center
    )
    kp2d_full = jnp.stack(
        [kp2d_full[..., 0] / cfg.full_img_w - 0.5,
         kp2d_full[..., 1] / cfg.full_img_h - 0.5], axis=-1)

    return {
        "pred_x_start": pred_x_start,
        "pred_pose_6d": pred_pose_6d,
        "pred_pose_rotmat": rotmat,
        "pred_betas": cond.pred_betas,
        "pred_keypoints_3d": kp3d,
        "pred_keypoints_3d_full": kp3d_full,
        "pred_keypoints_2d_full": kp2d_full,
        "pred_vertices": out.vertices,
        # posed skeleton joints: lets downstream consumers (the learned-
        # occupancy collision metric) rebuild the SMPLOutput part frames
        # without re-running LBS on B*S bodies
        "pred_joints_smpl": out.joints_smpl,
    }


# ------------------------------------------------------------------ losses
@dataclass(frozen=True)
class LossWeights:
    """Stage-2 loss weights (reference train_egohmr.py:39-49)."""

    v2v: float = 0.5
    keypoints_3d: float = 0.05
    keypoints_3d_full: float = 0.02
    keypoints_2d_full: float = 0.01
    betas: float = 0.0005
    body_pose: float = 0.001
    global_orient: float = 0.001
    pose_6d_ortho: float = 0.1
    coap_penetration: float = 0.0002
    start_coap_epoch: int = 3


def compute_loss(
    cfg: EgoHMRConfig,
    weights: LossWeights,
    smpl_neutral: SMPLModel,
    smpl_male: SMPLModel,
    smpl_female: SMPLModel,
    batch: Dict[str, Array],
    cond: Condition,
    outputs: Dict[str, Array],
    *,
    train: bool,
    use_collision: bool = False,
    max_collision_points: Optional[int] = 4096,
) -> Tuple[Array, Dict[str, Array]]:
    """Weighted stage-2 loss (reference egohmr.py:307-449).

    `use_collision` stands in for the reference's `cur_epoch >=
    start_coap_epoch` gate — resolved by the caller so the jitted graph stays
    static per phase. `max_collision_points` is the static top-K analogue of
    the reference's <=4000-point bbox crop before its COAP loss
    (egohmr.py:406-412): points are ranked by distance to the posed body's
    bbox, so the masked loss is EXACT whenever the bbox point count fits in
    K (dense crops can exceed K; then the nearest-to-the-surface points
    win, vs the reference's random subsample). None disables the cap.
    """
    B = outputs["pred_keypoints_3d"].shape[0]
    s2o = jnp.asarray(C.SMPL_TO_OPENPOSE)

    pred_kp3d = outputs["pred_keypoints_3d"][:, :24]
    pred_kp3d_full = outputs["pred_keypoints_3d_full"][:, :24]
    pred_kp2d_full = outputs["pred_keypoints_2d_full"][:, s2o]  # [B, 25, 2]

    gt_kp2d_full = batch["orig_keypoints_2d"]  # [B, 25, 3]
    gt_kp3d = batch["keypoints_3d"][:, :24]
    gt_kp3d_full = batch["keypoints_3d_full"][:, :24]

    # 2d full-image keypoint loss, conf-weighted L1, ignoring joints {1,9,12}
    conf = gt_kp2d_full[:, :, 2:]
    ign = jnp.ones((25,)).at[jnp.asarray(C.KEYPOINT_2D_IGNORE_JOINTS)].set(0.0)
    conf = conf * ign[None, :, None]
    loss_kp2d_full = jnp.mean(jnp.sum(
        conf * jnp.abs(pred_kp2d_full - gt_kp2d_full[:, :, :2]), axis=(1, 2)))

    # pelvis-aligned 3d loss (crop camera)
    pa = lambda x: x - x[:, :1]
    loss_kp3d = jnp.mean(jnp.sum(jnp.abs(pa(pred_kp3d) - pa(gt_kp3d)), axis=(1, 2)))
    # global 3d loss
    loss_kp3d_full = jnp.mean(jnp.sum(
        jnp.abs(pred_kp3d_full - gt_kp3d_full), axis=(1, 2)))

    # gendered GT body for v2v (reference :344-355)
    gtp = batch["smpl_params"]
    gt_out_m = lbs(smpl_male, gtp["betas"], gtp["global_orient"],
                   gtp["body_pose"], transl=gtp.get("transl"), pose2rot=True)
    gt_out_f = lbs(smpl_female, gtp["betas"], gtp["global_orient"],
                   gtp["body_pose"], transl=gtp.get("transl"), pose2rot=True)
    is_f = (batch["gender"] == 1)[:, None, None]
    gt_vertices = jnp.where(is_f, gt_out_f.vertices, gt_out_m.vertices)
    gt_joints = jnp.where(is_f, gt_out_f.joints, gt_out_m.joints)

    pred_vertices = outputs["pred_vertices"]
    loss_v2v = jnp.mean(jnp.abs(
        (pred_vertices - pred_kp3d[:, :1])
        - (gt_vertices - gt_joints[:, :1])))

    # SMPL parameter losses (MSE on rotmats/betas; reference :374-383)
    gt_go_rot = aa_to_rotmat(gtp["global_orient"].reshape(-1, 3)).reshape(B, 1, 3, 3)
    gt_bp_rot = aa_to_rotmat(gtp["body_pose"].reshape(-1, 3)).reshape(B, 23, 3, 3)
    pred_rot = outputs["pred_pose_rotmat"]
    loss_global_orient = jnp.sum(
        jnp.square(pred_rot[:, :1] - gt_go_rot)) / B
    loss_body_pose = jnp.sum(jnp.square(pred_rot[:, 1:] - gt_bp_rot)) / B
    loss_betas = jnp.sum(jnp.square(outputs["pred_betas"] - gtp["betas"])) / B

    # rot6d orthogonality (reference :385-388, 'diffusion' layout)
    p6 = outputs["pred_pose_6d"].reshape(-1, 3, 2)
    gram = jnp.einsum("bij,bik->bjk", p6, p6)
    loss_ortho = jnp.mean(jnp.square(gram - jnp.eye(2)))

    # collision (penetration) loss — batched SDF replaces the COAP loop
    if use_collision:
        from ..collision.sdf import topk_scene_points_near_body

        # body-bbox-ranked cap: exact vs the uncapped masked loss whenever
        # the bbox point count fits in K (the reference asserts its own
        # <=4000-point crop covers the bbox, egohmr.py:406-412)
        scene = topk_scene_points_near_body(
            cond.scene_pcd, pred_vertices, max_collision_points)
        normals = vertex_normals(pred_vertices, smpl_neutral.faces)
        mask = bbox_mask(scene, jax.lax.stop_gradient(pred_vertices))
        sdf = signed_distance(scene, pred_vertices, normals)
        loss_coll = jnp.mean(collision_loss(sdf, mask.astype(sdf.dtype)))
    else:
        loss_coll = jnp.zeros(())

    total = (weights.v2v * loss_v2v
             + weights.keypoints_3d * loss_kp3d
             + weights.keypoints_3d_full * loss_kp3d_full
             + weights.keypoints_2d_full * loss_kp2d_full
             + weights.betas * loss_betas
             + weights.body_pose * loss_body_pose
             + weights.global_orient * loss_global_orient
             + weights.pose_6d_ortho * loss_ortho
             + weights.coap_penetration * loss_coll)

    losses = {
        "loss": total,
        "loss_v2v": loss_v2v,
        "loss_keypoints_3d": loss_kp3d,
        "loss_keypoints_3d_full": loss_kp3d_full,
        "loss_keypoints_2d_full": loss_kp2d_full,
        "loss_betas": loss_betas,
        "loss_body_pose": loss_body_pose,
        "loss_global_orient": loss_global_orient,
        "loss_pose_6d_ortho": loss_ortho,
        "loss_coap_penetration": loss_coll,
    }

    if not train:
        # visible-3d-joint error, the reference's model-selection metric
        # (egohmr.py:357-372)
        gt_kp2d_smpl = perspective_projection(
            gt_joints, jnp.zeros((B, 3)), cond.focal_length, cond.camera_center
        )[:, :24]
        vis = ((gt_kp2d_smpl[..., 0] >= 0) & (gt_kp2d_smpl[..., 0] < cfg.full_img_w)
               & (gt_kp2d_smpl[..., 1] >= 0) & (gt_kp2d_smpl[..., 1] < cfg.full_img_h))
        err = jnp.linalg.norm(pa(pred_kp3d) - pa(gt_kp3d), axis=-1) * vis
        # per-sample sums so callers can mask out padded batch rows
        losses["loss_keypoints_3d_vis_per_sample"] = jnp.sum(err, axis=1)
        losses["joint_vis_num_per_sample"] = jnp.sum(vis, axis=1)
        losses["loss_keypoints_3d_vis_batch_sum"] = jnp.sum(err)
        losses["joint_vis_num_batch"] = jnp.sum(vis)

    return total, losses

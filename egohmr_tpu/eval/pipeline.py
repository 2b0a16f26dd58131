"""Stage-2 inference + metric evaluation pipeline.

Batched equivalent of reference test_egohmr.py:95-705. The reference's
`for n in range(num_samples)` Python loop (test_egohmr.py:251-264) becomes a
single device program: the per-image condition is computed once and tiled S
times along the batch axis, so all S diverse samples for all B images run in
one sampler scan.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..collision import (
    bbox_mask,
    collision_ratio,
    min_body_scene_distance,
    signed_distance,
)
from ..diffusion import DiffusionSchedule, GuidanceConfig, sample_loop
from ..models import (
    BodyRepStats,
    Condition,
    EgoHMRConfig,
    compute_condition,
    make_denoise_fn,
    make_guidance_fn,
    model_outputs,
)
from ..smpl import SMPLModel, lbs, vertex_normals
from .metrics import (
    apd,
    diversity_std,
    joint_visibility_mask,
    mpjpe,
    pa_mpjpe,
    v2v,
)

Array = jax.Array


def tile_condition(cond: Condition, s: int) -> Condition:
    """Repeat each sample's condition S times along the batch axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, s, axis=0), cond)


def sample_bodies(
    params: dict,
    cfg: EgoHMRConfig,
    smpl: SMPLModel,
    stats: BodyRepStats,
    schedule: DiffusionSchedule,
    batch: Dict,
    key: Array,
    num_samples: int,
    *,
    sampler: str = "ddpm",
    with_guidance: bool = False,
    guidance: GuidanceConfig = GuidanceConfig(),
    use_stage1_transl: bool = True,
    collision_backend: str = "sdf",
    occ_params: Optional[dict] = None,
    occ_cfg=None,
    bf16: bool = False,
    params_precast: bool = False,
    guidance_refresh_every: int = 1,
    guidance_grad_mode: str = "exact",
) -> Tuple[Dict[str, Array], Condition]:
    """Draw `num_samples` bodies per image; outputs have shape [B, S, ...].

    `use_stage1_transl` injects the stage-1 predicted translation
    (reference test_egohmr.py:243-245) when present in the batch.
    `collision_backend` selects the guidance gradient source: the exact
    mesh SDF ('sdf', default), the distilled learned occupancy
    ('occupancy', the COAP-family path — reference egohmr.py:517-605), or
    the distilled learned signed-distance net ('volsdf', the
    VolumetricSMPL-family path — reference egohmr_volsmpl.py:583-626).
    For the learned backends, `occ_params`/`occ_cfg` carry that backend's
    collision-net weights/config (`load_occupancy` / `load_sdfnet`).
    `guidance_refresh_every` > 1 reuses the guided-step selection pass
    (nearest vertices / signs / scoring points) across that many adjacent
    guided steps — a measured speed/approximation knob (see
    `make_guidance_fn`); 1 is exact. sdf backend only.
    `guidance_grad_mode` is a PROFILING seam ("forward-only" measures the
    zero-backward guided-step floor, tools/probe_guided_backward.py);
    anything but "exact" is not a product mode. sdf backend only.
    """
    if guidance_grad_mode != "exact" and collision_backend != "sdf":
        raise ValueError("guidance_grad_mode is an sdf-backend profiling "
                         "seam; use --collision_backend sdf")
    if (with_guidance and guidance_refresh_every != 1
            and collision_backend in ("occupancy", "volsdf")):
        raise ValueError(
            "guidance_refresh_every > 1 is an sdf-backend knob (it caches "
            f"the mesh-SDF selection pass); the {collision_backend} backend "
            "has no per-step selection stage to reuse. Drop "
            "--guidance_refresh or use --collision_backend sdf.")
    if use_stage1_transl and "stage1_transl_full" in batch:
        batch = dict(batch)
        batch["smpl_params"] = dict(batch["smpl_params"])
        batch["smpl_params"]["transl"] = batch["stage1_transl_full"]

    B = batch["img"].shape[0]
    if bf16:
        # low-precision conditioning + denoiser (BN stats stay f32 and fold
        # into the activation dtype — nn.core.batchnorm); sampler math,
        # guidance, SMPL and metrics stay float32. `params_precast` means
        # the caller already holds a bf16 tree (e.g. serving.Predictor casts
        # ONCE at startup instead of per compiled request).
        from ..nn.core import cast_params_bf16

        if not params_precast:
            params = cast_params_bf16(params)
        batch = dict(batch)
        batch["img"] = batch["img"].astype(jnp.bfloat16)
        # the scene cloud stays f32: compute_condition casts only the
        # encoder's input to the image dtype, so Condition.scene_pcd keeps
        # full precision for guidance and collision/contact metrics
    cond, _ = compute_condition(params, cfg, batch)
    cond_s = tile_condition(cond, num_samples)
    if bf16:
        raw = make_denoise_fn(params, cfg, cond_s)
        denoise = lambda x, t: raw(
            x.astype(jnp.bfloat16), t).astype(jnp.float32)
        # downstream consumers (guidance, SMPL, reprojection) are f32
        cond_s = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x, cond_s)
        cond = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x, cond)
    else:
        denoise = make_denoise_fn(params, cfg, cond_s)
    guidance_fn = None
    if with_guidance:
        if collision_backend == "occupancy":
            from ..collision.neural_occupancy import make_occupancy_guidance_fn

            assert occ_params is not None, (
                "--collision_backend occupancy needs a distilled artifact "
                "(--occupancy_ckpt)")
            guidance_fn = make_occupancy_guidance_fn(
                occ_params, occ_cfg, smpl, cond_s, stats)
        elif collision_backend == "volsdf":
            from ..collision.neural_sdf import make_volsdf_guidance_fn

            assert occ_params is not None, (
                "--collision_backend volsdf needs a distilled artifact "
                "(--sdfnet_ckpt)")
            guidance_fn = make_volsdf_guidance_fn(
                occ_params, occ_cfg, smpl, cond_s, stats)
        else:
            guidance_fn = make_guidance_fn(
                params, cfg, smpl, cond_s, stats,
                selection_refresh_every=guidance_refresh_every,
                grad_mode=guidance_grad_mode)
    _, x0 = sample_loop(
        schedule, denoise, key, (B * num_samples, 144),
        sampler=sampler, guidance_fn=guidance_fn, guidance=guidance,
    )
    out = model_outputs(cfg, smpl, cond_s, x0, stats)
    out = {k: v.reshape(B, num_samples, *v.shape[1:]) for k, v in out.items()}
    return out, cond


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EvalResult:
    """Per-image metrics, all [B] or [B, S]; distances in meters."""

    g_mpjpe: Array
    g_mpjpe_vis: Array
    g_mpjpe_invis: Array
    mpjpe_all: Array
    mpjpe_vis: Array
    mpjpe_invis: Array
    pa_mpjpe_all: Array
    pa_mpjpe_vis: Array
    pa_mpjpe_invis: Array
    v2v_all: Array
    v2v_vis: Array
    v2v_invis: Array
    std_all: Array
    std_vis: Array
    std_invis: Array
    apd_all: Array
    apd_vis: Array
    apd_invis: Array
    coll_ratio: Optional[Array]
    contact: Optional[Array]
    # per-image visible / invisible joint & vertex counts — weights for
    # aggregating the masked metrics across images (images with an empty mask
    # contribute zero weight; reference test_egohmr.py:633-640 sums errors
    # and divides by the global joint/vertex counts)
    vis_count: Array
    invis_count: Array
    vertex_vis_count: Array
    vertex_invis_count: Array


def evaluate_batch(
    cfg: EgoHMRConfig,
    smpl_neutral: SMPLModel,
    smpl_male: SMPLModel,
    smpl_female: SMPLModel,
    batch: Dict,
    outputs: Dict[str, Array],
    cond: Condition,
    *,
    eval_with_vis_mask_pa: bool = True,
    eval_collision: bool = True,
    eval_contact: bool = True,
    contact_thresh: float = 0.02,
    collision_backend: str = "sdf",
    occ_params: Optional[dict] = None,
    occ_cfg=None,
) -> EvalResult:
    """Metrics per reference test_egohmr.py:374-505.

    outputs: [B, S, ...] from `sample_bodies`. `collision_backend`
    'occupancy' computes the collision ratio from the distilled occupancy
    net (occ>0.5 inside the body bbox / total points), mirroring the
    reference's COAP eval_coll (egohmr.py:487-514); 'volsdf' computes it
    from the distilled signed-distance net (sdf<0), mirroring the
    volsmpl eval_coll (egohmr_volsmpl.py:546-580 — batched here instead
    of the reference's per-item Python loop).
    """
    B, S = outputs["pred_keypoints_3d"].shape[:2]
    gtp = batch["smpl_params"]

    # gendered GT body (reference :280-311)
    gt_m = lbs(smpl_male, gtp["betas"], gtp["global_orient"], gtp["body_pose"],
               transl=gtp["transl"], pose2rot=True)
    gt_f = lbs(smpl_female, gtp["betas"], gtp["global_orient"],
               gtp["body_pose"], transl=gtp["transl"], pose2rot=True)
    is_f = (batch["gender"] == 1)[:, None, None]
    gt_verts = jnp.where(is_f, gt_f.vertices, gt_m.vertices)
    gt_joints45 = jnp.where(is_f, gt_f.joints, gt_m.joints)
    gt_kp3d = gt_joints45[:, :24]

    # visibility from projecting GT joints into the full image (:374-397)
    vis = joint_visibility_mask(
        gt_kp3d, cond.focal_length, cond.camera_center,
        cfg.full_img_w, cfg.full_img_h).astype(jnp.float32)  # [B, 24]
    invis = 1.0 - vis

    pred_kp3d_full = outputs["pred_keypoints_3d_full"][:, :, :24]  # [B,S,24,3]
    pred_kp3d = pred_kp3d_full  # same points; alignment handled per metric
    gt_full = gt_kp3d[:, None]  # [B, 1, 24, 3]
    gt_full_b = jnp.broadcast_to(gt_full, pred_kp3d.shape)

    vis_s = jnp.broadcast_to(vis[:, None], (B, S, 24))
    g_mpjpe = mpjpe(pred_kp3d_full, gt_full_b)                      # [B, S]
    g_vis = mpjpe(pred_kp3d_full, gt_full_b, mask=vis_s)
    g_invis = mpjpe(pred_kp3d_full, gt_full_b, mask=1.0 - vis_s)
    mp_all = mpjpe(pred_kp3d, gt_full_b, pelvis_align=True)
    mp_vis = mpjpe(pred_kp3d, gt_full_b, pelvis_align=True, mask=vis_s)
    mp_invis = mpjpe(pred_kp3d, gt_full_b, pelvis_align=True,
                     mask=1.0 - vis_s)

    # Procrustes on PELVIS-ALIGNED coordinates like the reference
    # (test_egohmr.py:421-431): the vis-masked fit zeroes invisible joints,
    # which is only translation-safe on aligned (near-zero-mean) coords.
    pred_align = pred_kp3d - pred_kp3d[:, :, :1]
    gt_align = gt_full_b - gt_full_b[:, :, :1]
    vm = vis_s if eval_with_vis_mask_pa else None
    pa_all = pa_mpjpe(pred_align, gt_align, vis_mask=vm)
    pa_vis = pa_mpjpe(pred_align, gt_align, vis_mask=vm, mask=vis_s)
    pa_invis = pa_mpjpe(pred_align, gt_align, vis_mask=vm, mask=1.0 - vis_s)

    # v2v in the LOCAL body frame: pred_vertices carry no translation, so the
    # pelvis must come from the local joints (reference test_egohmr.py:426-448
    # aligns both sides by their own pelvis)
    pred_kp3d_local = outputs["pred_keypoints_3d"][:, :, :24]
    pred_verts = outputs["pred_vertices"]  # [B, S, V, 3]
    gt_verts_b = jnp.broadcast_to(gt_verts[:, None], pred_verts.shape)
    # per-vertex visibility from projecting GT vertices (reference :381-389)
    vertex_vis = joint_visibility_mask(
        gt_verts, cond.focal_length, cond.camera_center,
        cfg.full_img_w, cfg.full_img_h).astype(jnp.float32)  # [B, V]
    vvis_s = jnp.broadcast_to(vertex_vis[:, None],
                              (B, S, vertex_vis.shape[-1]))
    v2v_all = v2v(pred_verts, gt_verts_b,
                  pred_kp3d_local[:, :, 0], gt_full_b[:, :, 0])
    v2v_vis = v2v(pred_verts, gt_verts_b,
                  pred_kp3d_local[:, :, 0], gt_full_b[:, :, 0], mask=vvis_s)
    v2v_invis = v2v(pred_verts, gt_verts_b,
                    pred_kp3d_local[:, :, 0], gt_full_b[:, :, 0],
                    mask=1.0 - vvis_s)

    # diversity over the S sample bodies (pelvis-aligned joints; :456-494)
    samples = pred_kp3d_full - pred_kp3d_full[:, :, :1]
    std_all = diversity_std(samples)
    std_vis = diversity_std(samples, vis)
    std_invis = diversity_std(samples, invis)
    apd_all = apd(samples)
    apd_vis = apd(samples, vis)
    apd_invis = apd(samples, invis)

    coll = None
    contact = None
    scene = cond.scene_pcd  # [B, P, 3] (canonical when scene_cano)
    if eval_collision or eval_contact:
        verts_flat = pred_verts.reshape(B * S, -1, 3)
        # bodies are posed without transl; scene is canonicalized to match
        scene_s = jnp.repeat(scene, S, axis=0)
        if eval_collision and collision_backend in ("occupancy", "volsdf"):
            from ..smpl import SMPLOutput

            rotmat = outputs["pred_pose_rotmat"].reshape(B * S, 24, 3, 3)
            betas_s = outputs["pred_betas"].reshape(B * S, 10)
            # rebuild the SMPLOutput from tensors model_outputs already
            # produced instead of re-running LBS over B*S bodies
            out_bs = SMPLOutput(
                vertices=verts_flat,
                joints=outputs["pred_keypoints_3d"].reshape(B * S, -1, 3),
                full_pose=rotmat,
                joints_smpl=outputs["pred_joints_smpl"].reshape(B * S, 24, 3),
            )
            if collision_backend == "occupancy":
                from ..collision.neural_occupancy import occupancy_query

                occ = occupancy_query(occ_params, occ_cfg, smpl_neutral,
                                      out_bs, betas_s, scene_s)
                inside = (occ > 0.5).astype(occ.dtype)
            else:
                from ..collision.neural_sdf import sdf_query

                sdf_pred = sdf_query(occ_params, occ_cfg, smpl_neutral,
                                     out_bs, betas_s, scene_s)
                # reference counts sdf_pred < 0 (egohmr_volsmpl.py:575)
                inside = (sdf_pred < 0.0).astype(sdf_pred.dtype)
            mask = bbox_mask(scene_s, verts_flat).astype(inside.dtype)
            coll = (jnp.sum(inside * mask, axis=-1)
                    / scene_s.shape[-2]).reshape(B, S)
        elif eval_collision:
            normals = vertex_normals(verts_flat, smpl_neutral.faces)
            mask = bbox_mask(scene_s, verts_flat)
            sdf = signed_distance(scene_s, verts_flat, normals)
            coll = collision_ratio(sdf, mask.astype(sdf.dtype)).reshape(B, S)
        if eval_contact:
            dmin = min_body_scene_distance(verts_flat, scene_s)
            # parity: the reference thresholds pytorch3d chamfer dists, which
            # are SQUARED (test_egohmr.py:500-503 + pytorch3d_chamfer_distance
            # .py:155 knn dists) — so 0.02 applies to dist², not dist
            contact = (jnp.square(dmin) < contact_thresh).astype(
                jnp.float32).reshape(B, S)

    return EvalResult(
        g_mpjpe=g_mpjpe, g_mpjpe_vis=g_vis, g_mpjpe_invis=g_invis,
        mpjpe_all=mp_all, mpjpe_vis=mp_vis,
        mpjpe_invis=mp_invis, pa_mpjpe_all=pa_all, pa_mpjpe_vis=pa_vis,
        pa_mpjpe_invis=pa_invis,
        v2v_all=v2v_all, v2v_vis=v2v_vis, v2v_invis=v2v_invis,
        std_all=std_all, std_vis=std_vis, std_invis=std_invis,
        apd_all=apd_all, apd_vis=apd_vis, apd_invis=apd_invis,
        coll_ratio=coll, contact=contact,
        vis_count=jnp.sum(vis, axis=-1), invis_count=jnp.sum(invis, axis=-1),
        vertex_vis_count=jnp.sum(vertex_vis, axis=-1),
        vertex_invis_count=jnp.sum(1.0 - vertex_vis, axis=-1),
    )

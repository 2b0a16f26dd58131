"""Stage-2 EgoHMR evaluation CLI.

Equivalent of reference test_egohmr.py:1-703 (flags and printed metrics
mirrored). The reference's nested Python loops (per-sample, per-image metric
accumulation) collapse into jitted batch programs; metrics are accumulated on
host and printed in mm like the reference (:630-671).

Usage:
  python -m egohmr_tpu.eval.test_egohmr --synthetic --num_samples 5
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def parse_args(argv=None, **default_overrides):
    """Build the stage-2 eval arg set. `default_overrides` replaces flag
    DEFAULTS (not parsed values) — the volsmpl alias CLI uses it to mirror
    the reference's test_egohmr.py / test_egohmr_volsmpl.py split, which
    differ only in defaults (SURVEY §2.5; reference test_egohmr_volsmpl.py
    is test_egohmr.py with EgoHMRVolsmpl + cond_grad_weight=30)."""
    p = argparse.ArgumentParser(description="EgoHMR (stage 2) evaluation")
    b = lambda x: str(x).lower() in ["true", "1"]
    p.add_argument("--two_stage", type=b, default=True)
    p.add_argument("--scene_crop_by_stage1_transl", type=b, default=True)
    p.add_argument("--stage1_result_path", type=str, default="")
    p.add_argument("--dataset_root", type=str, default="/mnt/ssd/egobody_release")
    p.add_argument("--dataset_file", type=str, default="")
    p.add_argument("--checkpoint", type=str, default="",
                   help="orbax dir, .npz, or reference torch .pt")
    p.add_argument("--body_rep_stats", type=str, default="",
                   help="preprocess_stats.npz path")
    p.add_argument("--smpl_model_path", type=str, default="data/smpl")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch_size", type=int, default=5)
    p.add_argument("--log_freq", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scene_cano", type=b, default=True)
    p.add_argument("--scene_type", type=str, default="cube")
    p.add_argument("--num_diffusion_timesteps", type=int, default=50)
    p.add_argument("--timestep_respacing_eval", type=str, default="ddpm",
                   choices=["ddim5", "ddpm"])
    p.add_argument("--diffuse_fuse", type=b, default=True)
    p.add_argument("--with_coap_grad", type=b, default=True,
                   help="collision-guided sampling (DDPM only)")
    p.add_argument("--cond_grad_weight", type=float, default=2.0)
    p.add_argument("--guidance_refresh", type=int, default=1,
                   help="recompute the guided-step selection pass only "
                        "every N-th guided step, reusing it in between "
                        "(1 = exact, the reference behavior; 2/4 trade a "
                        "measured approximation for speed — PARITY.md). "
                        "sdf backend only: occupancy has no selection "
                        "stage to reuse, and N>1 with it is an error")
    p.add_argument("--collision_backend", type=str, default="sdf",
                   choices=["sdf", "occupancy", "volsdf"],
                   help="'sdf': exact mesh SDF; 'occupancy': distilled "
                        "COAP-family net (needs --occupancy_ckpt, see "
                        "egohmr_tpu.train.distill_occupancy); 'volsdf': "
                        "distilled VolumetricSMPL-family signed-distance "
                        "net (needs --sdfnet_ckpt, see "
                        "egohmr_tpu.train.distill_sdf — reference "
                        "test_egohmr_volsmpl.py / egohmr_volsmpl.py)")
    p.add_argument("--occupancy_ckpt", type=str, default="",
                   help="distilled occupancy .npz artifact (or a COAP "
                        ".pt release, converted on load)")
    p.add_argument("--sdfnet_ckpt", type=str, default="",
                   help="distilled signed-distance .npz artifact (or a "
                        "VolumetricSMPL .ckpt release, converted on load)")
    p.add_argument("--only_mask_img_cond", type=b, default=True)
    p.add_argument("--pelvis_vis_loosen", type=b, default=True)
    p.add_argument("--gcn_nonlocal_layer", type=b, default=False)
    p.add_argument("--eval_spacing", type=int, default=1)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--eval_coll_loss", type=b, default=True)
    p.add_argument("--eval_contact_score", type=b, default=True)
    p.add_argument("--eval_with_vis_mask_pa", type=b, default=True)
    p.add_argument("--with_focal_length", type=b, default=True)
    p.add_argument("--with_cam_center", type=b, default=True)
    p.add_argument("--with_bbox_info", type=b, default=True)
    p.add_argument("--add_bbox_scale", type=float, default=1.2)
    p.add_argument("--num_batches", type=int, default=0,
                   help="limit evaluated batches (0 = all)")
    p.add_argument("--save_results", type=b, default=False)
    p.add_argument("--save_root", type=str, default="output_results")
    p.add_argument("--render", type=b, default=False,
                   help="save body-overlay renders for the first batch "
                        "(reference test_egohmr.py:41-44)")
    p.add_argument("--output_render_root", type=str, default="output_render")
    p.add_argument("--bf16", type=b, default=True,
                   help="bfloat16 conditioning + denoiser (BN folded to the "
                        "activation dtype); sampler math, guidance, SMPL and "
                        "metrics stay float32. DEFAULT since round 3 (gated "
                        "by the full-pipeline envelope test); pass false for "
                        "the exact-f32 parity path")
    p.add_argument("--pointnet_impl", type=str, default="fused",
                   choices=["xla", "fused"],
                   help="scene encoder: 'fused' = whole-network Pallas TPU "
                        "kernel (bf16 storage, ~2x faster; auto-falls back "
                        "to xla on CPU); 'xla' = exact f32 parity path")
    p.add_argument("--data_parallel", type=b, default=True,
                   help="shard eval batches across all local devices "
                        "(batch_size must divide by the device count)")
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX platform (e.g. 'cpu'); needed because "
                        "the axon sitecustomize overrides JAX_PLATFORMS")
    if default_overrides:
        known = {a.dest for a in p._actions}
        unknown = set(default_overrides) - known
        assert not unknown, f"unknown default overrides: {sorted(unknown)}"
        p.set_defaults(**default_overrides)
    return p.parse_args(argv)


def main(argv=None, **default_overrides):
    args = parse_args(argv, **default_overrides)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ..diffusion import GuidanceConfig, make_schedule
    from ..models import BodyRepStats, EgoHMRConfig, init_egohmr
    from ..smpl import create as smpl_create, make_synthetic_model
    from .pipeline import evaluate_batch, sample_bodies

    cfg = EgoHMRConfig(
        only_mask_img_cond=args.only_mask_img_cond,
        pelvis_vis_loosen=args.pelvis_vis_loosen,
        gcn_nonlocal_layer=args.gcn_nonlocal_layer,
        diffuse_fuse=args.diffuse_fuse,
        with_focal_length=args.with_focal_length,
        with_cam_center=args.with_cam_center,
        with_bbox_info=args.with_bbox_info,
        pointnet_impl=args.pointnet_impl,
    )

    respacing = ("" if args.timestep_respacing_eval == "ddpm"
                 else args.timestep_respacing_eval)
    schedule = make_schedule(args.num_diffusion_timesteps, "cosine", respacing)
    sampler = "ddpm" if respacing == "" else "ddim"
    # the reference threads cond_fn_with_grad into BOTH samplers
    # (gaussian_diffusion.py:764-772; DDIM uses the t<=3 eps-shift variant)
    with_guidance = args.with_coap_grad
    guidance = GuidanceConfig(cond_grad_weight=args.cond_grad_weight)

    # ---------------- model + stats
    if args.synthetic:
        smpl_n = smpl_m = smpl_f = make_synthetic_model(num_vertices=6890)
        params = init_egohmr(jax.random.PRNGKey(0), cfg)
        stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    else:
        smpl_n = smpl_create(args.smpl_model_path, "neutral")
        smpl_m = smpl_create(args.smpl_model_path, "male")
        smpl_f = smpl_create(args.smpl_model_path, "female")
        params = _load_params(args.checkpoint, cfg)
        from ..data.stats import load_stats

        mean, std = load_stats(args.body_rep_stats)
        stats = BodyRepStats(mean=jnp.asarray(mean), std=jnp.asarray(std))

    # ---------------- data
    from ..data.batching import pad_batch as _pad_batch

    if args.synthetic:
        from ..data.synthetic import synthetic_batch

        def batches():
            for i in range(args.num_batches or 4):
                yield synthetic_batch(args.batch_size, seed=100 + i), \
                    args.batch_size, None

    else:
        from ..data.egobody import EgoBodyDataset, to_device_batch

        test_file = args.dataset_file or os.path.join(
            args.dataset_root, "annotation_egocentric_smpl_npz",
            "egocapture_test_smpl.npz")
        ds = EgoBodyDataset(
            dataset_file=test_file, data_root=args.dataset_root,
            split="test", train=False, spacing=args.eval_spacing,
            scene_type=args.scene_type, scene_cano=args.scene_cano,
            add_scale=args.add_bbox_scale,
            load_stage1_transl=args.two_stage,
            stage1_result_path=args.stage1_result_path,
            scene_crop_by_stage1_transl=args.scene_crop_by_stage1_transl,
        )

        def batches():
            # drop_last=False: evaluate the FULL test split like the
            # reference DataLoader; a short final batch is padded to the
            # jitted shape and trimmed from the metrics
            it = ds.iter_batches(args.batch_size, shuffle=False,
                                 drop_last=False)
            for i, b in enumerate(it):
                if args.num_batches and i >= args.num_batches:
                    break
                n = b["img"].shape[0]
                if n < args.batch_size:
                    b = _pad_batch(b, args.batch_size)
                # imgname is host-only (dropped by to_device_batch); keep it
                # alongside for source-frame overlay rendering
                yield to_device_batch(b), n, b.get("imgname")

    # data-parallel eval: the whole pipeline is per-sample, so sharding the
    # batch over a 1-D mesh lets XLA partition every op with no code changes
    mesh = None
    if args.data_parallel and len(jax.devices()) > 1 \
            and args.batch_size % len(jax.devices()) == 0:
        from ..parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh()
        params = replicate(mesh, params)

    occ_params, occ_cfg = None, None
    if args.collision_backend == "occupancy":
        from ..collision.neural_occupancy import load_occupancy

        assert args.occupancy_ckpt, (
            "--collision_backend occupancy needs --occupancy_ckpt "
            "(train one with: python -m egohmr_tpu.train.distill_occupancy)")
        occ_params, occ_cfg = load_occupancy(args.occupancy_ckpt)
    elif args.collision_backend == "volsdf":
        from ..collision.neural_sdf import load_sdfnet

        assert args.sdfnet_ckpt, (
            "--collision_backend volsdf needs --sdfnet_ckpt "
            "(train one with: python -m egohmr_tpu.train.distill_sdf)")
        occ_params, occ_cfg = load_sdfnet(args.sdfnet_ckpt)

    # params as a jit ARGUMENT, not a closure constant: the axon remote
    # compiler rejects payloads with the full param tree baked in (HTTP 413)
    @jax.jit
    def run_batch(params, batch, key):
        outputs, cond = sample_bodies(
            params, cfg, smpl_n, stats, schedule, batch, key,
            args.num_samples, sampler=sampler, with_guidance=with_guidance,
            guidance=guidance, use_stage1_transl=args.two_stage,
            collision_backend=args.collision_backend,
            occ_params=occ_params, occ_cfg=occ_cfg, bf16=args.bf16,
            guidance_refresh_every=max(1, args.guidance_refresh),
        )
        return evaluate_batch(
            cfg, smpl_n, smpl_m, smpl_f, batch, outputs, cond,
            eval_with_vis_mask_pa=args.eval_with_vis_mask_pa,
            eval_collision=args.eval_coll_loss,
            eval_contact=args.eval_contact_score,
            collision_backend=args.collision_backend,
            occ_params=occ_params, occ_cfg=occ_cfg,
        ), outputs

    key = jax.random.PRNGKey(args.seed)
    acc: dict = {}
    weights_acc: dict = {}
    saved = []
    n_images = 0
    # error metrics aggregate weighted by joint/vertex counts (the reference
    # accumulates error SUMS over the whole split and divides by the global
    # count, test_egohmr.py:633-654); diversity metrics are plain per-image
    # means over images with a nonempty mask (reference :541-550 averages
    # per-image values, nan-filtering empty-mask images) -> indicator weights
    weight_key = {"mpjpe_vis": "vis", "pa_mpjpe_vis": "vis",
                  "g_mpjpe_vis": "vis",
                  "mpjpe_invis": "invis", "pa_mpjpe_invis": "invis",
                  "g_mpjpe_invis": "invis",
                  "v2v_vis": "vvis", "v2v_invis": "vinvis",
                  "std_vis": "vis_any", "apd_vis": "vis_any",
                  "std_invis": "invis_any", "apd_invis": "invis_any"}
    # per-image [N, S] invis errors for the smallest-error-sample mode
    # (reference test_egohmr.py:656-659) and reference-schema results.pkl
    minerr_err, minerr_cnt = [], []
    for i, (batch, n_valid, imgnames) in enumerate(batches()):
        key, sub = jax.random.split(key)
        if mesh is not None:
            from ..parallel import shard_batch

            batch = shard_batch(mesh, batch)
        res, outputs = run_batch(params, batch, sub)
        res = jax.device_get(res)
        res = jax.tree_util.tree_map(
            lambda a: np.asarray(a)[:n_valid], res)  # drop padded rows
        n_images += n_valid
        minerr_err.append(np.asarray(res.mpjpe_invis))
        minerr_cnt.append(np.asarray(res.invis_count))
        counts = {"vis": np.asarray(res.vis_count),
                  "invis": np.asarray(res.invis_count),
                  "vvis": np.asarray(res.vertex_vis_count),
                  "vinvis": np.asarray(res.vertex_invis_count)}
        counts["vis_any"] = (counts["vis"] > 0).astype(np.float32)
        counts["invis_any"] = (counts["invis"] > 0).astype(np.float32)
        for name in ("g_mpjpe", "g_mpjpe_vis", "g_mpjpe_invis",
                     "mpjpe_all", "mpjpe_vis", "mpjpe_invis",
                     "pa_mpjpe_all", "pa_mpjpe_vis", "pa_mpjpe_invis",
                     "v2v_all", "v2v_vis", "v2v_invis",
                     "std_all", "std_vis", "std_invis",
                     "apd_all", "apd_vis", "apd_invis", "coll_ratio",
                     "contact"):
            v = getattr(res, name)
            if v is None:
                continue
            v = np.asarray(v)
            if name in weight_key:
                w = counts[weight_key[name]]
                w = np.broadcast_to(
                    w.reshape(v.shape[0], *([1] * (v.ndim - 1))), v.shape)
            else:
                w = np.ones_like(v)
            acc.setdefault(name, []).append((v * w).reshape(-1))
            weights_acc.setdefault(name, []).append(w.reshape(-1))
        if args.save_results:
            # reference results.pkl schema (test_egohmr.py:674-693):
            # rotmat poses [B,S,·,3,3], betas, per-sample collision/contact,
            # stage-1 pred cam + GT cam translations
            rotmat = np.asarray(outputs["pred_pose_rotmat"])[:n_valid]
            row = {
                "pred_betas_list": np.asarray(outputs["pred_betas"])[:n_valid],
                "pred_global_orient_list": rotmat[:, :, :1],
                "pred_body_pose_list": rotmat[:, :, 1:],
                "gt_cam_full_list": np.asarray(
                    batch["smpl_params"]["transl"])[:n_valid],
                # extra (not in the reference dump): the raw rot6d vector,
                # the most direct parity handle against our own runs
                "pred_pose_6d": np.asarray(outputs["pred_pose_6d"])[:n_valid],
            }
            if res.coll_ratio is not None:
                row["collision_ratio_list"] = np.asarray(res.coll_ratio)
            if res.contact is not None:
                row["contact_ratio_list"] = np.asarray(res.contact)
            if args.two_stage and "stage1_transl_full" in batch:
                row["pred_cam_full_list"] = np.asarray(
                    batch["stage1_transl_full"])[:n_valid]
            saved.append(row)
        if args.render and i == 0:
            _render_batch(args, cfg, smpl_n, batch, outputs,
                          imgnames=imgnames)
        if i % max(args.log_freq, 1) == 0:
            g = (np.concatenate(acc["g_mpjpe"]).sum()
                 / max(np.concatenate(weights_acc["g_mpjpe"]).sum(), 1))
            print(f"[batch {i}] images={n_images} G-MPJPE={g*1000:.1f}mm")

    summary = {}
    for name, chunks in acc.items():
        num = np.concatenate(chunks).sum()
        den = np.concatenate(weights_acc[name]).sum()
        scale = 1000.0 if ("mpjpe" in name or "v2v" in name
                           or "std" in name or "apd" in name) else 1.0
        summary[name] = float(num / max(den, 1e-9) * scale)

    # smallest-error-sample-invis mode (reference test_egohmr.py:656-659):
    # per image, pick the sample with the lowest invisible-joint error, then
    # report the global invis-count-weighted error of the selected samples
    if minerr_err:
        err = np.concatenate(minerr_err)  # [N, S] per-image masked means
        cnt = np.concatenate(minerr_cnt)  # [N]
        sel = np.argmin(err, axis=1)
        chosen = err[np.arange(len(err)), sel]
        summary["mpjpe_invis_min_sample"] = float(
            (chosen * cnt).sum() / max(cnt.sum(), 1e-9) * 1000.0)
        print("--------- mode: smallest-error-sample-invis from "
              f"{err.shape[1]} samples ---------")
        print(f"MPJPE-invis: {summary['mpjpe_invis_min_sample']:.2f}")
    print(json.dumps(summary, indent=2))

    if args.save_results:
        # reference layout: {save_root}/output_egohmr_{model_id}/
        # results_seed_{seed}.pkl (test_egohmr.py:684-696)
        model_id = (os.path.basename(os.path.dirname(args.checkpoint))
                    if args.checkpoint else "synthetic")
        out_dir = os.path.join(args.save_root, f"output_egohmr_{model_id}")
        os.makedirs(out_dir, exist_ok=True)
        out = {k: np.concatenate([r[k] for r in saved])
               for k in saved[0]} if saved else {}
        out_path = os.path.join(out_dir, f"results_seed_{args.seed}.pkl")
        with open(out_path, "wb") as f:
            pickle.dump(out, f, protocol=2)
        print(f"[INFO] pred results saved to {out_dir}.")
    return summary


def _render_batch(args, cfg, smpl, batch, outputs, imgnames=None):
    """Overlay the first sample's body on the SOURCE frame when the jpg
    resolves (reference test_egohmr.py:556-626: cv2.imread + green bbox +
    pyrender overlay), falling back to a gray canvas at full resolution
    otherwise (synthetic runs / images missing from the fixture)."""
    import numpy as np
    from PIL import Image

    from ..viz.renderer import render_on_img

    os.makedirs(args.output_render_root, exist_ok=True)
    verts = np.asarray(outputs["pred_vertices"][:, 0])  # [B, V, 3]
    # samples were generated with the stage-1 translation when present
    # (sample_bodies swaps it in its local copy) — render with the same one
    if args.two_stage and "stage1_transl_full" in batch:
        transl = np.asarray(batch["stage1_transl_full"])
    else:
        transl = np.asarray(batch["smpl_params"]["transl"])
    fx = np.asarray(batch["fx"]) * cfg.fx_norm_coeff
    cx = np.asarray(batch["cam_cx"])
    cy = np.asarray(batch["cam_cy"])
    box_center = np.asarray(batch.get("box_center")) \
        if "box_center" in batch else None
    box_size = np.asarray(batch.get("box_size")) \
        if "box_size" in batch else None
    faces = np.asarray(smpl.faces)
    H, W = int(cfg.full_img_h), int(cfg.full_img_w)

    for b in range(min(len(verts), 4)):
        name = f"render_{b}.png"
        canvas = None
        if imgnames is not None and b < len(imgnames):
            path = imgnames[b]
            if isinstance(path, str) and os.path.exists(path):
                img = Image.open(path).convert("RGB")
                if img.size != (W, H):
                    img = img.resize((W, H))
                canvas = np.asarray(img, dtype=np.uint8).copy()
                parts = os.path.normpath(path).split(os.sep)
                rec = parts[-4] if len(parts) >= 4 else "img"
                name = f"{rec}_{os.path.basename(path)}.png"
        if canvas is None:
            canvas = np.full((H, W, 3), 32, np.uint8)
        if box_center is not None and box_size is not None:
            # green bbox like the reference cv2.rectangle (:566-571)
            x0 = int(np.clip(box_center[b][0] - box_size[b] / 2, 0, W - 1))
            x1 = int(np.clip(box_center[b][0] + box_size[b] / 2, 0, W - 1))
            y0 = int(np.clip(box_center[b][1] - box_size[b] / 2, 0, H - 1))
            y1 = int(np.clip(box_center[b][1] + box_size[b] / 2, 0, H - 1))
            t = 3
            # clamp the far-stripe starts: a negative python slice start
            # would wrap and paint the stripe on the opposite image edge
            canvas[y0:y0 + t, x0:x1] = (0, 255, 0)
            canvas[max(y1 - t, 0):y1, x0:x1] = (0, 255, 0)
            canvas[y0:y1, x0:x0 + t] = (0, 255, 0)
            canvas[y0:y1, max(x1 - t, 0):x1] = (0, 255, 0)
        out = render_on_img(canvas, verts[b] + transl[b], faces,
                            (fx[b], fx[b]), (cx[b], cy[b]))
        Image.fromarray(out).save(os.path.join(args.output_render_root, name))
    print(f"renders saved to {args.output_render_root}/")


def _load_params(checkpoint: str, cfg):
    import jax
    import jax.numpy as jnp

    if checkpoint.endswith((".pt", ".pth", ".ckpt")):
        from ..interop.torch_convert import convert_egohmr, load_torch_checkpoint

        sd = load_torch_checkpoint(checkpoint)
        return convert_egohmr(sd, num_layers=cfg.gcn_layers)
    from ..utils.checkpoint import restore_checkpoint

    state = restore_checkpoint(checkpoint)
    params = state["params"] if "params" in state else state
    # restored leaves are numpy; device arrays avoid tracer-indexing errors
    # (e.g. pe[t] inside the sampler scan) and host->device churn per batch
    return jax.tree_util.tree_map(jnp.asarray, params)


if __name__ == "__main__":
    main()

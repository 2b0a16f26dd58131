"""Stage-1 ProHMR-scene evaluation CLI.

Equivalent of reference test_prohmr_scene.py:1-434: mode-only (z=0) metrics
plus the `pred_cam_full_list` pkl that stage-2 consumes
(reference :417-427 -> test_egohmr.py --stage1_result_path).

Usage:
  python -m egohmr_tpu.eval.test_prohmr --synthetic
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ProHMR-scene (stage 1) evaluation")
    b = lambda x: str(x).lower() in ["true", "1"]
    p.add_argument("--dataset_root", type=str, default="/mnt/ssd/egobody_release")
    p.add_argument("--dataset_file", type=str, default="")
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--smpl_model_path", type=str, default="data/smpl")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--pointnet_impl", type=str, default="fused",
                   choices=["xla", "fused"],
                   help="scene encoder: fused Pallas TPU kernel or XLA")
    p.add_argument("--num_samples", type=int, default=5,
                   help="mode + (n-1) random samples (reference "
                        "test_prohmr_scene.py:23)")
    p.add_argument("--eval_spacing", type=int, default=1)
    p.add_argument("--num_batches", type=int, default=0)
    p.add_argument("--scene_cano", type=b, default=False)
    p.add_argument("--scene_type", type=str, default="whole_scene")
    p.add_argument("--with_focal_length", type=b, default=True)
    p.add_argument("--with_cam_center", type=b, default=True)
    p.add_argument("--with_bbox_info", type=b, default=True)
    p.add_argument("--add_bbox_scale", type=float, default=1.2)
    p.add_argument("--save_results", type=b, default=True)
    p.add_argument("--save_root", type=str, default="output_results/prohmr_scene")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX platform (e.g. 'cpu'); needed because "
                        "the axon sitecustomize overrides JAX_PLATFORMS")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ..eval.metrics import mpjpe, pa_mpjpe, v2v
    from ..models.prohmr import ProHMRConfig, forward, init_prohmr
    from ..smpl import create as smpl_create, lbs, make_synthetic_model

    cfg = ProHMRConfig(
        with_focal_length=args.with_focal_length,
        with_cam_center=args.with_cam_center,
        with_bbox_info=args.with_bbox_info,
        pointnet_impl=args.pointnet_impl,
    )

    if args.synthetic:
        smpl_n = smpl_m = smpl_f = make_synthetic_model(num_vertices=6890)
        params = init_prohmr(jax.random.PRNGKey(0), cfg)

        from ..data.synthetic import synthetic_batch

        def batches():
            for i in range(args.num_batches or 2):
                yield synthetic_batch(args.batch_size, seed=200 + i), \
                    args.batch_size

    else:
        smpl_n = smpl_create(args.smpl_model_path, "neutral")
        smpl_m = smpl_create(args.smpl_model_path, "male")
        smpl_f = smpl_create(args.smpl_model_path, "female")
        if args.checkpoint.endswith((".pt", ".pth", ".ckpt")):
            # reference-layout release checkpoint (e.g. the published
            # 53618.pt — reference README.md:68-70): converted on load,
            # same drop-in path the stage-2 CLI has
            from ..interop.torch_convert import (
                convert_prohmr,
                load_torch_checkpoint,
            )

            params = convert_prohmr(load_torch_checkpoint(args.checkpoint))
        else:
            from ..utils.checkpoint import restore_checkpoint

            state = restore_checkpoint(args.checkpoint)
            params = state["params"] if "params" in state else state
        # numpy leaves -> device arrays (tracer-safe indexing, no per-batch
        # host->device transfers of the weights)
        params = jax.tree_util.tree_map(jnp.asarray, params)

        from ..data.egobody import EgoBodyDataset, to_device_batch

        test_file = args.dataset_file or os.path.join(
            args.dataset_root, "annotation_egocentric_smpl_npz",
            "egocapture_test_smpl.npz")
        ds = EgoBodyDataset(
            dataset_file=test_file, data_root=args.dataset_root,
            split="test", train=False, spacing=args.eval_spacing,
            scene_type=args.scene_type, scene_cano=args.scene_cano,
            add_scale=args.add_bbox_scale,
        )

        def batches():
            for i, bt in enumerate(ds.iter_batches(args.batch_size,
                                                   shuffle=False,
                                                   drop_last=False)):
                if args.num_batches and i >= args.num_batches:
                    break
                n = bt["img"].shape[0]
                if n < args.batch_size:
                    # pad the short final batch to the jitted shape (trimmed
                    # below) instead of recompiling the whole pipeline
                    import numpy as _np

                    def pad(x):
                        if isinstance(x, dict):
                            return {k: pad(v) for k, v in x.items()}
                        if isinstance(x, list):
                            return x + [x[-1]] * (args.batch_size - len(x))
                        return _np.concatenate(
                            [x, _np.repeat(x[-1:], args.batch_size - n,
                                           axis=0)])

                    bt = pad(bt)
                yield to_device_batch(bt), n

    # params as a jit ARGUMENT, not a closure constant: the axon remote
    # compiler rejects payloads with the full param tree baked in (HTTP 413)
    @jax.jit
    def run_batch(params, batch, key):
        out, _ = forward(params, cfg, smpl_n, batch, key, args.num_samples,
                         train=False, scene_cano=args.scene_cano)
        gtp = batch["smpl_params"]
        gt_m = lbs(smpl_m, gtp["betas"], gtp["global_orient"],
                   gtp["body_pose"], transl=gtp["transl"], pose2rot=True)
        gt_f = lbs(smpl_f, gtp["betas"], gtp["global_orient"],
                   gtp["body_pose"], transl=gtp["transl"], pose2rot=True)
        is_f = (batch["gender"] == 1)[:, None, None]
        gt_joints = jnp.where(is_f, gt_f.joints, gt_m.joints)[:, :24]
        gt_verts = jnp.where(is_f, gt_f.vertices, gt_m.vertices)

        # mode-only metrics (reference test_prohmr_scene.py:291-321)
        pred_full = out.pred_keypoints_3d_full[:, 0, :24]
        pred_local = out.pred_keypoints_3d[:, 0, :24]  # same frame as verts
        pred_verts = out.pred_vertices[:, 0]
        g = mpjpe(pred_full, gt_joints)
        mp = mpjpe(pred_full, gt_joints, pelvis_align=True)
        pa = pa_mpjpe(pred_full, gt_joints)
        vv = v2v(pred_verts, gt_verts, pred_local[:, 0], gt_joints[:, 0])
        return {"g_mpjpe": g, "mpjpe": mp, "pa_mpjpe": pa, "v2v": vv,
                "pred_cam_full": out.pred_cam_t_full[:, 0]}

    key = jax.random.PRNGKey(args.seed)
    acc: dict = {}
    cam_full = []
    for batch, n_valid in batches():
        key, sub = jax.random.split(key)
        res = jax.device_get(run_batch(params, batch, sub))
        res = {k: np.asarray(v)[:n_valid] for k, v in res.items()}
        cam_full.append(res.pop("pred_cam_full"))
        for k, v in res.items():
            acc.setdefault(k, []).append(v)

    summary = {k: float(np.concatenate(v).mean() * 1000.0)
               for k, v in acc.items()}
    print(json.dumps(summary, indent=2))

    if args.save_results:
        os.makedirs(args.save_root, exist_ok=True)
        with open(os.path.join(args.save_root, "results.pkl"), "wb") as f:
            pickle.dump(
                {"pred_cam_full_list": np.concatenate(cam_full, axis=0)}, f)
        print(f"saved stage-1 translations to {args.save_root}/results.pkl")
    return summary


if __name__ == "__main__":
    main()

"""Stage-2 EgoHMR training CLI.

TPU-native equivalent of reference train_egohmr.py:1-257 (flag names and
defaults kept). Differences: functional jitted train step (optionally SPMD
over all local devices), orbax checkpoints WITH resume, JSONL metrics.

Runs against the real EgoBody dataset when --dataset_root is valid, or
--synthetic for an end-to-end smoke run with generated data.

Usage:
  python -m egohmr_tpu.train.train_egohmr --synthetic --num_steps 20
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="EgoHMR (stage 2) training")
    b = lambda x: str(x).lower() in ["true", "1"]
    p.add_argument("--save_dir", type=str, default="runs_egohmr")
    p.add_argument("--dataset_root", type=str, default="/mnt/ssd/egobody_release")
    p.add_argument("--dataset_file_train", type=str, default="")
    p.add_argument("--dataset_file_val", type=str, default="")
    p.add_argument("--smpl_model_path", type=str, default="data/smpl")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke/perf runs)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--log_step", type=int, default=1000)
    p.add_argument("--val_step", type=int, default=1000)
    p.add_argument("--save_step", type=int, default=2000)
    p.add_argument("--resume", type=b, default=True)
    p.add_argument("--data_parallel", type=b, default=True)
    # scene args (reference train_egohmr.py:34-37)
    p.add_argument("--scene_cano", type=b, default=True)
    p.add_argument("--scene_type", type=str, default="cube",
                   choices=["whole_scene", "cube"])
    # loss weights (reference :39-49)
    p.add_argument("--weight_loss_v2v", type=float, default=0.5)
    p.add_argument("--weight_loss_keypoints_3d", type=float, default=0.05)
    p.add_argument("--weight_loss_keypoints_3d_full", type=float, default=0.02)
    p.add_argument("--weight_loss_keypoints_2d_full", type=float, default=0.01)
    p.add_argument("--weight_loss_betas", type=float, default=0.0005)
    p.add_argument("--weight_loss_body_pose", type=float, default=0.001)
    p.add_argument("--weight_loss_global_orient", type=float, default=0.001)
    p.add_argument("--weight_loss_pose_6d_ortho", type=float, default=0.1)
    p.add_argument("--weight_coap_penetration", type=float, default=0.0002)
    p.add_argument("--start_coap_step", type=int, default=30000,
                   help="step to enable the collision loss (the reference "
                        "gates on epoch 3; train_egohmr.py:49)")
    # diffusion args (reference :51-59)
    p.add_argument("--num_diffusion_timesteps", type=int, default=50)
    p.add_argument("--timestep_respacing_eval", type=str, default="ddim5",
                   choices=["ddim5", "ddpm"])
    p.add_argument("--cond_mask_prob", type=float, default=0.01)
    p.add_argument("--only_mask_img_cond", type=b, default=True)
    p.add_argument("--pelvis_vis_loosen", type=b, default=False)
    p.add_argument("--gcn_nonlocal_layer", type=b, default=False)
    p.add_argument("--with_focal_length", type=b, default=True)
    p.add_argument("--with_cam_center", type=b, default=True)
    p.add_argument("--with_bbox_info", type=b, default=True)
    p.add_argument("--add_bbox_scale", type=float, default=1.2)
    p.add_argument("--do_augment", type=b, default=True)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--mixed_precision", type=b, default=True,
                   help="bf16 forward/backward for encoders + denoiser; f32 "
                        "master params, BN stats, SMPL and losses (no loss "
                        "scaling needed on TPU — bf16 keeps f32's exponent "
                        "range). DEFAULT since round 4 (1.73x step rate; "
                        "convergence overlay committed in artifacts/"
                        "train_precision_overlay.json). Pass "
                        "'--mixed_precision false' for exact-parity f32.")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--load_pretrained_ckpt", type=str, default="",
                   help=".pt (torch, backbone warm start) or orbax dir")
    p.add_argument("--export_torch", type=str, default="",
                   help="after training, also write the final params in the "
                        "reference torch checkpoint layout (.pt, or .npz "
                        "without torch) for the released PyTorch eval code")
    p.add_argument("--load_imagenet_ckpt", type=str, default="",
                   help="torchvision ImageNet resnet50 state_dict (.pt/.pth "
                        "or flat .npz) for backbone warm start — the "
                        "reference's default recipe (models/resnet.py:166-255)")
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

    from ..data.synthetic import synthetic_batch
    from ..diffusion import make_schedule
    from ..models import BodyRepStats, EgoHMRConfig, LossWeights, init_egohmr
    from ..parallel import make_mesh, replicate, shard_batch
    from ..smpl import create as smpl_create, make_synthetic_model
    from ..utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from ..utils.logging import MetricsWriter, get_logger, save_config
    from .loop import TrainConfig, make_optimizer, make_train_step

    os.makedirs(args.save_dir, exist_ok=True)
    logger = get_logger(args.save_dir)
    save_config(args.save_dir, vars(args))

    cfg = EgoHMRConfig(
        cond_mask_prob=args.cond_mask_prob,
        only_mask_img_cond=args.only_mask_img_cond,
        pelvis_vis_loosen=args.pelvis_vis_loosen,
        gcn_nonlocal_layer=args.gcn_nonlocal_layer,
        with_focal_length=args.with_focal_length,
        with_cam_center=args.with_cam_center,
        with_bbox_info=args.with_bbox_info,
    )
    weights = LossWeights(
        v2v=args.weight_loss_v2v,
        keypoints_3d=args.weight_loss_keypoints_3d,
        keypoints_3d_full=args.weight_loss_keypoints_3d_full,
        keypoints_2d_full=args.weight_loss_keypoints_2d_full,
        betas=args.weight_loss_betas,
        body_pose=args.weight_loss_body_pose,
        global_orient=args.weight_loss_global_orient,
        pose_6d_ortho=args.weight_loss_pose_6d_ortho,
        coap_penetration=args.weight_coap_penetration,
    )
    schedule = make_schedule(args.num_diffusion_timesteps, "cosine", "")

    # ---------------- data
    if args.synthetic:
        smpl_n = smpl_m = smpl_f = make_synthetic_model(num_vertices=6890)

        def batches():
            i = 0
            while True:
                yield synthetic_batch(args.batch_size, seed=i)
                i += 1

        batch_iter = batches()
        stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    else:
        from ..data.egobody import (
            EgoBodyDataset,
            finalize_batch,
            to_device_batch,
        )
        from ..data.stats import compute_body_rep_stats

        smpl_n = smpl_create(args.smpl_model_path, "neutral")
        smpl_m = smpl_create(args.smpl_model_path, "male")
        smpl_f = smpl_create(args.smpl_model_path, "female")
        train_file = args.dataset_file_train or os.path.join(
            args.dataset_root, "annotation_egocentric_smpl_npz",
            "egocapture_train_smpl.npz")
        ds = EgoBodyDataset(
            dataset_file=train_file, data_root=args.dataset_root,
            split="train", train=True, do_augment=args.do_augment,
            scene_type=args.scene_type, scene_cano=args.scene_cano,
            add_scale=args.add_bbox_scale,
        )
        mean, std = compute_body_rep_stats(ds.global_orient, ds.body_pose)
        from ..data.stats import save_stats

        save_stats(os.path.join(args.save_dir, "preprocess_stats",
                                "preprocess_stats.npz"), mean, std)
        stats = BodyRepStats(mean=jnp.asarray(mean), std=jnp.asarray(std))

        def batches():
            epoch = 0
            while True:
                for b in ds.iter_batches(args.batch_size, seed=epoch):
                    # batched replacement for the reference's per-item torch
                    # SMPL transl fix-up after augmentation
                    b = finalize_batch(b, smpl_m, smpl_f)
                    yield to_device_batch(b)
                epoch += 1

        # background-thread prefetch: decode/augment the next batch while the
        # current step runs (replaces the reference's DataLoader workers)
        from ..data.prefetch import prefetch_to_device

        batch_iter = prefetch_to_device(batches(), size=2,
                                        device_put=lambda x: x)

    params = init_egohmr(jax.random.PRNGKey(args.seed), cfg)
    if args.load_imagenet_ckpt:
        # ImageNet warm start: torchvision model-zoo layout, prefix=""
        # (reference resnet(cfg, pretrained=True), models/resnet.py:152-255 —
        # zoo keys merged into the headless model, fc/avgpool keys dropped)
        from ..interop.torch_convert import convert_resnet, load_torch_checkpoint

        sd = load_torch_checkpoint(args.load_imagenet_ckpt)
        params["backbone"] = convert_resnet(sd, prefix="")
        logger.info("warm-started backbone from ImageNet ckpt %s",
                    args.load_imagenet_ckpt)
    if args.load_pretrained_ckpt.endswith(".pt"):
        # backbone-only warm start from a torch ProHMR checkpoint
        # (reference train_egohmr.py:130-136, strict=False)
        from ..interop.torch_convert import convert_resnet, load_torch_checkpoint

        sd = load_torch_checkpoint(args.load_pretrained_ckpt)
        params["backbone"] = convert_resnet(sd, "backbone.")
        logger.info("warm-started backbone from %s", args.load_pretrained_ckpt)

    mesh = make_mesh() if (args.data_parallel and len(jax.devices()) > 1) else None

    def build_step(use_collision):
        tcfg = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                           use_collision_loss=use_collision,
                           mixed_precision=args.mixed_precision)
        return make_train_step(cfg, tcfg, weights, schedule, stats,
                               smpl_n, smpl_m, smpl_f, optimizer, mesh=mesh)

    tcfg0 = TrainConfig(lr=args.lr, weight_decay=args.weight_decay)
    optimizer = make_optimizer(tcfg0)
    opt_state = optimizer.init(params)

    start_step = 0
    ckpt_dir = os.path.join(args.save_dir, "checkpoints")
    if args.resume:
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            state = restore_checkpoint(
                latest, {"params": params, "opt_state": opt_state, "step": 0})
            params, opt_state = state["params"], state["opt_state"]
            start_step = int(state["step"]) + 1
            logger.info("resumed from %s at step %d", latest, start_step)

    if mesh is not None:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)

    steps = {False: build_step(False), True: build_step(True)}
    writer = MetricsWriter(args.save_dir)
    key = jax.random.PRNGKey(args.seed + 1)

    # ---------------- validation (best-model selection on the visible-3d-
    # joint error, like the reference train_egohmr.py:175-223)
    eval_respacing = ("" if args.timestep_respacing_eval == "ddpm"
                      else args.timestep_respacing_eval)
    eval_schedule = make_schedule(args.num_diffusion_timesteps, "cosine",
                                  eval_respacing)

    from ..models import compute_loss as _compute_loss, model_outputs
    from ..models.egohmr import make_denoise_fn
    from ..diffusion import sample_loop
    from ..models import compute_condition

    @jax.jit
    def val_step(p, batch, k):
        B = batch["img"].shape[0]
        cond, _ = compute_condition(p, cfg, batch)
        denoise = make_denoise_fn(p, cfg, cond)
        _, x0 = sample_loop(eval_schedule, denoise, k, (B, 144),
                            sampler="ddpm" if eval_respacing == "" else "ddim")
        outputs = model_outputs(cfg, smpl_n, cond, x0, stats)
        _, losses = _compute_loss(cfg, weights, smpl_n, smpl_m, smpl_f,
                                  batch, cond, outputs, train=False)
        return (losses["loss_keypoints_3d_vis_per_sample"],
                losses["joint_vis_num_per_sample"])

    # val batches as (batch, n_valid): the short final batch is padded to
    # the compiled shape (one odd shape = one extra 15-30 min remote compile)
    # and its padded rows masked out of the metric via n_valid
    from ..data.batching import pad_batch

    if args.synthetic:
        val_batches = [(synthetic_batch(args.batch_size, seed=10_000),
                        args.batch_size)]
    else:
        val_file = args.dataset_file_val or os.path.join(
            args.dataset_root, "annotation_egocentric_smpl_npz",
            "egocapture_val_smpl.npz")
        try:
            val_ds = EgoBodyDataset(
                dataset_file=val_file, data_root=args.dataset_root,
                split="val", train=False, spacing=20,  # eval_spacing=20 (ref :53)
                scene_type=args.scene_type, scene_cano=args.scene_cano,
                add_scale=args.add_bbox_scale,
            )
            val_batches = []
            for b in val_ds.iter_batches(args.batch_size, shuffle=False,
                                         drop_last=False):
                n = b["img"].shape[0]
                if n < args.batch_size:
                    b = pad_batch(b, args.batch_size)
                val_batches.append((to_device_batch(b), n))
        except (FileNotFoundError, KeyError) as e:
            logger.warning("no val split (%s); skipping validation", e)
            val_batches = []

    def run_validation(p, k):
        err_sum, vis_num = 0.0, 0.0
        for vb, n_valid in val_batches:
            k, sub = jax.random.split(k)
            e, n = val_step(p, vb, sub)
            err_sum += float(np.sum(np.asarray(e)[:n_valid]))
            vis_num += float(np.sum(np.asarray(n)[:n_valid]))
        return err_sum / max(vis_num, 1.0)

    best_val = float("inf")

    t0 = time.time()
    for step in range(start_step, args.num_steps):
        batch = next(batch_iter)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        key, sub = jax.random.split(key)
        use_coll = (args.weight_coap_penetration > 0
                    and step >= args.start_coap_step)
        params, opt_state, metrics = steps[use_coll](
            params, opt_state, batch, sub)
        if step % args.log_step == 0 or step == args.num_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            writer.write(step, m)
            logger.info("step %d loss %.4f (%.2f s/step)", step, m["loss"],
                        (time.time() - t0) / max(step - start_step + 1, 1))
        if val_batches and step % args.val_step == 0 and step > start_step:
            key, sub = jax.random.split(key)
            val_err = run_validation(params, sub)
            writer.write(step, {"val_keypoints_3d_vis": val_err})
            logger.info("step %d val vis-3d-joint err %.4f (best %.4f)",
                        step, val_err, best_val)
            if val_err < best_val:
                best_val = val_err
                save_checkpoint(os.path.join(ckpt_dir, "best_model_vis"),
                                {"params": jax.device_get(params),
                                 "opt_state": jax.device_get(opt_state),
                                 "step": step})
        if step % args.save_step == 0 and step > start_step:
            save_checkpoint(os.path.join(ckpt_dir, f"step_{step}"),
                            {"params": jax.device_get(params),
                             "opt_state": jax.device_get(opt_state),
                             "step": step})
    save_checkpoint(os.path.join(ckpt_dir, f"step_{args.num_steps - 1}"),
                    {"params": jax.device_get(params),
                     "opt_state": jax.device_get(opt_state),
                     "step": args.num_steps - 1})
    if args.export_torch:
        from ..interop.torch_export import export_egohmr, save_state_dict

        written = save_state_dict(export_egohmr(jax.device_get(params)),
                                  args.export_torch,
                                  extra={"total_steps": args.num_steps})
        logger.info("exported torch-layout checkpoint to %s", written)
    writer.close()
    logger.info("done")


if __name__ == "__main__":
    main()

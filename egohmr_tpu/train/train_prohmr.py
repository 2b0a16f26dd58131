"""Stage-1 ProHMR-scene training CLI.

Equivalent of reference train_prohmr_scene.py:1-218: interleaves EgoBody
batches with CMU-mocap batches for the discriminator; one jitted G+D step.

Usage:
  python -m egohmr_tpu.train.train_prohmr --synthetic --num_steps 20
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ProHMR-scene (stage 1) training")
    b = lambda x: str(x).lower() in ["true", "1"]
    p.add_argument("--save_dir", type=str, default="runs_prohmr")
    p.add_argument("--dataset_root", type=str, default="/mnt/ssd/egobody_release")
    p.add_argument("--dataset_file_train", type=str, default="")
    p.add_argument("--cmu_mocap_file", type=str, default="data/datasets/cmu_mocap.npz")
    p.add_argument("--smpl_model_path", type=str, default="data/smpl")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--log_step", type=int, default=1000)
    p.add_argument("--save_step", type=int, default=2000)
    p.add_argument("--resume", type=b, default=True)
    p.add_argument("--data_parallel", type=b, default=True)
    p.add_argument("--scene_cano", type=b, default=False,
                   help="reference train_prohmr_scene.py uses whole-scene "
                        "inputs without canonicalization by default")
    p.add_argument("--scene_type", type=str, default="whole_scene")
    p.add_argument("--with_focal_length", type=b, default=True)
    p.add_argument("--with_cam_center", type=b, default=True)
    p.add_argument("--with_bbox_info", type=b, default=True)
    p.add_argument("--with_full_2d_loss", type=b, default=True)
    p.add_argument("--with_global_3d_loss", type=b, default=True)
    p.add_argument("--add_bbox_scale", type=float, default=1.2)
    p.add_argument("--do_augment", type=b, default=True)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
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
    import optax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ..data.synthetic import synthetic_batch
    from ..models.discriminator import init_discriminator
    from ..models.prohmr import (
        ProHMRConfig,
        ProHMRLossWeights,
        init_prohmr,
        initialize,
    )
    from ..parallel import make_mesh, replicate, shard_batch
    from ..smpl import create as smpl_create, make_synthetic_model
    from ..utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from ..utils.logging import MetricsWriter, get_logger, save_config
    from .prohmr_loop import make_prohmr_train_step

    os.makedirs(args.save_dir, exist_ok=True)
    logger = get_logger(args.save_dir, "prohmr")
    save_config(args.save_dir, vars(args))

    cfg = ProHMRConfig(
        with_focal_length=args.with_focal_length,
        with_cam_center=args.with_cam_center,
        with_bbox_info=args.with_bbox_info,
    )
    weights = ProHMRLossWeights(
        with_full_2d_loss=args.with_full_2d_loss,
        with_global_3d_loss=args.with_global_3d_loss,
    )

    rng_np = np.random.RandomState(args.seed)
    if args.synthetic:
        smpl_n = smpl_m = smpl_f = make_synthetic_model(num_vertices=6890)

        def batches():
            i = 0
            while True:
                yield synthetic_batch(args.batch_size, seed=i)
                i += 1

        def mocap_batches():
            while True:
                yield {
                    "body_pose": jnp.asarray(
                        rng_np.randn(args.batch_size, 69).astype(np.float32) * 0.3),
                    "betas": jnp.asarray(
                        rng_np.randn(args.batch_size, 10).astype(np.float32) * 0.5),
                }

    else:
        from ..data.egobody import (
            EgoBodyDataset,
            MoCapDataset,
            finalize_batch,
            to_device_batch,
        )

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
        mocap = MoCapDataset(args.cmu_mocap_file)

        def _raw_batches():
            epoch = 0
            while True:
                for bt in ds.iter_batches(args.batch_size, seed=epoch):
                    bt = finalize_batch(bt, smpl_m, smpl_f)
                    yield to_device_batch(bt)
                epoch += 1

        def batches():
            from ..data.prefetch import prefetch_to_device

            return prefetch_to_device(_raw_batches(), size=2,
                                      device_put=lambda x: x)

        def mocap_batches():
            while True:
                yield {k: jnp.asarray(v)
                       for k, v in mocap.sample(args.batch_size, rng_np).items()}

    batch_iter = batches()
    mocap_iter = mocap_batches()

    params = init_prohmr(jax.random.PRNGKey(args.seed), cfg)
    disc_params = init_discriminator(jax.random.PRNGKey(args.seed + 10))
    if args.load_imagenet_ckpt:
        # ImageNet warm start (reference resnet(cfg, pretrained=True),
        # models/resnet.py:152-255; zoo fc/avgpool keys dropped)
        from ..interop.torch_convert import convert_resnet, load_torch_checkpoint

        sd = load_torch_checkpoint(args.load_imagenet_ckpt)
        params["backbone"] = convert_resnet(sd, prefix="")
        logger.info("warm-started backbone from ImageNet ckpt %s",
                    args.load_imagenet_ckpt)

    # ActNorm data-dependent init on the first batch
    # (replaces reference prohmr_scene.py:82-97's lazy buffer)
    first = next(batch_iter)
    params = initialize(params, cfg, first, scene_cano=args.scene_cano)

    opt = optax.adamw(args.lr, weight_decay=args.weight_decay)
    dopt = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = opt.init(params)
    dopt_state = dopt.init(disc_params)

    start_step = 0
    ckpt_dir = os.path.join(args.save_dir, "checkpoints")
    if args.resume:
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            state = restore_checkpoint(latest, {
                "params": params, "disc_params": disc_params,
                "opt_state": opt_state, "disc_opt_state": dopt_state,
                "step": 0})
            params = state["params"]
            disc_params = state["disc_params"]
            opt_state = state["opt_state"]
            dopt_state = state["disc_opt_state"]
            start_step = int(state["step"]) + 1
            logger.info("resumed from %s at step %d", latest, start_step)

    mesh = make_mesh() if (args.data_parallel and len(jax.devices()) > 1) else None
    if mesh is not None:
        params, disc_params, opt_state, dopt_state = (
            replicate(mesh, t) for t in
            (params, disc_params, opt_state, dopt_state))

    step_fn = make_prohmr_train_step(
        cfg, weights, smpl_n, smpl_m, smpl_f, opt, dopt,
        scene_cano=args.scene_cano, mesh=mesh)

    writer = MetricsWriter(args.save_dir)
    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for step in range(start_step, args.num_steps):
        batch = next(batch_iter)
        mocap_batch = next(mocap_iter)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
            mocap_batch = shard_batch(mesh, mocap_batch)
        key, sub = jax.random.split(key)
        params, disc_params, opt_state, dopt_state, metrics = step_fn(
            params, disc_params, opt_state, dopt_state, batch, mocap_batch, sub)
        if step % args.log_step == 0 or step == args.num_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            writer.write(step, m)
            logger.info("step %d loss %.4f disc %.4f (%.2f s/step)", step,
                        m["loss"], m["loss_disc"],
                        (time.time() - t0) / max(step - start_step + 1, 1))
        if step % args.save_step == 0 and step > start_step:
            save_checkpoint(
                os.path.join(ckpt_dir, f"step_{step}"),
                {"params": jax.device_get(params),
                 "disc_params": jax.device_get(disc_params),
                 "opt_state": jax.device_get(opt_state),
                 "disc_opt_state": jax.device_get(dopt_state),
                 "step": step})
    writer.close()
    logger.info("done")


if __name__ == "__main__":
    main()

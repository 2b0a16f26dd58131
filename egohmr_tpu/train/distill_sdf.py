"""Distill the exact mesh SDF into the learned signed-distance net.

The VolumetricSMPL-family counterpart of `distill_occupancy`: the reference
volsmpl variant attaches pretrained VolumetricSMPL (reference
models/egohmr/egohmr_volsmpl.py:134-135), whose weights are distributed
out-of-band — this CLI produces 'pretrained' collision weights in-framework
instead. The artifact is consumed by the eval CLI via
`--collision_backend volsdf --sdfnet_ckpt <path>` for both the collision
metric (sdf<0, egohmr_volsmpl.py:575) and guided sampling (:583-626).

Usage:
  python -m egohmr_tpu.train.distill_sdf --synthetic_watertight \
      --steps 6000 --save_path artifacts/volsdf_synthetic.npz
  python -m egohmr_tpu.train.distill_sdf \
      --smpl_model_path data/smpl --save_path artifacts/volsdf_neutral.npz
"""
from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Distill mesh SDF -> learned signed-distance net "
                    "(volsdf collision backend)")
    p.add_argument("--save_path", type=str, default="artifacts/volsdf.npz")
    p.add_argument("--smpl_model_path", type=str, default="data/smpl")
    p.add_argument("--gender", type=str, default="neutral")
    p.add_argument("--synthetic", action="store_true",
                   help="distill against the synthetic SMPL body (no SMPL "
                        ".pkl release needed; used for CI artifacts)")
    p.add_argument("--synthetic_watertight", action="store_true",
                   help="use the WATERTIGHT synthetic body — the in-image "
                        "target for signed labels (winding-number ground "
                        "truth is exact on it)")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch_bodies", type=int, default=8)
    p.add_argument("--points_per_body", type=int, default=1024)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--latent_dim", type=int, default=64)
    p.add_argument("--hidden_dim", type=int, default=192)
    p.add_argument("--num_layers", type=int, default=5)
    p.add_argument("--part_embed_dim", type=int, default=32)
    p.add_argument("--trunc", type=float, default=0.15,
                   help="SDF truncation radius in meters (DeepSDF-style)")
    p.add_argument("--label_mode", type=str, default="winding",
                   choices=["signed", "winding"],
                   help="'winding': exact generalized-winding-number sign "
                        "(ground truth on a watertight body); 'signed': "
                        "normal-vote sign")
    p.add_argument("--sign_k", type=int, default=4)
    p.add_argument("--agreement_bar", type=float, default=0.95,
                   help="required held-out inside/outside SIGN agreement "
                        "vs the exact mesh SDF (same bar as the occupancy "
                        "family's)")
    p.add_argument("--eval_bodies", type=int, default=16)
    p.add_argument("--eval_points_per_body", type=int, default=1024)
    p.add_argument("--log_every", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX platform (e.g. 'cpu'); needed because "
                        "the axon sitecustomize overrides JAX_PLATFORMS")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ..collision.neural_sdf import SDFNetConfig, distill_sdf, sdf_agreement
    from ..smpl import (
        create as smpl_create,
        make_synthetic_model,
        make_synthetic_watertight_model,
    )
    from ..utils.checkpoint import save_npz

    if args.synthetic_watertight:
        model = make_synthetic_watertight_model()
        body = "synthetic_watertight"
    elif args.synthetic:
        model = make_synthetic_model(num_vertices=6890)
        body = "synthetic"
    else:
        model = smpl_create(args.smpl_model_path, args.gender)
        body = args.gender

    cfg = SDFNetConfig(latent_dim=args.latent_dim,
                       hidden_dim=args.hidden_dim,
                       num_layers=args.num_layers,
                       part_embed_dim=args.part_embed_dim,
                       trunc=args.trunc)
    key = jax.random.PRNGKey(args.seed)
    k_train, k_eval = jax.random.split(key)

    params = distill_sdf(
        k_train, model, cfg,
        steps=args.steps, batch_bodies=args.batch_bodies,
        points_per_body=args.points_per_body, lr=args.lr,
        label_mode=args.label_mode, sign_k=args.sign_k,
        log_every=args.log_every,
    )

    # held-out quality vs the exact mesh SDF on fresh poses/points: the
    # bar applies to SIGN agreement under the TRAINED label mode; value
    # MAEs ride along so the artifact's field quality is on record too
    quality = sdf_agreement(
        params, cfg, model, k_eval,
        n_bodies=args.eval_bodies,
        points_per_body=args.eval_points_per_body,
        label_mode=args.label_mode, sign_k=args.sign_k,
    )
    acc = quality["sign_agreement"]
    passed = acc >= args.agreement_bar

    save_path = args.save_path
    if not save_path.endswith(".npz"):
        # np.savez appends ".npz" silently — normalize up front so the
        # ".json" meta sidecar lands next to the actual artifact file
        save_path += ".npz"
    if not passed:
        # never clobber a shipped/passing artifact with one that missed
        # the bar — divert to a .failed sidecar the user can inspect
        save_path += ".failed.npz"
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    save_npz(save_path, params)
    meta = {
        "sign_agreement": acc,
        "mae_truncated_m": quality["mae_truncated_m"],
        "mae_near_surface_m": quality["mae_near_surface_m"],
        "agreement_bar": args.agreement_bar,
        "passed": bool(passed),
        "body": body,
        "label_mode": args.label_mode,
        "sign_k": args.sign_k,
        "steps": args.steps,
        "sdf_config": {"latent_dim": cfg.latent_dim,
                       "hidden_dim": cfg.hidden_dim,
                       "num_layers": cfg.num_layers,
                       "part_embed_dim": cfg.part_embed_dim,
                       "trunc": cfg.trunc},
    }
    with open(save_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))
    if not passed:
        print(f"WARNING: sign agreement {acc:.4f} below bar "
              f"{args.agreement_bar}")
    return meta


if __name__ == "__main__":
    main()

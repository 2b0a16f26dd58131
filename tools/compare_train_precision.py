"""Convergence evidence for mixed-precision (bf16) training.

Runs N full-size training steps twice — exact-parity f32 and
TrainConfig.mixed_precision bf16 — from the SAME init, on the SAME batch
sequence and RNG keys, and compares the loss trajectories. Complements the
per-step numerics tests (grad cosine > 0.99, BN-stats parity,
tests/test_train_infra.py) with multi-step optimization evidence on the
real chip.

Config matches the recorded bench (`bench.py --train`): batch 16, 20k scene
points, collision loss ON, full-size model, synthetic SMPL — so both step
programs hit the warm compile cache.

Usage: python tools/compare_train_precision.py [--steps N] [--quick]
Prints a JSON summary line; exits nonzero if the smoothed curves diverge
by more than --tol (default 5%) over the last quarter of training.
"""
import argparse
import json
import os
import sys
import time

# runnable as `python tools/compare_train_precision.py` from the repo root
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def run(steps: int, mixed_precision: bool, quick: bool):
    import jax
    import jax.numpy as jnp

    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import make_schedule
    from egohmr_tpu.models import (
        BodyRepStats,
        EgoHMRConfig,
        LossWeights,
        init_egohmr,
    )
    from egohmr_tpu.smpl import make_synthetic_model
    from egohmr_tpu.train.loop import TrainConfig, make_optimizer, make_train_step

    if quick:
        cfg = EgoHMRConfig(
            img_feat_dim=128, backbone_type="stub", scene_feat_dim=64,
            pointnet_hidden_dim=32, transl_embed_dim=32,
            timestep_embed_dim=64, input_process_dim=64, gcn_hid_dim=128,
            gcn_layers=2,
        )
        B, P, V = 4, 2048, 512
    else:
        cfg = EgoHMRConfig()
        B, P, V = 16, 20000, 6890
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=V)
    schedule = make_schedule(50, "cosine", "")
    tcfg = TrainConfig(use_collision_loss=True, mixed_precision=mixed_precision)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, tcfg, LossWeights(), schedule, stats,
                           smpl, smpl, smpl, optimizer, mesh=None)

    # 8 distinct synthetic batches cycled — same sequence for both runs
    batches = [synthetic_batch(B, num_scene_points=P, seed=s) for s in range(8)]

    losses = []
    t0 = time.time()
    for i in range(steps):
        params, opt_state, metrics = step(
            params, opt_state, batches[i % len(batches)], jax.random.PRNGKey(i))
        losses.append(metrics["loss"])  # device scalar — no sync per step
    out = [float(x) for x in jax.device_get(jnp.stack(losses))]
    dt = time.time() - t0
    tag = "bf16_mixed" if mixed_precision else "f32"
    print(f"# {tag}: {steps} steps in {dt:.1f}s "
          f"(loss {out[0]:.3f} -> {out[-1]:.3f})", file=sys.stderr)
    return out


def smooth(xs, w=25):
    return [sum(xs[max(0, i - w + 1):i + 1]) / len(xs[max(0, i - w + 1):i + 1])
            for i in range(len(xs))]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--tol", type=float, default=0.05,
                    help="max allowed mean |rel diff| of the smoothed loss "
                         "curves over the last quarter of training")
    ap.add_argument("--quick", action="store_true",
                    help="stub model (CPU-friendly smoke)")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    l32 = run(args.steps, mixed_precision=False, quick=args.quick)
    l16 = run(args.steps, mixed_precision=True, quick=args.quick)

    s32, s16 = smooth(l32), smooth(l16)
    q = args.steps * 3 // 4
    tail_rel = [abs(a - b) / max(abs(a), 1e-9)
                for a, b in zip(s32[q:], s16[q:])]
    mean_tail_rel = sum(tail_rel) / len(tail_rel)
    summary = {
        "steps": args.steps,
        "f32_first_last": [round(l32[0], 4), round(l32[-1], 4)],
        "bf16_first_last": [round(l16[0], 4), round(l16[-1], 4)],
        "smoothed_final_f32": round(s32[-1], 4),
        "smoothed_final_bf16": round(s16[-1], 4),
        "mean_tail_rel_diff": round(mean_tail_rel, 5),
        "tol": args.tol,
        "ok": mean_tail_rel <= args.tol,
    }
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

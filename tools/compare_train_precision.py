"""Convergence evidence for mixed-precision (bf16) training.

Runs N full-size training steps twice — exact-parity f32 and
TrainConfig.mixed_precision bf16 — from the SAME init, on the SAME batch
sequence and RNG keys, and compares:

  * the per-step training-loss trajectories (smoothed tail rel-diff), and
  * the reference's model-selection metric `loss_keypoints_3d_vis`
    (egohmr.py:357-372, train_egohmr.py:215-223), probed every
    --eval_every steps by a DDIM-5 sampling pass (the same val path
    train_egohmr.py:190-192 uses) on (a) a TRAINING batch — on synthetic
    random data this is the learnable signal (memorization quality), so
    it is what gates the result — and (b) a held-out batch, which on
    synthetic data is CHANCE-LEVEL (the img->pose mapping is random, so
    held-out error cannot improve; its curve is flat) and is reported
    with a multi-key sampling-noise spread for context rather than gated.

Complements the per-step numerics tests (grad cosine > 0.99, BN-stats
parity, tests/test_train_infra.py) with multi-step optimization evidence
on the real chip. The full overlay is PERSISTED as a JSON artifact
(--out, default artifacts/train_precision_overlay.json) so the evidence
behind the bf16-by-default decision is committed, not prose.

Config matches the recorded bench (`bench.py --train`): batch 16, 20k scene
points, collision loss ON, full-size model, synthetic SMPL — so both step
programs hit the warm compile cache.

Usage: python tools/compare_train_precision.py [--steps N] [--quick]
Prints a JSON summary line; exits nonzero if the smoothed train-loss
curves diverge by more than --tol (default 5%) over the last quarter of
training, or the final val metrics diverge by more than --val_tol.
"""
import argparse
import json
import os
import subprocess
import sys
import time

# runnable as `python tools/compare_train_precision.py` from the repo root
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


# (batch, scene_points, vertices) per mode — single source of truth for
# both the runs and the persisted artifact's config block
_DIMS = {"quick": (4, 2048, 512), "full": (16, 20000, 6890)}


def _build(quick: bool):
    """Shared model/config construction for both precision runs."""
    import jax
    import jax.numpy as jnp

    from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, init_egohmr
    from egohmr_tpu.smpl import make_synthetic_model

    B, P, V = _DIMS["quick" if quick else "full"]
    if quick:
        cfg = EgoHMRConfig(
            img_feat_dim=128, backbone_type="stub", scene_feat_dim=64,
            pointnet_hidden_dim=32, transl_embed_dim=32,
            timestep_embed_dim=64, input_process_dim=64, gcn_hid_dim=128,
            gcn_layers=2,
        )
    else:
        cfg = EgoHMRConfig()
    params0 = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=V)
    return cfg, params0, stats, smpl, B, P


def make_val_fn(cfg, stats, smpl):
    """Jitted val probe: DDIM-5 sample on a batch -> loss_keypoints_3d_vis
    (per-joint mean, meters) — the reference's best-model metric."""
    import jax

    from egohmr_tpu.diffusion import make_schedule
    from egohmr_tpu.eval.pipeline import sample_bodies
    from egohmr_tpu.models import LossWeights, compute_loss

    schedule_eval = make_schedule(50, "cosine", "ddim5")

    @jax.jit
    def val_metric(params, batch, key):
        out, cond = sample_bodies(
            params, cfg, smpl, stats, schedule_eval, batch, key, 1,
            sampler="ddim", with_guidance=False, bf16=False)
        out1 = {k: v[:, 0] for k, v in out.items()}
        _, losses = compute_loss(
            cfg, LossWeights(), smpl, smpl, smpl, batch, cond, out1,
            train=False, use_collision=False)
        return (losses["loss_keypoints_3d_vis_batch_sum"]
                / losses["joint_vis_num_batch"])

    return val_metric


def run(built, val_fn, steps: int, mixed_precision: bool, quick: bool,
        eval_every: int):
    """One precision run. `built` (from _build) and `val_fn` are shared by
    BOTH runs — the val probe is one jit instance, so the second run reuses
    the first's in-process executable instead of reloading it through the
    axon tunnel (~10 min even on a disk-cache hit, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import make_schedule
    from egohmr_tpu.models import LossWeights
    from egohmr_tpu.train.loop import TrainConfig, make_optimizer, make_train_step

    cfg, params, stats, smpl, B, P = built
    schedule = make_schedule(50, "cosine", "")
    tcfg = TrainConfig(use_collision_loss=True, mixed_precision=mixed_precision)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, tcfg, LossWeights(), schedule, stats,
                           smpl, smpl, smpl, optimizer, mesh=None)

    # 8 distinct synthetic batches cycled — same sequence for both runs —
    # plus a held-out val batch never trained on
    batches = [synthetic_batch(B, num_scene_points=P, seed=s) for s in range(8)]
    val_batch = synthetic_batch(B, num_scene_points=P, seed=999)

    losses, val_steps, val_train, val_held = [], [], [], []
    t0 = time.time()
    for i in range(steps):
        params, opt_state, metrics = step(
            params, opt_state, batches[i % len(batches)], jax.random.PRNGKey(i))
        losses.append(metrics["loss"])  # device scalar — no sync per step
        if eval_every and ((i + 1) % eval_every == 0 or i == steps - 1):
            # val probe always runs the f32 eval program on the (f32 master)
            # params — identical program for both precision runs
            val_steps.append(i + 1)
            val_train.append(val_fn(params, batches[0], jax.random.PRNGKey(7)))
            val_held.append(val_fn(params, val_batch, jax.random.PRNGKey(7)))
    # sampling-noise spread of the final model: 4 sampling keys per batch
    # (skipped when --eval_every 0 disables the val probe — the probe
    # program would otherwise still have to compile just for the spread)
    spread_train, spread_held = [], []
    if eval_every:
        spread_train = [val_fn(params, batches[0], jax.random.PRNGKey(100 + j))
                        for j in range(4)]
        spread_held = [val_fn(params, val_batch, jax.random.PRNGKey(100 + j))
                       for j in range(4)]
    out = [float(x) for x in jax.device_get(jnp.stack(losses))]
    vt = [float(x) for x in jax.device_get(jnp.stack(val_train))] \
        if val_train else []
    vh = [float(x) for x in jax.device_get(jnp.stack(val_held))] \
        if val_held else []
    st = [float(x) for x in jax.device_get(jnp.stack(spread_train))] \
        if spread_train else []
    sh = [float(x) for x in jax.device_get(jnp.stack(spread_held))] \
        if spread_held else []
    dt = time.time() - t0
    tag = "bf16_mixed" if mixed_precision else "f32"
    msg = f"# {tag}: {steps} steps in {dt:.1f}s " \
          f"(loss {out[0]:.3f} -> {out[-1]:.3f}"
    if vt:
        msg += (f"; kp3d_vis train {vt[-1]*1000:.1f} mm, "
                f"held-out {vh[-1]*1000:.1f} mm)")
    else:
        msg += ")"
    print(msg, file=sys.stderr)
    return out, val_steps, vt, vh, st, sh, dt


def smooth(xs, w=25):
    return [sum(xs[max(0, i - w + 1):i + 1]) / len(xs[max(0, i - w + 1):i + 1])
            for i in range(len(xs))]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval_every", type=int, default=250,
                    help="probe loss_keypoints_3d_vis (ddim5 sampling on a "
                         "held-out batch) every N steps; 0 disables")
    ap.add_argument("--tol", type=float, default=0.05,
                    help="max allowed mean |rel diff| of the smoothed loss "
                         "curves over the last quarter of training")
    ap.add_argument("--val_tol", type=float, default=0.05,
                    help="max allowed |rel diff| of the final "
                         "loss_keypoints_3d_vis metric on the TRAIN batch "
                         "(the learnable signal on synthetic data)")
    ap.add_argument("--quick", action="store_true",
                    help="stub model (CPU-friendly smoke)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (axon's sitecustomize "
                         "ignores JAX_PLATFORMS; this uses jax.config)")
    ap.add_argument("--out", default=os.path.join(
        _REPO, "artifacts", "train_precision_overlay.json"),
        help="persist the full overlay (curves + val series) here; "
             "'' disables")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    built = _build(args.quick)
    # built once, shared: the val probe is only constructed when it will
    # actually run, and the one jit instance serves both precision runs
    val_fn = (make_val_fn(built[0], built[2], built[3])
              if args.eval_every else None)
    l32, vs32, vt32, vh32, st32, sh32, dt32 = run(
        built, val_fn, args.steps, False, args.quick, args.eval_every)
    l16, vs16, vt16, vh16, st16, sh16, dt16 = run(
        built, val_fn, args.steps, True, args.quick, args.eval_every)

    s32, s16 = smooth(l32), smooth(l16)
    q = args.steps * 3 // 4
    tail_rel = [abs(a - b) / max(abs(a), 1e-9)
                for a, b in zip(s32[q:], s16[q:])]
    mean_tail_rel = sum(tail_rel) / len(tail_rel)
    val_rel = (abs(vt32[-1] - vt16[-1]) / max(abs(vt32[-1]), 1e-9)
               if vt32 and vt16 else None)
    held_rel = (abs(vh32[-1] - vh16[-1]) / max(abs(vh32[-1]), 1e-9)
                if vh32 and vh16 else None)

    def _stats(xs):
        m = sum(xs) / len(xs)
        sd = (sum((x - m) ** 2 for x in xs) / len(xs)) ** 0.5
        return {"mean": round(m, 6), "std": round(sd, 6)}

    summary = {
        "steps": args.steps,
        "f32_first_last": [round(l32[0], 4), round(l32[-1], 4)],
        "bf16_first_last": [round(l16[0], 4), round(l16[-1], 4)],
        "smoothed_final_f32": round(s32[-1], 4),
        "smoothed_final_bf16": round(s16[-1], 4),
        "mean_tail_rel_diff": round(mean_tail_rel, 5),
        "val_kp3d_vis_train_final_f32": round(vt32[-1], 6) if vt32 else None,
        "val_kp3d_vis_train_final_bf16": round(vt16[-1], 6) if vt16 else None,
        "val_train_rel_diff": round(val_rel, 5) if val_rel is not None
        else None,
        # held-out: CHANCE-LEVEL on synthetic data (img->pose is random) —
        # reported with sampling-noise spread for context, NOT gated
        "val_kp3d_vis_heldout_final_f32": round(vh32[-1], 6) if vh32 else None,
        "val_kp3d_vis_heldout_final_bf16": round(vh16[-1], 6) if vh16
        else None,
        "heldout_rel_diff": round(held_rel, 5) if held_rel is not None
        else None,
        "heldout_sampling_spread_f32": _stats(sh32) if sh32 else None,
        "heldout_sampling_spread_bf16": _stats(sh16) if sh16 else None,
        "tol": args.tol,
        "val_tol": args.val_tol,
        "ok": mean_tail_rel <= args.tol and (
            val_rel is None or val_rel <= args.val_tol),
    }
    if args.out:
        try:
            rev = subprocess.run(
                ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True).stdout.strip()
        except OSError:
            rev = "unknown"
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({
                "summary": summary,
                "config": {
                    "quick": args.quick, "eval_every": args.eval_every,
                    "batch": _DIMS["quick" if args.quick else "full"][0],
                    "scene_points":
                        _DIMS["quick" if args.quick else "full"][1],
                    "collision_loss": True,
                    "device": jax.devices()[0].platform,
                    "git_rev": rev,
                    "wall_s": {"f32": round(dt32, 1),
                               "bf16": round(dt16, 1)},
                },
                "train_loss": {"f32": [round(x, 5) for x in l32],
                               "bf16": [round(x, 5) for x in l16]},
                "val_kp3d_vis_train_batch": {
                    "steps": vs32,
                    "f32": [round(x, 6) for x in vt32],
                    "bf16": [round(x, 6) for x in vt16]},
                "val_kp3d_vis_heldout": {
                    "steps": vs32,
                    "f32": [round(x, 6) for x in vh32],
                    "bf16": [round(x, 6) for x in vh16],
                    "note": "chance-level on synthetic data (the img->pose "
                            "mapping is random noise, so held-out error "
                            "cannot improve with training; curves are flat)"},
                "final_sampling_spread": {
                    "train_f32": [round(x, 6) for x in st32],
                    "train_bf16": [round(x, 6) for x in st16],
                    "heldout_f32": [round(x, 6) for x in sh32],
                    "heldout_bf16": [round(x, 6) for x in sh16]},
            }, f)
        print(f"# overlay persisted to {args.out}", file=sys.stderr)
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

"""Bounded round-5 experiment: decompose the guided-DDPM floor gap.

Round 4 left guided DDPM-50 B=16 with selection-reuse refresh=3 at 519
bodies/s against a ~590/s predicted floor (BASELINE.md round-4), attributing
the residual to the selective-re-pose BACKWARD — identified but never
measured in isolation (round-4 verdict Weak #4 / Next #7).

This probe times the EXACT production guided program against the same
program with `guidance_grad_mode="forward-only"` (models.egohmr
make_guidance_fn: the differentiable selective pass runs forward, its
backward is elided, the applied guidance is numerically nil) — the
difference IS the backward's end-to-end cost, measured inside the real
scan rather than summed from isolated sub-timings. Both run through
eval.pipeline.sample_bodies with the bench methodology (chained dispatch,
scalar-download completion fence, chain differencing).

Modes (each its own compiled program):
  exact-r3    guided DDPM-50, refresh=3 (the 519/s number of record)
  fwd-r3      same, forward-only gradient -> the zero-backward floor
  exact-r1 / fwd-r1 (--all): the refresh=1 default, same split

Result — closure or irreducibility — goes to BASELINE.md round-5.
"""
import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--all", action="store_true",
                    help="also measure the refresh=1 pair")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="tiny config smoke (CPU)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import _chain_throughput
    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import GuidanceConfig, make_schedule
    from egohmr_tpu.eval.pipeline import sample_bodies
    from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, init_egohmr
    from egohmr_tpu.smpl import make_synthetic_model

    if args.quick:
        cfg = EgoHMRConfig(
            img_feat_dim=128, backbone_type="stub", scene_feat_dim=64,
            pointnet_hidden_dim=32, transl_embed_dim=32,
            timestep_embed_dim=64, input_process_dim=64, gcn_hid_dim=128,
            gcn_layers=2)
        B, P, V = 4, 2048, 512
    else:
        cfg = EgoHMRConfig()
        B, P, V = args.batch, 20000, 6890
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=V)
    schedule = make_schedule(50, "cosine", "")
    batch = synthetic_batch(B, num_scene_points=P)
    gcfg = GuidanceConfig(cond_grad_weight=2.0)

    def run(refresh, grad_mode):
        def guided(params, batch, key):
            outs, _ = sample_bodies(
                params, cfg, smpl, stats, schedule, batch, key, 1,
                sampler="ddpm", with_guidance=True, guidance=gcfg,
                bf16=True, guidance_refresh_every=refresh,
                guidance_grad_mode=grad_mode)
            return outs["pred_keypoints_3d"]

        jf = jax.jit(guided)
        dt, _, compile_s = _chain_throughput(
            lambda i: jf(params, batch, jax.random.PRNGKey(i)), args.iters)
        name = f"{'fwd' if grad_mode != 'exact' else 'exact'}-r{refresh}"
        print(f"# {name}: {dt*1e3:.2f} ms/batch -> {B/dt:.1f} bodies/s "
              f"(compile {compile_s:.1f}s)", file=sys.stderr)
        return {"ms_per_batch": round(dt * 1e3, 2),
                "bodies_per_s": round(B / dt, 1)}

    results = {
        "exact-r3": run(3, "exact"),
        "fwd-r3": run(3, "forward-only"),
    }
    if args.all:
        results["exact-r1"] = run(1, "exact")
        results["fwd-r1"] = run(1, "forward-only")
    backward_cost_ms = round(results["exact-r3"]["ms_per_batch"]
                             - results["fwd-r3"]["ms_per_batch"], 2)
    print(json.dumps({
        "metric": "guided_ddpm50_backward_decomposition",
        "batch_size": B,
        "results": results,
        "backward_cost_ms_per_batch": backward_cost_ms,
        "note": "exact minus forward-only = end-to-end cost of the "
                "selective-re-pose backward across the 11 guided steps",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

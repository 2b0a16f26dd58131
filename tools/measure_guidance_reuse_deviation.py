"""End-to-end deviation of guided-step selection reuse (PARITY.md).

Runs the full-size stage-2 pipeline with collision guidance twice — exact
(selection recomputed every guided step; note this "exact" baseline
includes the round-4 fixed pre-permutation of the capped scoring points,
so where the per_step_points cap binds it differs from round-3 outputs by
tie-break — PARITY.md) and with selection reuse (refresh every N guided
steps) — on the SAME noise/keys, and reports the final-body deviation in
millimeters
(max/mean over vertices), plus the guidance's own effect size (guided vs
unguided) for scale. This is the quality half of the round-4 reuse lever;
the speed half is `bench.py --guided[-ddim] --guidance-refresh N`.

CPU-runnable (full model, small batch). Prints one JSON line.
"""
import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--refresh", type=str, default="2,4")
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import GuidanceConfig, make_schedule
    from egohmr_tpu.eval.pipeline import sample_bodies
    from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, init_egohmr
    from egohmr_tpu.smpl import make_synthetic_model

    cfg = EgoHMRConfig()
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=6890)
    batch = synthetic_batch(args.batch, num_scene_points=args.points)
    gcfg = GuidanceConfig(cond_grad_weight=2.0)
    key = jax.random.PRNGKey(7)

    def verts(sampler, respacing, with_guidance, refresh):
        schedule = make_schedule(50, "cosine", respacing)
        outs, _ = sample_bodies(
            params, cfg, smpl, stats, schedule, batch, key, 1,
            sampler=sampler, with_guidance=with_guidance, guidance=gcfg,
            bf16=True, guidance_refresh_every=refresh)
        return np.asarray(outs["pred_vertices"][:, 0])

    refreshes = [int(x) for x in args.refresh.split(",") if x]
    out = {}
    for mode, sampler, respacing in (("ddim5", "ddim", "ddim5"),
                                     ("ddpm50", "ddpm", "")):
        v_un = verts(sampler, respacing, False, 1)
        v_exact = verts(sampler, respacing, True, 1)
        effect = np.linalg.norm(v_exact - v_un, axis=-1)
        entry = {
            "guidance_effect_mm": {
                "max": round(float(effect.max() * 1000), 3),
                "mean": round(float(effect.mean() * 1000), 3)},
        }
        for r in refreshes:
            v_r = verts(sampler, respacing, True, r)
            dev = np.linalg.norm(v_r - v_exact, axis=-1)
            entry[f"reuse{r}_deviation_mm"] = {
                "max": round(float(dev.max() * 1000), 3),
                "mean": round(float(dev.mean() * 1000), 3)}
        out[mode] = entry
        print(f"# {mode}: effect max {entry['guidance_effect_mm']['max']} mm; "
              + "; ".join(
                  f"reuse{r} dev max {entry[f'reuse{r}_deviation_mm']['max']}"
                  f" mm" for r in refreshes), file=sys.stderr)

    print(json.dumps({"metric": "guidance_reuse_final_body_deviation",
                      "batch": args.batch, "scene_points": args.points,
                      "modes": out}))


if __name__ == "__main__":
    main()

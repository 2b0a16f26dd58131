"""Benchmark: DDIM-5 stage-2 body sampling throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no benchmark numbers (BASELINE.md), so
`vs_baseline` is measured on the SAME chip against a faithful
"reference-architecture" variant of our own model: the reference's
EgoHMR.forward reruns the ResNet50 backbone, the scene PointNet and all
conditioning heads on every denoising step (reference
models/egohmr/egohmr.py:173-237 called from the sampling loop,
diffusion/gaussian_diffusion.py:494-508), while this framework computes
conditioning once and scans only the GCN denoiser. Both variants are fully
jitted here, so the ratio isolates the architectural win (it understates the
reference's true cost, which also pays 50x Python dispatch + CUDA sync).

Usage: python bench.py [--batch-size N] [--iters K] [--quick]
"""
import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--quick", action="store_true",
                    help="small model + batch (smoke test)")
    ap.add_argument("--bf16", action="store_true",
                    help="run conditioning + denoiser in bfloat16 (MXU-native);"
                         " sampler math and SMPL stay float32")
    ap.add_argument("--pointnet", choices=["fused", "xla"], default="fused",
                    help="scene encoder: whole-network Pallas kernel (fused,"
                         " default) or plain XLA matmuls")
    ap.add_argument("--num-samples", type=int, default=1,
                    help="diverse samples per image (paper setting: 5); "
                         "conditioning is computed once per image and tiled")
    ap.add_argument("--skip-baseline", action="store_true",
                    help="skip the reference-architecture variant")
    ap.add_argument("--guided", action="store_true",
                    help="measure guided DDPM-50 (collision-score gradient "
                         "each low-noise step) at batch 16 instead of the "
                         "DDIM-5 headline")
    args = ap.parse_args()

    import jax

    # first TPU compile of the full pipeline is ~15 min through the remote
    # compiler; persist it so repeat bench runs start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.guided:
        return _guided_bench(args)

    import jax.numpy as jnp

    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import make_schedule, sample_loop
    from egohmr_tpu.models import (
        BodyRepStats,
        EgoHMRConfig,
        compute_condition,
        denoise_x0,
        init_egohmr,
        make_denoise_fn,
        model_outputs,
    )
    from egohmr_tpu.smpl import make_synthetic_model

    if args.quick:
        cfg = EgoHMRConfig(
            img_feat_dim=128, backbone_type="stub", scene_feat_dim=64,
            pointnet_hidden_dim=32, transl_embed_dim=32, timestep_embed_dim=64,
            input_process_dim=64, gcn_hid_dim=128, gcn_layers=2,
        )
        B, P, V, img = 8, 2048, 1024, 224
    else:
        # full ResNet50 / 2694-d context / 3718-d GCN
        cfg = EgoHMRConfig(pointnet_impl=args.pointnet)
        B, P, V, img = args.batch_size, 20000, 6890, 224

    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=V)
    schedule = make_schedule(50, "cosine", "ddim5")
    batch = synthetic_batch(B, num_scene_points=P, img_size=img)

    if args.bf16:
        # BN leaves stay f32 and fold into the activation dtype at eval
        # (nn.core.batchnorm) — activations stay bf16 end-to-end
        from egohmr_tpu.nn.core import cast_params_bf16

        nn_params = cast_params_bf16(params)
    else:
        nn_params = params

    S = args.num_samples
    NB = B * S  # bodies per pipeline run

    # ---------------- fused pipeline (ours): conditioning once, scan the GCN
    def fused(batch, key):
        if args.bf16:
            batch = dict(batch)
            batch["img"] = batch["img"].astype(jnp.bfloat16)
            # scene stays f32; compute_condition casts the encoder input
        cond, _ = compute_condition(nn_params, cfg, batch)
        if S > 1:  # tile per-image conditioning across the S diverse samples
            cond = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, S, axis=0), cond)
        if args.bf16:
            # sampler math stays f32; denoiser runs bf16
            raw = make_denoise_fn(nn_params, cfg, cond)
            denoise = lambda x, t: raw(x.astype(jnp.bfloat16), t).astype(
                jnp.float32)
            cond_f32 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if x.dtype == jnp.bfloat16 else x, cond)
        else:
            denoise = make_denoise_fn(nn_params, cfg, cond)
            cond_f32 = cond
        _, x0 = sample_loop(schedule, denoise, key, (NB, 144), sampler="ddim")
        return model_outputs(cfg, smpl, cond_f32, x0, stats)["pred_keypoints_3d"]

    # ------- reference-architecture variant: a Python loop over timesteps,
    # each step one dispatched graph that reruns the FULL conditioning
    # (exactly the reference's execution shape:
    # gaussian_diffusion.py:494-508 + egohmr.py:173-237 per step).
    from egohmr_tpu.diffusion.schedule import (
        predict_eps_from_xstart,
        q_posterior_mean,
    )

    @jax.jit
    def ref_step(batch, x, t_idx):
        cond, _ = compute_condition(params, cfg, batch)
        t = jnp.full((B,), t_idx, jnp.int32)
        x0, _ = denoise_x0(params, cfg, cond, x, schedule.timestep_map[t],
                           fuse=cfg.diffuse_fuse, train=False)
        eps = predict_eps_from_xstart(schedule, x, t, x0)
        ab_prev = schedule.alphas_cumprod_prev[t][:, None]
        x_prev = x0 * jnp.sqrt(ab_prev) + jnp.sqrt(1 - ab_prev) * eps
        return x_prev

    @jax.jit
    def ref_final(batch, x0):
        cond, _ = compute_condition(params, cfg, batch)
        return model_outputs(cfg, smpl, cond, x0, stats)["pred_keypoints_3d"]

    def ref_style(batch, key):
        x = jax.random.normal(key, (B, 144))
        for i in range(schedule.num_timesteps - 1, -1, -1):
            x = ref_step(batch, x, i)
        return ref_final(batch, x)

    def time_fn(fn, tag, jit=True, n_bodies=NB):
        """Returns (throughput samples/s, blocking p50 latency).

        Throughput is measured PIPELINED: all iterations are submitted
        back-to-back and synchronized once at the end, the steady-state
        serving pattern (JAX dispatch is async, so the host-side dispatch /
        tunnel round-trip overlaps device compute of the previous batch).
        Latency is the honest blocking p50 of a single batch.
        """
        jf = jax.jit(fn) if jit else fn
        t0 = time.time()
        jf(batch, jax.random.PRNGKey(0)).block_until_ready()
        compile_s = time.time() - t0
        times = []
        for i in range(args.iters):
            t0 = time.time()
            jf(batch, jax.random.PRNGKey(i + 1)).block_until_ready()
            times.append(time.time() - t0)
        lat = sorted(times)[len(times) // 2]  # median = honest p50
        n_pipe = max(3 * args.iters, 10)
        t0 = time.time()
        outs = [jf(batch, jax.random.PRNGKey(100 + i)) for i in range(n_pipe)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / n_pipe
        print(f"# {tag}: compile {compile_s:.1f}s, blocking p50 {lat*1e3:.1f}ms"
              f", pipelined {dt*1e3:.1f}ms/batch -> {n_bodies/dt:.1f} samples/s",
              file=sys.stderr)
        return n_bodies / dt, lat

    fused_sps, fused_dt = time_fn(fused, "fused")
    if args.skip_baseline or S > 1:
        ref_sps = None
    else:
        ref_sps, _ = time_fn(ref_style, "reference-architecture", jit=False,
                             n_bodies=B)

    # paper-setting supplemental number (5 diverse samples per image,
    # reference README.md:158-159): conditioning amortizes across samples
    paper_sps = None
    if not args.quick and S == 1:
        B5, S5 = 32, 5
        batch5 = synthetic_batch(B5, num_scene_points=P, img_size=img)

        def fused_paper(batch, key):
            # same dtype config as the headline `fused` (incl. --bf16)
            if args.bf16:
                batch = dict(batch)
                batch["img"] = batch["img"].astype(jnp.bfloat16)
            cond, _ = compute_condition(nn_params, cfg, batch)
            cond = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, S5, axis=0), cond)
            if args.bf16:
                raw = make_denoise_fn(nn_params, cfg, cond)
                denoise = lambda x, t: raw(
                    x.astype(jnp.bfloat16), t).astype(jnp.float32)
                cond_f32 = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32)
                    if x.dtype == jnp.bfloat16 else x, cond)
            else:
                denoise = make_denoise_fn(nn_params, cfg, cond)
                cond_f32 = cond
            _, x0 = sample_loop(schedule, denoise, key, (B5 * S5, 144),
                                sampler="ddim")
            return model_outputs(cfg, smpl, cond_f32, x0,
                                 stats)["pred_keypoints_3d"]

        jf = jax.jit(fused_paper)
        jf(batch5, jax.random.PRNGKey(0)).block_until_ready()
        n_pipe = max(3 * args.iters, 10)
        t0 = time.time()
        outs = [jf(batch5, jax.random.PRNGKey(i + 1)) for i in range(n_pipe)]
        jax.block_until_ready(outs)
        dt5 = (time.time() - t0) / n_pipe
        paper_sps = B5 * S5 / dt5
        print(f"# paper setting (32 imgs x 5 samples): pipelined "
              f"{dt5*1e3:.1f}ms/batch -> {paper_sps:.1f} samples/s",
              file=sys.stderr)

    result = {
        "metric": "ddim5_samples_per_sec_per_chip",
        "value": round(fused_sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(fused_sps / ref_sps, 2) if ref_sps else None,
        "extra": {
            "batch_size": B,
            "num_samples_per_image": S,
            "scene_points": P,
            "p50_latency_ms_per_batch": round(fused_dt * 1e3, 2),
            "throughput_mode": "pipelined (async dispatch, sync at end); "
                               "latency is blocking per-batch p50",
            "pointnet_impl": cfg.pointnet_impl,
            "baseline": "same model, reference architecture (conditioning "
                        "recomputed every denoise step), same chip, jitted",
            "paper_setting_samples_per_sec": (
                round(paper_sps, 2) if paper_sps else None),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def _guided_bench(args):
    """Guided DDPM-50 throughput (reference test_egohmr.py with
    --with_coap_grad: egohmr.py:517-605 + gaussian_diffusion.py:764-772)."""
    import jax
    import jax.numpy as jnp

    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import GuidanceConfig, make_schedule, sample_loop
    from egohmr_tpu.models import (
        BodyRepStats, EgoHMRConfig, compute_condition, init_egohmr,
        make_guidance_fn, make_denoise_fn, model_outputs,
    )
    from egohmr_tpu.smpl import make_synthetic_model

    if args.bf16:
        print("# --bf16 does not apply to --guided (guidance math is f32); "
              "ignoring", file=sys.stderr)
    if args.quick:
        cfg = EgoHMRConfig(
            img_feat_dim=128, backbone_type="stub", scene_feat_dim=64,
            pointnet_hidden_dim=32, transl_embed_dim=32,
            timestep_embed_dim=64, input_process_dim=64, gcn_hid_dim=128,
            gcn_layers=2,
        )
        B, P, V = 4, 2048, 512
    else:
        cfg = EgoHMRConfig(pointnet_impl=args.pointnet)
        B, P, V = (args.batch_size if args.batch_size != 64 else 16,
                   20000, 6890)
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=V)
    schedule = make_schedule(50, "cosine", "")  # full DDPM-50
    batch = synthetic_batch(B, num_scene_points=P)

    def guided(batch, key):
        cond, _ = compute_condition(params, cfg, batch)
        denoise = make_denoise_fn(params, cfg, cond)
        guide = make_guidance_fn(params, cfg, smpl, cond, stats)
        _, x0 = sample_loop(schedule, denoise, key, (B, 144), sampler="ddpm",
                            guidance_fn=guide,
                            guidance=GuidanceConfig(cond_grad_weight=2.0))
        return model_outputs(cfg, smpl, cond, x0, stats)["pred_keypoints_3d"]

    jf = jax.jit(guided)
    t0 = time.time()
    jax.block_until_ready(jf(batch, jax.random.PRNGKey(0)))
    compile_s = time.time() - t0
    lat = []
    for i in range(args.iters):
        t0 = time.time()
        jax.block_until_ready(jf(batch, jax.random.PRNGKey(i + 1)))
        lat.append(time.time() - t0)
    p50 = sorted(lat)[len(lat) // 2]
    n_pipe = max(2 * args.iters, 10)
    t0 = time.time()
    outs = [jf(batch, jax.random.PRNGKey(100 + i)) for i in range(n_pipe)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n_pipe
    print(f"# guided: compile {compile_s:.1f}s, blocking p50 {p50*1e3:.1f}ms, "
          f"pipelined {dt*1e3:.1f}ms/batch", file=sys.stderr)
    print(json.dumps({
        "metric": "guided_ddpm50_samples_per_sec_per_chip",
        "value": round(B / dt, 2),
        "unit": "samples/s",
        "vs_baseline": None,
        "extra": {
            "batch_size": B,
            "scene_points": P,
            "p50_latency_ms_per_batch": round(p50 * 1e3, 2),
            "cond_grad_weight": 2.0,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

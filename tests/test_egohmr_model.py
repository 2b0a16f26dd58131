"""End-to-end stage-2 model tests: condition -> scan sampler -> outputs -> loss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egohmr_tpu.data.synthetic import synthetic_batch
from egohmr_tpu.diffusion import GuidanceConfig, make_schedule, sample_loop
from egohmr_tpu.models import (
    BodyRepStats,
    EgoHMRConfig,
    LossWeights,
    compute_condition,
    compute_loss,
    init_egohmr,
    make_denoise_fn,
    make_guidance_fn,
    model_outputs,
)
from egohmr_tpu.smpl import make_synthetic_model

CFG = EgoHMRConfig(
    img_feat_dim=64,
    backbone_type="stub",
    scene_feat_dim=32,
    pointnet_hidden_dim=16,
    transl_embed_dim=16,
    timestep_embed_dim=32,
    input_process_dim=32,
    gcn_hid_dim=32,
    gcn_layers=2,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    cfg = CFG
    params = init_egohmr(key, cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=256)
    batch = synthetic_batch(2, num_scene_points=512, img_size=56)
    return cfg, params, stats, smpl, batch


def test_config_dims_match_reference():
    cfg = EgoHMRConfig()
    assert cfg.cam_feat_dim == 6
    assert cfg.context_feats_dim == 2048 + 512 + 128 + 6  # 2694
    assert cfg.gcn_in_dim == 2694 + 512 + 512  # 3718 (reference default)


def test_condition_shapes(setup):
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    B = 2
    assert cond.cond.shape == (B, 24, cfg.context_feats_dim)
    assert cond.cond_uncond.shape == cond.cond.shape
    assert cond.vis_mask_smpl.shape == (B, 24)
    assert cond.pred_betas.shape == (B, 10)
    # uncond zeroes exactly the image block
    np.testing.assert_allclose(
        np.asarray(cond.cond_uncond[:, :, : cfg.img_feat_dim]), 0.0
    )
    np.testing.assert_allclose(
        np.asarray(cond.cond_uncond[:, :, cfg.img_feat_dim:]),
        np.asarray(cond.cond[:, :, cfg.img_feat_dim:]),
    )


def test_vis_mask_gates_image_features(setup):
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    vis = np.asarray(cond.vis_mask_smpl)
    img_block = np.asarray(cond.cond[:, :, : cfg.img_feat_dim])
    for b in range(vis.shape[0]):
        for j in range(24):
            if not vis[b, j]:
                np.testing.assert_allclose(img_block[b, j], 0.0)


def test_full_sampling_pipeline(setup):
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    sched = make_schedule(50, "cosine", "ddim5")
    denoise = make_denoise_fn(params, cfg, cond)

    x, x0 = sample_loop(
        sched, denoise, jax.random.PRNGKey(1), (2, 144), sampler="ddim"
    )
    outputs = model_outputs(cfg, smpl, cond, x0, stats)
    assert outputs["pred_vertices"].shape == (2, 256, 3)
    assert outputs["pred_keypoints_3d"].shape == (2, 45, 3)
    assert outputs["pred_keypoints_2d_full"].shape == (2, 45, 2)
    assert np.isfinite(np.asarray(outputs["pred_keypoints_2d_full"])).all()


def test_guided_ddpm_pipeline(setup):
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    sched = make_schedule(10, "cosine", "")
    denoise = make_denoise_fn(params, cfg, cond)
    guide = make_guidance_fn(params, cfg, smpl, cond, stats, sdf_block_size=256)

    x, x0 = sample_loop(
        sched, denoise, jax.random.PRNGKey(1), (2, 144),
        sampler="ddpm", guidance_fn=guide, guidance=GuidanceConfig(),
    )
    assert np.isfinite(np.asarray(x0)).all()


def test_guidance_grad_zero_on_upper_body(setup):
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    guide = make_guidance_fn(params, cfg, smpl, cond, stats, sdf_block_size=256)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 144))
    g = np.asarray(guide(x, jnp.zeros((2,), jnp.int32))).reshape(2, 24, 6)
    upper = [0, 3, 6, 9, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23]
    np.testing.assert_allclose(g[:, upper], 0.0)


def test_guidance_grad_mode_forward_only(setup):
    """The profiling seam (tools/probe_guided_backward.py): forward-only
    mode must apply numerically-nil guidance (the 1e-24 DCE coupling) and
    be rejected for learned collision backends."""
    import pytest

    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    guide = make_guidance_fn(params, cfg, smpl, cond, stats,
                             sdf_block_size=256, grad_mode="forward-only")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 144))
    g = np.asarray(guide(x, jnp.zeros((2,), jnp.int32)))
    assert np.all(np.abs(g) < 1e-18), np.abs(g).max()

    with pytest.raises(ValueError, match="profiling seam"):
        from egohmr_tpu.eval.pipeline import sample_bodies

        sample_bodies(params, cfg, smpl, stats, make_schedule(10, "cosine", ""),
                      batch, jax.random.PRNGKey(0), 1, sampler="ddpm",
                      with_guidance=True, collision_backend="volsdf",
                      guidance_grad_mode="forward-only")


def test_training_loss_finite_and_differentiable(setup):
    cfg, params, stats, smpl, batch = setup
    weights = LossWeights()

    def loss_fn(p):
        rng = jax.random.PRNGKey(0)
        cond, _ = compute_condition(p, cfg, batch, train=True, rng=rng)
        from egohmr_tpu.models.egohmr import denoise_x0

        x_t = jax.random.normal(jax.random.PRNGKey(1), (2, 144))
        t = jnp.array([3, 40], jnp.int32)
        x0, _ = denoise_x0(p, cfg, cond, x_t, t, fuse=False, train=True)
        outputs = model_outputs(cfg, smpl, cond, x0, stats)
        total, losses = compute_loss(
            cfg, weights, smpl, smpl, smpl, batch, cond, outputs,
            train=True, use_collision=True,
        )
        return total

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least some gradient flows into the GCN and the backbone
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in
               jax.tree_util.tree_leaves(grads["diffusion_model"]))
    assert gsum > 0


def test_val_loss_has_vis_metric(setup):
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 144)) * 0.1
    outputs = model_outputs(cfg, smpl, cond, x0, stats)
    total, losses = compute_loss(
        EgoHMRConfig(**{**CFG.__dict__}), LossWeights(), smpl, smpl, smpl,
        batch, cond, outputs, train=False,
    )
    assert "loss_keypoints_3d_vis_batch_sum" in losses
    assert "joint_vis_num_batch" in losses


def test_hoisted_denoise_matches_denoise_x0(setup):
    """make_denoise_fn hoists the conditioning projection out of the loop;
    it must equal the unhoisted denoise_x0 to f32 reassociation tolerance,
    in both fuse modes."""
    from egohmr_tpu.models.egohmr import denoise_x0

    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    B = batch["img"].shape[0]
    x_t = jax.random.normal(jax.random.PRNGKey(3), (B, 144))
    t = jnp.array([7, 31], jnp.int32)
    for fuse in (True, False):
        ref, _ = denoise_x0(params, cfg, cond, x_t, t, fuse=fuse, train=False)
        got = make_denoise_fn(params, cfg, cond, fuse=fuse)(x_t, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_sample_bodies_bf16_close_to_f32(setup):
    """The bf16 inference path (cast params, bf16 conditioning/denoiser,
    f32 sampler+SMPL) yields finite outputs close to the f32 pipeline."""
    from egohmr_tpu.diffusion import make_schedule
    from egohmr_tpu.eval.pipeline import sample_bodies

    cfg, params, stats, smpl, batch = setup
    schedule = make_schedule(50, "cosine", "ddim5")
    key = jax.random.PRNGKey(11)
    out32, _ = sample_bodies(params, cfg, smpl, stats, schedule, batch, key,
                             2, sampler="ddim")
    out16, _ = sample_bodies(params, cfg, smpl, stats, schedule, batch, key,
                             2, sampler="ddim", bf16=True)
    a = np.asarray(out32["pred_keypoints_3d"])
    b = np.asarray(out16["pred_keypoints_3d"])
    assert b.dtype == np.float32 and np.isfinite(b).all()
    assert a.shape == b.shape
    # same seed, same sampler: the bodies should agree to bf16 tolerance
    assert np.mean(np.abs(a - b)) < 0.05


def test_bf16_path_runs_denoiser_in_bf16(setup):
    """Dtype regression guard: with cast params + a bf16 image, the WHOLE
    conditioning tensor and the denoiser run in bf16 — mixed-dtype concats
    (transl/cam feats) and the f32 adjacency constant must not silently
    promote everything back to f32 (found in round 3: the 'bf16' pipeline
    was running the GCN in f32 through exactly those promotions). The betas
    head deliberately stays f32."""
    from egohmr_tpu.nn.core import cast_params_bf16

    cfg, params, stats, smpl, batch = setup
    bparams = cast_params_bf16(params)
    b16 = dict(batch)
    b16["img"] = b16["img"].astype(jnp.bfloat16)
    cond, _ = compute_condition(bparams, cfg, b16)
    assert cond.cond.dtype == jnp.bfloat16
    assert cond.cond_uncond.dtype == jnp.bfloat16
    assert cond.scene_pcd.dtype == jnp.float32   # guidance/metrics input
    assert cond.pred_betas.dtype == jnp.float32  # full-precision head
    denoise = make_denoise_fn(bparams, cfg, cond)
    x = jnp.zeros((2, 144), jnp.bfloat16)
    t = jnp.zeros((2,), jnp.int32)
    out = denoise(x, t)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_cast_params_bf16_detects_bn_structurally():
    """BN dicts are recognized by their {scale, bias, mean, var} key set, not
    by the parent key containing 'bn' (round-2 advisor finding): a BN stored
    under any name keeps ALL four leaves f32, while a plain linear named
    'bias' still casts."""
    import jax.numpy as jnp

    from egohmr_tpu.nn.core import bn_init, cast_params_bf16, linear_init

    params = {
        "oddly_named_norm": bn_init(8),               # no 'bn' in the name
        "layers": [linear_init(jax.random.PRNGKey(0), 4, 8)],
        "head": {"w": jnp.zeros((8, 2)), "b": jnp.zeros((2,))},
    }
    cast = cast_params_bf16(params)
    for leaf in ("scale", "bias", "mean", "var"):
        assert cast["oddly_named_norm"][leaf].dtype == jnp.float32, leaf
    assert cast["layers"][0]["w"].dtype == jnp.bfloat16
    assert cast["layers"][0]["b"].dtype == jnp.bfloat16
    assert cast["head"]["b"].dtype == jnp.bfloat16


def test_guidance_per_step_cap_exact(setup):
    """The per-step bbox-ranked point cap must not change the guidance
    gradient at all when the bbox point count fits in K2 (the exactness
    contract of topk_scene_points_near_body): the loss only scores
    bbox-masked points, and every bbox point ranks before any outside one."""
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    g_full = make_guidance_fn(params, cfg, smpl, cond, stats,
                              sdf_block_size=256, per_step_points=None)
    g_cap = make_guidance_fn(params, cfg, smpl, cond, stats,
                             sdf_block_size=256, per_step_points=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 144)) * 0.3
    t = jnp.zeros((2,), jnp.int32)
    a = np.asarray(g_full(x, t))
    b = np.asarray(g_cap(x, t))
    # the synthetic scene is a sparse room shell: far fewer than 64 points
    # sit inside the posed body bbox, so the cap is exact (not just close)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_guidance_selective_backward_matches_straightforward(setup):
    """The scatter-free guidance (selective LBS re-pose of the nearest
    vertices) must produce the same gradient as differentiating the
    straightforward formulation (full LBS + signed_distance + mask), up to
    fp reassociation: the argmin index and the sign are piecewise-constant
    in x_t, so both define the same function almost everywhere."""
    from egohmr_tpu.collision import bbox_mask, collision_loss, signed_distance
    from egohmr_tpu.geometry import rot6d_to_rotmat
    from egohmr_tpu.smpl import lbs, vertex_normals

    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    guide = make_guidance_fn(params, cfg, smpl, cond, stats,
                             sdf_block_size=256, per_step_points=None,
                             max_scene_points=None)

    betas = jax.lax.stop_gradient(cond.pred_betas)
    scene = jax.lax.stop_gradient(cond.scene_pcd)
    from egohmr_tpu.models.egohmr import _GUIDE_JOINT_SCALE

    def straightforward(x_t):
        pose6d = x_t * stats.std + stats.mean
        rotmat = rot6d_to_rotmat(pose6d, "diffusion").reshape(-1, 24, 3, 3)
        out = lbs(smpl, betas, rotmat[:, :1], rotmat[:, 1:], pose2rot=False)
        normals = vertex_normals(out.vertices, smpl.faces)
        mask = bbox_mask(scene, jax.lax.stop_gradient(out.vertices))
        sdf = signed_distance(scene, out.vertices, normals, block_size=256)
        return -jnp.mean(collision_loss(sdf, mask.astype(sdf.dtype)))

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 144)) * 0.3
    want = np.asarray(jax.grad(straightforward)(x)).reshape(2, 24, 6)
    want = want * _GUIDE_JOINT_SCALE[None, :, None]
    got = np.asarray(guide(x, jnp.zeros((2,), jnp.int32))).reshape(2, 24, 6)
    np.testing.assert_allclose(got, want.reshape(2, 24, 6), rtol=1e-4,
                               atol=1e-6)


def test_guidance_stateful_plumbing_bit_exact(setup):
    """The sampler's stateful-guidance carry (state + guided-step counter)
    must not disturb anything else: a StatefulGuidanceFn that ignores its
    state and calls the plain guidance reproduces the plain run
    bit-for-bit (same RNG stream, same samples)."""
    from egohmr_tpu.diffusion.sampler import StatefulGuidanceFn

    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    sched = make_schedule(10, "cosine", "")
    denoise = make_denoise_fn(params, cfg, cond)
    exact = make_guidance_fn(params, cfg, smpl, cond, stats,
                             sdf_block_size=256)
    wrapped = StatefulGuidanceFn(
        init_state=lambda x: jnp.zeros(()),
        fn=lambda x, t, s, refresh: (exact(x, t), s),
        refresh_every=1,
    )
    kwargs = dict(sampler="ddpm", guidance=GuidanceConfig())
    x_a, _ = sample_loop(sched, denoise, jax.random.PRNGKey(1), (2, 144),
                         guidance_fn=exact, **kwargs)
    x_b, _ = sample_loop(sched, denoise, jax.random.PRNGKey(1), (2, 144),
                         guidance_fn=wrapped, **kwargs)
    np.testing.assert_array_equal(np.asarray(x_a), np.asarray(x_b))


def test_guidance_refresh_grad_matches_exact_on_refresh_step(setup):
    """On a refresh step the stateful guidance computes selection from the
    CURRENT x_t — its gradient must equal the plain (exact) guidance
    bit-for-bit (pure refactor of the same graph)."""
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    exact = make_guidance_fn(params, cfg, smpl, cond, stats,
                             sdf_block_size=256, per_step_points=64)
    stateful = make_guidance_fn(params, cfg, smpl, cond, stats,
                                sdf_block_size=256, per_step_points=64,
                                selection_refresh_every=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 144)) * 0.3
    t = jnp.zeros((2,), jnp.int32)
    state0 = stateful.init_state(x)
    g_ref, sel = stateful.fn(x, t, state0, jnp.asarray(True))
    g_exact = np.asarray(exact(x, t))
    np.testing.assert_array_equal(np.asarray(g_ref), g_exact)
    # and reusing the JUST-refreshed selection at the same x is also exact
    g_reuse, _ = stateful.fn(x, t, sel, jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(g_reuse), g_exact)


def test_guidance_selection_reuse_close_to_exact_sampling(setup):
    """Guided DDPM with selection reuse (refresh every 2 guided steps) must
    land near the exact guided run when guidance applies only to the
    LOW-NOISE tail (the real configuration: t<=10 of 50 DDPM / t<=3 DDIM)
    — there the body moves little between adjacent steps, so the stale
    selection's deviation stays below the guidance's own effect."""
    cfg, params, stats, smpl, batch = setup
    cond, _ = compute_condition(params, cfg, batch)
    sched = make_schedule(10, "cosine", "")
    denoise = make_denoise_fn(params, cfg, cond)
    exact = make_guidance_fn(params, cfg, smpl, cond, stats,
                             sdf_block_size=256)
    reuse = make_guidance_fn(params, cfg, smpl, cond, stats,
                             sdf_block_size=256, selection_refresh_every=2)
    # guide only the last 3 of 10 steps — proportionally the reference's
    # low-noise-tail regime (t<=10 of T=50)
    kwargs = dict(sampler="ddpm", guidance=GuidanceConfig(ddpm_threshold=2))
    key = jax.random.PRNGKey(1)
    x_un, _ = sample_loop(sched, denoise, key, (2, 144))
    x_ex, _ = sample_loop(sched, denoise, key, (2, 144),
                          guidance_fn=exact, **kwargs)
    x_re, _ = sample_loop(sched, denoise, key, (2, 144),
                          guidance_fn=reuse, **kwargs)
    effect = np.abs(np.asarray(x_ex) - np.asarray(x_un)).max()
    dev = np.abs(np.asarray(x_re) - np.asarray(x_ex)).max()
    assert effect > 0  # guidance actually did something in this setup
    assert dev <= effect + 1e-6, (dev, effect)

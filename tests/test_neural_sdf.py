"""Learned part-wise signed-distance field (VolumetricSMPL family):
query/loss sanity, distillation learns, guidance path, converter contract.

The real VolumetricSMPL release weights are absent from this image
(reference egohmr_volsmpl.py:134-135 attach_volume), so the converter is
pinned on FABRICATED state dicts, like tests/test_coap_convert.py."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egohmr_tpu.collision.neural_occupancy import NUM_PARTS
from egohmr_tpu.collision.neural_sdf import (
    SDFNetConfig,
    distill_sdf,
    init_sdfnet,
    sdf_collision_loss,
    sdf_query,
)
from egohmr_tpu.interop.volsmpl_convert import convert_volsmpl
from egohmr_tpu.smpl import (
    lbs,
    make_synthetic_model,
    make_synthetic_watertight_model,
)

TINY_EGOHMR = dict(
    img_feat_dim=32, backbone_type="stub", scene_feat_dim=16,
    pointnet_hidden_dim=8, transl_embed_dim=8, timestep_embed_dim=16,
    input_process_dim=16, gcn_hid_dim=16, gcn_layers=1)


def test_query_shapes_and_truncation_bound(rng):
    model = make_synthetic_model(num_vertices=128)
    cfg = SDFNetConfig(latent_dim=16, hidden_dim=32, num_layers=3,
                       part_embed_dim=8, trunc=0.15)
    params = init_sdfnet(jax.random.PRNGKey(0), cfg)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.5)
    aa = rng.randn(2, 24, 3).astype(np.float32) * 0.2
    out = lbs(model, betas, jnp.asarray(aa[:, 0]),
              jnp.asarray(aa[:, 1:].reshape(2, 69)), pose2rot=True)
    pts = jnp.asarray(rng.randn(2, 100, 3).astype(np.float32))
    sdf = sdf_query(params, cfg, model, out, betas, pts)
    assert sdf.shape == (2, 100)
    # bounded output: |sdf| < trunc everywhere
    assert float(jnp.max(jnp.abs(sdf))) < cfg.trunc
    loss = sdf_collision_loss(sdf)
    assert loss.shape == (2,) and np.isfinite(np.asarray(loss)).all()
    # masked variant normalizes by mask size
    mask = jnp.ones((2, 100))
    np.testing.assert_allclose(np.asarray(sdf_collision_loss(sdf, mask)),
                               np.asarray(loss), rtol=1e-6)


def test_collision_loss_is_squared_penetration():
    sdf = jnp.asarray([[-0.1, 0.2, -0.3, 0.5]])
    want = np.mean([0.01, 0.0, 0.09, 0.0])
    np.testing.assert_allclose(float(sdf_collision_loss(sdf)[0]), want,
                               rtol=1e-6)


def test_distillation_beats_untrained(rng):
    """After a short distillation the net's SIGN must agree with the exact
    winding-number SDF far better than an untrained one (watertight body:
    the winding sign is ground truth there)."""
    from egohmr_tpu.collision.neural_sdf import sdf_agreement

    model = make_synthetic_watertight_model(rings=6, segs=8)
    cfg = SDFNetConfig(latent_dim=16, hidden_dim=32, num_layers=3,
                       part_embed_dim=8)

    trained = distill_sdf(
        jax.random.PRNGKey(0), model, cfg, steps=400, batch_bodies=4,
        points_per_body=256, label_mode="winding")
    untrained = init_sdfnet(jax.random.PRNGKey(1), cfg)

    q_trained = sdf_agreement(trained, cfg, model, jax.random.PRNGKey(2),
                              n_bodies=2, points_per_body=512,
                              label_mode="winding")
    q_untrained = sdf_agreement(untrained, cfg, model, jax.random.PRNGKey(2),
                                n_bodies=2, points_per_body=512,
                                label_mode="winding")
    assert q_trained["sign_agreement"] > 0.75, (q_trained, q_untrained)
    assert q_trained["sign_agreement"] > q_untrained["sign_agreement"] - 0.02
    # value regression should also be tighter than the untrained net's
    assert q_trained["mae_truncated_m"] < q_untrained["mae_truncated_m"]


def test_volsdf_guidance_fn(rng):
    """Learned-SDF guidance: finite grads, upper body zeroed (the reference
    volsmpl guide_coll zeroes joints [0,3,6,9,12..23] and scales the rest —
    egohmr_volsmpl.py:616-620), jittable."""
    from egohmr_tpu.collision.neural_sdf import make_volsdf_guidance_fn
    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.models import (
        BodyRepStats,
        EgoHMRConfig,
        compute_condition,
        init_egohmr,
    )

    cfg = EgoHMRConfig(**TINY_EGOHMR)
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    model = make_synthetic_model(num_vertices=128)
    sdf_cfg = SDFNetConfig(latent_dim=16, hidden_dim=32, num_layers=3,
                           part_embed_dim=8)
    sdf_params = init_sdfnet(jax.random.PRNGKey(1), sdf_cfg)
    batch = synthetic_batch(2, num_scene_points=128, img_size=32)
    cond, _ = compute_condition(params, cfg, batch)
    guide = make_volsdf_guidance_fn(sdf_params, sdf_cfg, model, cond, stats)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 144))
    g = np.asarray(jax.jit(guide)(x, jnp.zeros((2,), jnp.int32)))
    assert np.isfinite(g).all()
    upper = [0, 3, 6, 9, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23]
    np.testing.assert_allclose(g.reshape(2, 24, 6)[:, upper], 0.0)


def test_distill_cli_artifact_roundtrip(tmp_path):
    """The distill CLI trains, reports held-out quality, and saves an
    artifact that load_sdfnet restores with its config; a run that misses
    the bar must NOT clobber the passing artifact."""
    from egohmr_tpu.collision.neural_sdf import load_sdfnet
    from egohmr_tpu.train import distill_sdf as cli

    path = str(tmp_path / "volsdf.npz")
    meta = cli.main([
        "--synthetic_watertight", "--steps", "60", "--batch_bodies", "2",
        "--points_per_body", "128", "--latent_dim", "8", "--hidden_dim",
        "16", "--num_layers", "2", "--part_embed_dim", "4",
        "--eval_bodies", "2", "--eval_points_per_body", "128",
        "--save_path", path, "--log_every", "0",
        # 60 tiny steps won't reach a real bar; pin 0 to exercise the
        # PASSING save path (the miss path is asserted below)
        "--agreement_bar", "0.0",
    ])
    assert 0.0 <= meta["sign_agreement"] <= 1.0
    assert meta["mae_truncated_m"] >= 0.0
    assert os.path.exists(path) and os.path.exists(path + ".json")
    meta2 = cli.main([
        "--synthetic_watertight", "--steps", "5", "--batch_bodies", "2",
        "--points_per_body", "128", "--latent_dim", "8", "--hidden_dim",
        "16", "--num_layers", "2", "--part_embed_dim", "4",
        "--eval_bodies", "2", "--eval_points_per_body", "128",
        "--save_path", path, "--log_every", "0", "--agreement_bar", "1.1",
    ])
    assert not meta2["passed"]
    assert os.path.exists(path + ".failed.npz")
    params, cfg = load_sdfnet(path)
    assert cfg.latent_dim == 8 and cfg.hidden_dim == 16
    t1 = jax.tree_util.tree_structure(
        init_sdfnet(jax.random.PRNGKey(0), cfg))
    assert jax.tree_util.tree_structure(params) == t1


def test_shipped_artifact_meets_agreement_bar():
    """The committed distilled volsdf artifact must hold its stated bar on
    freshly sampled held-out poses (same gate as the occupancy family's,
    round-4 verdict Next #5)."""
    import json

    from egohmr_tpu.collision.neural_sdf import load_sdfnet, sdf_agreement

    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "volsdf_synthetic.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not built")
    with open(path + ".json") as f:
        meta = json.load(f)
    assert meta["passed"], meta
    params, cfg = load_sdfnet(path)
    model = (make_synthetic_watertight_model()
             if meta["body"] == "synthetic_watertight"
             else make_synthetic_model(num_vertices=6890))
    q = sdf_agreement(params, cfg, model, jax.random.PRNGKey(123),
                      n_bodies=4, points_per_body=512,
                      label_mode=meta["label_mode"],
                      sign_k=meta.get("sign_k", 4))
    assert q["sign_agreement"] >= meta["agreement_bar"] - 0.02, (q, meta)


def test_eval_cli_volsdf_backend_matches_sdf():
    """Guided sampling end-to-end on the learned SDF backend: the collision
    ratio must land within noise of the mesh-SDF backend (round-4 verdict
    Next #5 'Done' condition — mirrors the occupancy backend's gate)."""
    from egohmr_tpu.eval import test_egohmr as cli

    artifact = os.path.join(os.path.dirname(__file__), "..",
                            "artifacts", "volsdf_synthetic.npz")
    if not os.path.exists(artifact):
        pytest.skip("artifact not built")

    common = [
        "--synthetic", "--batch_size", "2", "--num_batches", "1",
        "--num_samples", "2", "--num_diffusion_timesteps", "10",
        "--timestep_respacing_eval", "ddpm", "--with_coap_grad", "true",
        "--eval_contact_score", "false", "--data_parallel", "false",
    ]
    s_sdf = cli.main(common + ["--collision_backend", "sdf"])
    s_vol = cli.main(common + ["--collision_backend", "volsdf",
                               "--sdfnet_ckpt", artifact])
    assert np.isfinite(s_vol["coll_ratio"])
    assert np.isfinite(s_vol["g_mpjpe"])
    assert abs(s_vol["coll_ratio"] - s_sdf["coll_ratio"]) < 0.05, \
        (s_sdf["coll_ratio"], s_vol["coll_ratio"])


def test_volsmpl_cli_is_test_egohmr_with_volsdf_defaults():
    """The literal reference CLI split (test_egohmr.py vs
    test_egohmr_volsmpl.py, identical bar EgoHMRVolsmpl + cond_grad_weight=30
    — SURVEY §2.5): the alias parses the SAME flag set with the volsmpl
    variant defaults, still overridable, and runs the shared driver."""
    from egohmr_tpu.eval import test_egohmr, test_egohmr_volsmpl as cli

    args = cli.parse_args(["--synthetic"])
    assert args.collision_backend == "volsdf"
    assert args.cond_grad_weight == 30.0
    base = test_egohmr.parse_args(["--synthetic"])
    assert base.collision_backend == "sdf" and base.cond_grad_weight == 2.0
    # same flag surface, and explicit flags still win over variant defaults
    assert vars(args).keys() == vars(base).keys()
    ov = cli.parse_args(["--synthetic", "--cond_grad_weight", "7",
                         "--collision_backend", "sdf"])
    assert ov.cond_grad_weight == 7.0 and ov.collision_backend == "sdf"

    artifact = os.path.join(os.path.dirname(__file__), "..",
                            "artifacts", "volsdf_synthetic.npz")
    if not os.path.exists(artifact):
        pytest.skip("shipped volsdf artifact not built")
    assert os.path.samefile(args.sdfnet_ckpt, artifact)
    s = cli.main(["--synthetic", "--batch_size", "2", "--num_batches", "1",
                  "--num_samples", "1", "--num_diffusion_timesteps", "10",
                  "--timestep_respacing_eval", "ddpm",
                  "--eval_contact_score", "false",
                  "--data_parallel", "false"])
    assert np.isfinite(s["coll_ratio"]) and np.isfinite(s["g_mpjpe"])


def test_volsdf_backend_rejects_guidance_refresh():
    """guidance_refresh_every > 1 caches the sdf backend's selection pass;
    the volsdf backend has no selection stage, so the combination must fail
    loudly (same contract as the occupancy backend's)."""
    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import make_schedule
    from egohmr_tpu.eval.pipeline import sample_bodies
    from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, init_egohmr

    cfg = EgoHMRConfig(**TINY_EGOHMR)
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    batch = synthetic_batch(2, num_scene_points=256, img_size=32)
    with pytest.raises(ValueError, match="sdf-backend knob"):
        sample_bodies(
            params, cfg, smpl, stats, make_schedule(10, "cosine", ""),
            batch, jax.random.PRNGKey(0), 1, with_guidance=True,
            collision_backend="volsdf", guidance_refresh_every=2)


# ---------------------------------------------------------------- converter

def _fabricate_state_dict(rng, *, enc_dims=(22, 48, 32),
                          dec_dims=(35, 64, 64, 1),
                          prefix=("part_encoders.{k}.net",
                                  "part_decoders.{k}.net"),
                          key_prefix="", num_parts=NUM_PARTS):
    """Torch-layout flat dict: per-part Sequential MLPs (Linear at even
    slots, activation modules own no params)."""
    sd = {}
    for k in range(num_parts):
        for dims, fmt in zip((enc_dims, dec_dims), prefix):
            for i in range(len(dims) - 1):
                base = f"{key_prefix}{fmt.format(k=k)}.{2 * i}"
                sd[base + ".weight"] = rng.randn(
                    dims[i + 1], dims[i]).astype(np.float32) * 0.2
                sd[base + ".bias"] = rng.randn(
                    dims[i + 1]).astype(np.float32) * 0.1
    return sd


def test_convert_volsmpl_shapes_and_config():
    rng = np.random.RandomState(0)
    params, cfg = convert_volsmpl(_fabricate_state_dict(rng))
    assert cfg.per_part_networks and cfg.activation == "leaky_relu"
    assert not cfg.bounded_output  # releases regress raw signed distance
    assert cfg.latent_dim == 32 and cfg.num_layers == 3
    assert [tuple(l["w"].shape) for l in params["part_encoder"]] == [
        (NUM_PARTS, 22, 48), (NUM_PARTS, 48, 32)]
    assert [tuple(l["w"].shape) for l in params["part_decoder"]] == [
        (NUM_PARTS, 35, 64), (NUM_PARTS, 64, 64), (NUM_PARTS, 64, 1)]


def test_convert_volsmpl_unwraps_lightning_and_prefix():
    """The reference loads `last.ckpt['state_dict']` onto an attached
    module (egohmr_volsmpl.py:122-132) — the converter must unwrap the
    lightning wrapper and strip the attach-point prefix."""
    rng = np.random.RandomState(1)
    inner = _fabricate_state_dict(rng, key_prefix="coap.")
    params, cfg = convert_volsmpl({"state_dict": inner})
    assert cfg.latent_dim == 32
    # and plain dicts with a 'volume.' attach prefix also work
    rng = np.random.RandomState(1)
    params2, _ = convert_volsmpl(_fabricate_state_dict(
        rng, key_prefix="volume."))
    np.testing.assert_allclose(np.asarray(params["part_encoder"][0]["w"]),
                               np.asarray(params2["part_encoder"][0]["w"]))


def test_convert_volsmpl_forward_matches_numpy_reference():
    """Converted params through sdf_query's part-batched einsum path must
    reproduce EXACTLY the fabricated per-part torch modules' output —
    hand-rolled per-part numpy forward, min composition, no tanh bound."""
    rng = np.random.RandomState(2)
    sd = _fabricate_state_dict(rng)
    params, cfg = convert_volsmpl(sd)

    model = make_synthetic_model(num_vertices=128)
    B, P = 2, 64
    betas = jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.3)
    aa = rng.randn(B, 24, 3).astype(np.float32) * 0.2
    out = lbs(model, betas, jnp.asarray(aa[:, :1]).reshape(-1, 3),
              jnp.asarray(aa[:, 1:]).reshape(B, 69), pose2rot=True)
    pts = jnp.asarray(rng.randn(B, P, 3).astype(np.float32))

    got = np.asarray(sdf_query(params, cfg, model, out, betas, pts))

    from egohmr_tpu.collision.neural_occupancy import _part_transforms

    rot, trans = _part_transforms(model, out)
    rot, trans = np.asarray(rot), np.asarray(trans)
    feats = np.concatenate(
        [rot.reshape(B, 24, 9), trans,
         np.broadcast_to(np.asarray(betas)[:, None, :], (B, 24, 10))],
        axis=-1)
    rel = np.asarray(pts)[:, None, :, :] - trans[:, :, None, :]
    local = np.einsum("bkij,bkpi->bkpj", rot, rel)

    def leaky(x):
        return np.where(x >= 0, x, 0.01 * x)

    vals = np.zeros((B, 24, P), np.float32)
    for k in range(24):
        h = feats[:, k]
        for i in (0, 2):
            h = h @ sd[f"part_encoders.{k}.net.{i}.weight"].T \
                + sd[f"part_encoders.{k}.net.{i}.bias"]
            if i == 0:
                h = leaky(h)
        x = np.concatenate(
            [local[:, k],
             np.broadcast_to(h[:, None, :], (B, P, h.shape[-1]))], axis=-1)
        for i in (0, 2, 4):
            x = x @ sd[f"part_decoders.{k}.net.{i}.weight"].T \
                + sd[f"part_decoders.{k}.net.{i}.bias"]
            if i < 4:
                x = leaky(x)
        vals[:, k] = x[..., 0]
    want = vals.min(axis=1)  # union of parts: min over part fields
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_convert_volsmpl_errors():
    rng = np.random.RandomState(3)
    with pytest.raises(ValueError, match="no per-part module pattern"):
        convert_volsmpl({"totally.different.weight": np.zeros((4, 4))})
    with pytest.raises(ValueError, match="22 dims per part"):
        convert_volsmpl(_fabricate_state_dict(rng, enc_dims=(17, 48, 32)))
    params, cfg = convert_volsmpl(
        _fabricate_state_dict(rng, enc_dims=(17, 48, 32)),
        strict_feature_contract=False)
    assert params["part_encoder"][0]["w"].shape == (NUM_PARTS, 17, 48)


def test_converted_artifact_npz_roundtrip(tmp_path):
    """A CONVERTED (per_part_networks) net re-saved as .npz must reload
    through load_sdfnet: init_sdfnet can't template that layout, so the
    loader rebuilds the tree from the flat keys (utils.checkpoint
    load_npz_tree)."""
    import dataclasses
    import json

    from egohmr_tpu.collision.neural_sdf import load_sdfnet
    from egohmr_tpu.utils.checkpoint import save_npz

    rng = np.random.RandomState(5)
    params, cfg = convert_volsmpl(_fabricate_state_dict(rng))
    path = str(tmp_path / "converted.npz")
    save_npz(path, params)
    with open(path + ".json", "w") as f:
        json.dump({"sdf_config": dataclasses.asdict(cfg)}, f)

    params2, cfg2 = load_sdfnet(path)
    assert cfg2 == cfg
    assert (jax.tree_util.tree_structure(params2)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_volsmpl_guidance_path_runs():
    """The converted net must plug into the volsdf guidance closure the
    eval CLI builds for --collision_backend volsdf."""
    from egohmr_tpu.collision.neural_sdf import make_volsdf_guidance_fn
    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.models import (
        BodyRepStats,
        EgoHMRConfig,
        compute_condition,
        init_egohmr,
    )

    rng = np.random.RandomState(4)
    sdf_params, sdf_cfg = convert_volsmpl(_fabricate_state_dict(rng))

    cfg = EgoHMRConfig(**TINY_EGOHMR)
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    batch = synthetic_batch(2, num_scene_points=256, img_size=32)
    cond, _ = compute_condition(params, cfg, batch)
    fn = make_volsdf_guidance_fn(sdf_params, sdf_cfg, smpl, cond, stats)
    g = fn(jax.random.normal(jax.random.PRNGKey(0), (2, 144)) * 0.3,
           jnp.zeros((2,), jnp.int32))
    assert g.shape == (2, 144)
    assert np.isfinite(np.asarray(g)).all()

"""Shape/math contract for the COAP weight-layout converter.

The real COAP release weights are absent from this image (reference
environment.yml:153), so the converter is pinned on a FABRICATED state
dict in the published per-part-Sequential layout — the same pattern
tests/test_interop_export.py uses for the 91453 stage-2 checkpoint: prove
the mapping is mechanical so a real weight drop becomes a file path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egohmr_tpu.collision.neural_occupancy import (
    NUM_PARTS,
    OccupancyConfig,
    occupancy_query,
)
from egohmr_tpu.interop.coap_convert import convert_coap
from egohmr_tpu.smpl import lbs, make_synthetic_model


def _fabricate_state_dict(rng, *, enc_dims=(22, 48, 32),
                          dec_dims=(35, 64, 64, 1),
                          prefix=("part_encoders.{k}.net",
                                  "part_decoders.{k}.net"),
                          num_parts=NUM_PARTS, with_bias=True):
    """A torch-layout flat dict: per-part Sequential MLPs with activation
    slots at odd indices (torch Sequential indexing skips no numbers, but
    activation modules own no params, so only even indices appear)."""
    sd = {}
    for k in range(num_parts):
        for dims, fmt in zip((enc_dims, dec_dims), prefix):
            for i in range(len(dims) - 1):
                seq_i = 2 * i  # Linear at even slots, activation at odd
                base = f"{fmt.format(k=k)}.{seq_i}"
                sd[base + ".weight"] = rng.randn(
                    dims[i + 1], dims[i]).astype(np.float32) * 0.2
                if with_bias:
                    sd[base + ".bias"] = rng.randn(
                        dims[i + 1]).astype(np.float32) * 0.1
    return sd


def test_convert_coap_shapes_and_config():
    rng = np.random.RandomState(0)
    sd = _fabricate_state_dict(rng)
    params, cfg = convert_coap(sd)
    assert cfg.per_part_networks and cfg.activation == "leaky_relu"
    assert cfg.latent_dim == 32 and cfg.num_layers == 3
    enc, dec = params["part_encoder"], params["part_decoder"]
    assert [tuple(l["w"].shape) for l in enc] == [
        (NUM_PARTS, 22, 48), (NUM_PARTS, 48, 32)]
    assert [tuple(l["w"].shape) for l in dec] == [
        (NUM_PARTS, 35, 64), (NUM_PARTS, 64, 64), (NUM_PARTS, 64, 1)]
    assert enc[0]["b"].shape == (NUM_PARTS, 48)


def test_convert_coap_forward_matches_numpy_reference():
    """The converted params must reproduce, through the part-batched
    einsum path of occupancy_query, EXACTLY what the fabricated per-part
    torch modules would compute — checked against a hand-rolled per-part
    numpy forward of the same weights."""
    rng = np.random.RandomState(1)
    sd = _fabricate_state_dict(rng)
    params, cfg = convert_coap(sd)

    model = make_synthetic_model(num_vertices=128)
    B, P = 2, 64
    betas = jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.3)
    aa = rng.randn(B, 24, 3).astype(np.float32) * 0.2
    out = lbs(model, betas, jnp.asarray(aa[:, :1]).reshape(-1, 3),
              jnp.asarray(aa[:, 1:]).reshape(B, 69), pose2rot=True)
    pts = jnp.asarray(rng.randn(B, P, 3).astype(np.float32))

    got = np.asarray(occupancy_query(params, cfg, model, out, betas, pts))

    # hand-rolled reference: python loop over parts, torch-layout weights
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

    logits = np.zeros((B, 24, P), np.float32)
    for k in range(24):
        h = feats[:, k]
        for i in (0, 2):
            w = sd[f"part_encoders.{k}.net.{i}.weight"]
            b = sd[f"part_encoders.{k}.net.{i}.bias"]
            h = h @ w.T + b
            if i == 0:
                h = leaky(h)
        x = np.concatenate(
            [local[:, k], np.broadcast_to(h[:, None, :], (B, P, h.shape[-1]))],
            axis=-1)
        for i in (0, 2, 4):
            w = sd[f"part_decoders.{k}.net.{i}.weight"]
            b = sd[f"part_decoders.{k}.net.{i}.bias"]
            x = x @ w.T + b
            if i < 4:
                x = leaky(x)
        logits[:, k] = x[..., 0]
    want = 1.0 / (1.0 + np.exp(-logits.max(axis=1)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_convert_coap_autodiscovery_and_errors():
    rng = np.random.RandomState(2)
    # alternate naming discovered automatically
    sd = _fabricate_state_dict(rng, prefix=("encoders.{k}", "decoders.{k}"))
    params, cfg = convert_coap(sd)
    assert len(params["part_encoder"]) == 2

    # unknown layout -> loud error listing the tried patterns
    with pytest.raises(ValueError, match="no per-part module pattern"):
        convert_coap({"totally.different.weight": np.zeros((4, 4))})

    # mismatched per-part shapes -> loud error naming part and layer
    sd_bad = _fabricate_state_dict(rng)
    sd_bad["part_encoders.3.net.0.weight"] = np.zeros((7, 22), np.float32)
    with pytest.raises(ValueError, match="part 3"):
        convert_coap(sd_bad)

    # wrong encoder input dim -> feature-contract error with guidance
    sd_dim = _fabricate_state_dict(rng, enc_dims=(17, 48, 32))
    with pytest.raises(ValueError, match="22 dims per part"):
        convert_coap(sd_dim)
    params2, cfg2 = convert_coap(sd_dim, strict_feature_contract=False)
    assert params2["part_encoder"][0]["w"].shape == (NUM_PARTS, 17, 48)


def test_convert_coap_guidance_path_runs():
    """The converted net must plug into the occupancy guidance closure the
    eval CLI builds for --collision_backend occupancy."""
    from egohmr_tpu.collision.neural_occupancy import (
        make_occupancy_guidance_fn,
    )
    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.models import (
        BodyRepStats,
        EgoHMRConfig,
        compute_condition,
        init_egohmr,
    )

    rng = np.random.RandomState(3)
    sd = _fabricate_state_dict(rng)
    occ_params, occ_cfg = convert_coap(sd)

    cfg = EgoHMRConfig(
        img_feat_dim=64, backbone_type="stub", scene_feat_dim=32,
        pointnet_hidden_dim=16, transl_embed_dim=16, timestep_embed_dim=32,
        input_process_dim=32, gcn_hid_dim=32, gcn_layers=2)
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    batch = synthetic_batch(2, num_scene_points=256, img_size=56)
    cond, _ = compute_condition(params, cfg, batch)
    fn = make_occupancy_guidance_fn(occ_params, occ_cfg, smpl, cond, stats)
    g = fn(jax.random.normal(jax.random.PRNGKey(0), (2, 144)) * 0.3,
           jnp.zeros((2,), jnp.int32))
    assert g.shape == (2, 144)
    assert np.isfinite(np.asarray(g)).all()


def test_occupancy_backend_rejects_guidance_refresh():
    """guidance_refresh_every > 1 caches the sdf backend's selection pass;
    the occupancy backend has no selection stage, so the combination must
    fail loudly instead of silently running full-cost (round-4 review)."""
    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import make_schedule
    from egohmr_tpu.eval.pipeline import sample_bodies
    from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, init_egohmr

    cfg = EgoHMRConfig(
        img_feat_dim=64, backbone_type="stub", scene_feat_dim=32,
        pointnet_hidden_dim=16, transl_embed_dim=16, timestep_embed_dim=32,
        input_process_dim=32, gcn_hid_dim=32, gcn_layers=2)
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    batch = synthetic_batch(2, num_scene_points=256, img_size=56)
    with pytest.raises(ValueError, match="sdf-backend knob"):
        sample_bodies(
            params, cfg, smpl, stats, make_schedule(10, "cosine", ""),
            batch, jax.random.PRNGKey(0), 1, with_guidance=True,
            collision_backend="occupancy", guidance_refresh_every=2)


def test_converted_artifact_npz_roundtrip(tmp_path):
    """A CONVERTED (per_part_networks) occupancy net re-saved as .npz must
    reload through load_occupancy: init_occupancy can't template that
    layout, so the loader rebuilds the tree from the flat keys
    (utils.checkpoint load_npz_tree)."""
    import dataclasses
    import json

    from egohmr_tpu.collision.neural_occupancy import load_occupancy
    from egohmr_tpu.utils.checkpoint import save_npz

    rng = np.random.RandomState(7)
    params, cfg = convert_coap(_fabricate_state_dict(rng))
    path = str(tmp_path / "converted_coap.npz")
    save_npz(path, params)
    with open(path + ".json", "w") as f:
        json.dump({"occupancy_config": dataclasses.asdict(cfg)}, f)

    params2, cfg2 = load_occupancy(path)
    assert cfg2 == cfg
    assert (jax.tree_util.tree_structure(params2)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

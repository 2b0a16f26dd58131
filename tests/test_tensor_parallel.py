"""Tensor-parallel (2-D data x model mesh) placement: parity vs unsharded.

The reference is single-GPU; TP is a framework capability beyond it
(parallel/tp.py). These tests certify on the virtual 8-device CPU mesh that
Megatron-style GSPMD placement of the PointNet / GCN / full stage-2 model
is elementwise-equal to the unsharded program (f32, highest precision), and
that the partitioner actually inserted cross-shard collectives (i.e. the
placement is real TP, not silent full replication).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from egohmr_tpu.parallel import (
    egohmr_tp_specs,
    gcn_tp_specs,
    make_dp_tp_mesh,
    place_params,
    pointnet_tp_specs,
    shard_batch,
)

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _assert_has_collective(compiled_text: str) -> None:
    # specifically all-reduce (the row-parallel partial-sum signature):
    # an all-GATHER is what the partitioner emits when it resolves a bad
    # placement by gathering params back to replicated — i.e. exactly the
    # silent-replication failure mode this check exists to catch
    assert "all-reduce" in compiled_text, (
        "no all-reduce in the partitioned program — TP placement was "
        "propagated away (silent replication or param all-gather)"
    )


@needs8
def test_pointnet_tp_matches_dense():
    from egohmr_tpu.nn import init_pointnet, pointnet_forward

    mesh = make_dp_tp_mesh(2, 4)
    params = init_pointnet(jax.random.PRNGKey(0), out_dim=32, hidden_dim=16)
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 128, 3))
    dense = pointnet_forward(params, pts)

    specs = pointnet_tp_specs(params)
    placed = place_params(mesh, params, specs)
    # inner hidden of each block is sharded 4-way; residual stream replicated
    assert placed["block_1"]["fc_0"]["w"].sharding.spec == P(None, "model")
    assert placed["block_1"]["fc_1"]["w"].sharding.spec == P("model", None)
    x = jax.device_put(pts, NamedSharding(mesh, P("data")))

    f = jax.jit(pointnet_forward)
    out = f(placed, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense), rtol=1e-5, atol=1e-6
    )
    _assert_has_collective(f.lower(placed, x).compile().as_text())


@needs8
def test_gcn_tp_matches_dense():
    from egohmr_tpu.nn.gcn import init_modulated_gcn, modulated_gcn_forward
    from egohmr_tpu.smpl import constants as C

    mesh = make_dp_tp_mesh(2, 4)
    adj = jnp.asarray(C.joint_adjacency(), jnp.float32)
    params = init_modulated_gcn(
        jax.random.PRNGKey(0), in_dim=40, hid_dim=32, out_dim=6,
        num_layers=2, nonlocal_layer=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 24, 40))
    dense, _ = modulated_gcn_forward(params, adj, x, train=False)

    placed = place_params(mesh, params, gcn_tp_specs(params))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def fwd(p, x):
        out, _ = modulated_gcn_forward(p, adj, x, train=False)
        return out

    f = jax.jit(fwd)
    out = f(placed, xs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense), rtol=1e-5, atol=1e-6
    )
    _assert_has_collective(f.lower(placed, xs).compile().as_text())


@needs8
def test_full_model_tp_sampling_matches_dense():
    """End-to-end: sample_bodies with the full stage-2 param tree placed
    dp=2 x tp=4 equals the single-device run (same RNG key)."""
    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import make_schedule
    from egohmr_tpu.eval.pipeline import sample_bodies
    from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, init_egohmr
    from egohmr_tpu.smpl import make_synthetic_model

    cfg = EgoHMRConfig(
        img_feat_dim=64, backbone_type="stub", scene_feat_dim=32,
        pointnet_hidden_dim=16, transl_embed_dim=16, timestep_embed_dim=32,
        input_process_dim=32, gcn_hid_dim=32, gcn_layers=2,
    )
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=256)
    schedule = make_schedule(50, "cosine", "ddim5")
    batch = synthetic_batch(4, num_scene_points=256, img_size=56)

    def infer(params, batch):
        outs, _ = sample_bodies(
            params, cfg, smpl, stats, schedule, batch,
            jax.random.PRNGKey(2), num_samples=2, sampler="ddim")
        return outs["pred_keypoints_3d_full"]

    dense = jax.jit(infer)(params, batch)

    mesh = make_dp_tp_mesh(2, 4)
    placed = place_params(mesh, params, egohmr_tp_specs(params))
    sbatch = shard_batch(mesh, batch, axis="data")
    f = jax.jit(infer)
    out = f(placed, sbatch)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense), rtol=1e-4, atol=1e-5
    )
    _assert_has_collective(f.lower(placed, sbatch).compile().as_text())


@needs8
def test_full_model_tp_guided_sampling_matches_dense():
    """Guided DDIM under TP: the collision-score gradient (jax.grad through
    rot6d->LBS->SDF inside the scan) composes with TP-sharded conditioning
    — the guidance inputs (SMPL, scene cloud, selection state) are
    replicated, only the encoders/denoiser are model-sharded."""
    from egohmr_tpu.data.synthetic import synthetic_batch
    from egohmr_tpu.diffusion import make_schedule
    from egohmr_tpu.eval.pipeline import sample_bodies
    from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, init_egohmr
    from egohmr_tpu.smpl import make_synthetic_model

    cfg = EgoHMRConfig(
        img_feat_dim=64, backbone_type="stub", scene_feat_dim=32,
        pointnet_hidden_dim=16, transl_embed_dim=16, timestep_embed_dim=32,
        input_process_dim=32, gcn_hid_dim=32, gcn_layers=2,
    )
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=256)
    schedule = make_schedule(50, "cosine", "ddim5")
    batch = synthetic_batch(4, num_scene_points=256, img_size=56)

    def infer(params, batch):
        outs, _ = sample_bodies(
            params, cfg, smpl, stats, schedule, batch,
            jax.random.PRNGKey(3), num_samples=1, sampler="ddim",
            with_guidance=True)
        return outs["pred_keypoints_3d_full"]

    dense = jax.jit(infer)(params, batch)
    mesh = make_dp_tp_mesh(2, 4)
    placed = place_params(mesh, params, egohmr_tp_specs(params))
    sbatch = shard_batch(mesh, batch, axis="data")
    out = jax.jit(infer)(placed, sbatch)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense), rtol=1e-4, atol=1e-5
    )


@needs8
def test_tp_specs_cover_every_leaf():
    """The spec tree must mirror the param tree exactly — a missing/extra
    key would silently replicate (or crash) at place time."""
    from egohmr_tpu.models import EgoHMRConfig, init_egohmr

    cfg = EgoHMRConfig(
        img_feat_dim=64, backbone_type="stub", scene_feat_dim=32,
        pointnet_hidden_dim=16, transl_embed_dim=16, timestep_embed_dim=32,
        input_process_dim=32, gcn_hid_dim=32, gcn_layers=2,
        gcn_nonlocal_layer=True,
    )
    params = init_egohmr(jax.random.PRNGKey(0), cfg)
    specs = egohmr_tp_specs(params)
    ps = jax.tree_util.tree_structure(params)
    ss = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(
            lambda s: 0, specs, is_leaf=lambda s: isinstance(s, P))
    )
    assert ps == ss

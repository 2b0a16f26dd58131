"""Stage-1 ProHMR-scene end-to-end tests (tiny config)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from egohmr_tpu.data.synthetic import synthetic_batch
from egohmr_tpu.models.discriminator import init_discriminator
from egohmr_tpu.models.prohmr import (
    ProHMRConfig,
    ProHMRLossWeights,
    compute_loss,
    forward,
    init_prohmr,
    initialize,
)
from egohmr_tpu.smpl import make_synthetic_model
from egohmr_tpu.train.prohmr_loop import make_prohmr_train_step

CFG = ProHMRConfig(
    img_feat_dim=32, backbone_type="stub", scene_feat_dim=16,
    pointnet_hidden_dim=8, flow_dim=144, flow_hidden=32, flow_layers=2,
    flow_depth=1, fc_head_hidden=32,
)


@pytest.fixture(scope="module")
def setup():
    params = init_prohmr(jax.random.PRNGKey(0), CFG)
    smpl = make_synthetic_model(num_vertices=128)
    batch = synthetic_batch(2, num_scene_points=256, img_size=56)
    params = initialize(params, CFG, batch)  # actnorm data init
    return params, smpl, batch


def test_forward_shapes_and_mode(setup):
    params, smpl, batch = setup
    out, _ = forward(params, CFG, smpl, batch, jax.random.PRNGKey(1), 4)
    B, S = 2, 4
    assert out.pred_pose_6d.shape == (B, S, 144)
    assert out.pred_pose_rotmat.shape == (B, S, 24, 3, 3)
    assert out.pred_cam_t_full.shape == (B, S, 3)
    assert out.pred_keypoints_2d_full.shape == (B, S, 45, 2)
    # sample 0 is the z=0 mode: deterministic across keys
    out2, _ = forward(params, CFG, smpl, batch, jax.random.PRNGKey(99), 4)
    np.testing.assert_allclose(
        np.asarray(out.pred_pose_6d[:, 0]), np.asarray(out2.pred_pose_6d[:, 0]),
        atol=1e-6,
    )
    assert not np.allclose(
        np.asarray(out.pred_pose_6d[:, 1]), np.asarray(out2.pred_pose_6d[:, 1])
    )


def test_rotmats_valid(setup):
    params, smpl, batch = setup
    out, _ = forward(params, CFG, smpl, batch, jax.random.PRNGKey(1), 2)
    r = np.asarray(out.pred_pose_rotmat).reshape(-1, 3, 3)
    eye = r @ r.transpose(0, 2, 1)
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(len(r), 0), atol=1e-4)


def test_loss_finite(setup):
    params, smpl, batch = setup
    out, _ = forward(params, CFG, smpl, batch, jax.random.PRNGKey(1), 2, train=True)
    total, losses = compute_loss(
        params, CFG, ProHMRLossWeights(), smpl, smpl, batch, out,
        jax.random.PRNGKey(2), train=True,
    )
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_gan_train_step(setup):
    params, smpl, batch = setup
    disc_params = init_discriminator(jax.random.PRNGKey(3))
    opt = optax.adamw(1e-4)
    dopt = optax.adamw(1e-4)
    step = make_prohmr_train_step(
        CFG, ProHMRLossWeights(), smpl, smpl, smpl, opt, dopt)
    opt_state = opt.init(params)
    dopt_state = dopt.init(disc_params)
    rng = np.random.RandomState(0)
    mocap = {
        "body_pose": jnp.asarray(rng.randn(2, 69).astype(np.float32) * 0.3),
        "betas": jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.5),
    }
    p, dp, os_, dos, metrics = step(
        params, disc_params, opt_state, dopt_state, batch, mocap,
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_disc"]))
    assert np.isfinite(float(metrics["loss_gen"]))
    # generator params actually moved
    before = jax.tree_util.tree_leaves(params["flow"])[0]
    after = jax.tree_util.tree_leaves(p["flow"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))

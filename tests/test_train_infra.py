"""Training infrastructure tests: optimizer masking, checkpoint resume,
multi-device train step, graft entry points."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from egohmr_tpu.data.synthetic import synthetic_batch
from egohmr_tpu.diffusion import make_schedule
from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, LossWeights, init_egohmr
from egohmr_tpu.smpl import make_synthetic_model
from egohmr_tpu.train.loop import TrainConfig, make_optimizer, make_train_step

TINY = EgoHMRConfig(
    img_feat_dim=32, backbone_type="stub", scene_feat_dim=16,
    pointnet_hidden_dim=8, transl_embed_dim=8, timestep_embed_dim=16,
    input_process_dim=16, gcn_hid_dim=16, gcn_layers=1,
)


def _setup():
    params = init_egohmr(jax.random.PRNGKey(0), TINY)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=64)
    schedule = make_schedule(10, "cosine", "")
    tcfg = TrainConfig()
    opt = make_optimizer(tcfg)
    return params, stats, smpl, schedule, tcfg, opt


def test_bn_stats_not_touched_by_optimizer():
    params, stats, smpl, schedule, tcfg, opt = _setup()
    step = make_train_step(TINY, tcfg, LossWeights(), schedule, stats,
                           smpl, smpl, smpl, opt)
    opt_state = opt.init(params)
    batch = synthetic_batch(2, num_scene_points=64, img_size=32)
    new_params, _, metrics = step(params, opt_state, batch,
                                  jax.random.PRNGKey(0))
    # weights moved
    assert not np.allclose(
        np.asarray(params["diffusion_model"]["gconv_output"]["W"]),
        np.asarray(new_params["diffusion_model"]["gconv_output"]["W"]))
    # BN running stats came from the forward pass (not AdamW's update rule):
    # variance must remain positive and have moved toward batch stats
    var = np.asarray(new_params["diffusion_model"]["gconv_input"]["bn"]["var"])
    assert (var > 0).all()
    assert np.isfinite(float(metrics["loss"]))


def test_multidevice_step_matches_single_device():
    """The 8-way DP step must produce (approximately) the same update as the
    single-device step on the same global batch."""
    from egohmr_tpu.parallel import make_mesh, replicate, shard_batch

    params, stats, smpl, schedule, tcfg, opt = _setup()
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = synthetic_batch(8, num_scene_points=64, img_size=32)
    opt_state = opt.init(params)

    single = make_train_step(TINY, tcfg, LossWeights(), schedule, stats,
                             smpl, smpl, smpl, opt)
    p1, _, m1 = single(params, opt_state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    multi = make_train_step(TINY, tcfg, LossWeights(), schedule, stats,
                            smpl, smpl, smpl, opt, mesh=mesh)
    p8, _, m8 = multi(replicate(mesh, params), replicate(mesh, opt_state),
                      shard_batch(mesh, batch), jax.random.PRNGKey(0))
    # RNG folding differs per shard, so losses differ — but both must be
    # finite and the update magnitudes comparable
    assert np.isfinite(float(m8["loss"]))
    d1 = float(jnp.mean(jnp.abs(
        p1["diffusion_model"]["gconv_output"]["W"]
        - params["diffusion_model"]["gconv_output"]["W"])))
    d8 = float(jnp.mean(jnp.abs(
        p8["diffusion_model"]["gconv_output"]["W"]
        - params["diffusion_model"]["gconv_output"]["W"])))
    assert d8 > 0 and d8 < 10 * d1 + 1e-4


def test_checkpoint_roundtrip_and_resume(tmp_path):
    from egohmr_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    params, stats, smpl, schedule, tcfg, opt = _setup()
    opt_state = opt.init(params)
    path = os.path.join(str(tmp_path), "ckpts", "step_5")
    save_checkpoint(path, {"params": jax.device_get(params),
                           "opt_state": jax.device_get(opt_state),
                           "step": 5})
    assert latest_checkpoint(os.path.join(str(tmp_path), "ckpts")) == path
    state = restore_checkpoint(path)
    assert int(np.asarray(state["step"])) == 5
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_npz_checkpoint_roundtrip(tmp_path):
    from egohmr_tpu.utils.checkpoint import load_npz_into, save_npz

    params, *_ = _setup()
    p = os.path.join(str(tmp_path), "params.npz")
    save_npz(p, params)
    back = load_npz_into(p, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_training_overfits_fixed_batch():
    """End-to-end training sanity: repeated steps on one fixed batch must
    drive the loss down substantially (verifies grads + optimizer wiring,
    not just one-step finiteness)."""
    params, stats, smpl, schedule, _, _ = _setup()
    tcfg = TrainConfig(lr=1e-3)  # overfit fast on the fixed batch
    opt = make_optimizer(tcfg)
    step = make_train_step(TINY, tcfg, LossWeights(), schedule, stats,
                           smpl, smpl, smpl, opt)
    opt_state = opt.init(params)
    batch = synthetic_batch(4, num_scene_points=64, img_size=32)
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(120):
        # fixed timestep draw pattern, fixed batch -> should overfit
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, sub)
        losses.append(float(metrics["loss"]))
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert np.isfinite(late)
    # the synthetic-data loss has a large irreducible floor (random GT,
    # random SMPL); ~30% reduction by step 120 is the calibrated signal
    assert late < 0.8 * early, (early, late)


def test_no_param_leaf_is_weak_typed():
    """Weak-typed param leaves flip to strong after one optimizer step and
    force full retraces of the jitted train step (caught on the real TPU:
    each retrace is a 20-min remote compile)."""
    from egohmr_tpu.models.discriminator import init_discriminator
    from egohmr_tpu.models.prohmr import ProHMRConfig, init_prohmr

    trees = {
        "egohmr": init_egohmr(jax.random.PRNGKey(0), TINY),
        "prohmr": init_prohmr(jax.random.PRNGKey(0), ProHMRConfig(
            img_feat_dim=16, backbone_type="stub", scene_feat_dim=8,
            pointnet_hidden_dim=4, flow_hidden=8, flow_layers=1,
            flow_depth=1, fc_head_hidden=8)),
        "disc": init_discriminator(jax.random.PRNGKey(0)),
    }
    for name, tree in trees.items():
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            assert not getattr(leaf, "weak_type", False), (
                name, jax.tree_util.keystr(path))


def test_train_step_does_not_retrace():
    """Feeding the step's own outputs back must hit the jit cache."""
    params, stats, smpl, schedule, tcfg, opt = _setup()
    step = make_train_step(TINY, tcfg, LossWeights(), schedule, stats,
                           smpl, smpl, smpl, opt)
    opt_state = opt.init(params)
    batch = synthetic_batch(2, num_scene_points=64, img_size=32)
    p, o = params, opt_state
    for i in range(3):
        p, o, _ = step(p, o, batch, jax.random.PRNGKey(i))
    assert step._cache_size() == 1, step._cache_size()

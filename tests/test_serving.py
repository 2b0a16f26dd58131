"""Serving predictor: fixed-shape padding, ordering, pipelined streaming."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egohmr_tpu.data.synthetic import synthetic_batch
from egohmr_tpu.diffusion import make_schedule
from egohmr_tpu.models import BodyRepStats, EgoHMRConfig, init_egohmr
from egohmr_tpu.serving import MESH_OUTPUT_KEYS, Predictor
from egohmr_tpu.smpl import make_synthetic_model

CFG = EgoHMRConfig(
    img_feat_dim=64, backbone_type="stub", scene_feat_dim=32,
    pointnet_hidden_dim=16, transl_embed_dim=16, timestep_embed_dim=32,
    input_process_dim=32, gcn_hid_dim=32, gcn_layers=2,
)


@pytest.fixture(scope="module")
def predictor():
    params = init_egohmr(jax.random.PRNGKey(0), CFG)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    schedule = make_schedule(50, "cosine", "ddim5")
    return Predictor(params, CFG, smpl, stats, schedule,
                     batch_size=4, num_samples=2, max_inflight=2,
                     output_keys=MESH_OUTPUT_KEYS)


def _mini_batch(n, seed=0):
    b = synthetic_batch(n, num_scene_points=256, img_size=56, seed=seed)
    return b


def test_blocking_call_shapes(predictor):
    out = predictor(_mini_batch(4))
    assert out["pred_pose_6d"].shape == (4, 2, 144)
    assert out["pred_betas"].shape == (4, 2, 10)
    assert out["pred_vertices"].shape[0:2] == (4, 2)
    assert all(np.isfinite(v).all() for v in out.values())


def test_short_batch_padding_matches_full(predictor):
    """A padded short request returns exactly the leading rows of the same
    images run inside a full batch (padding must not leak across samples)."""
    full = _mini_batch(4, seed=3)
    short = {k: (
        {kk: vv[:2] for kk, vv in v.items()} if isinstance(v, dict) else v[:2])
        for k, v in full.items()}
    out_full = predictor(full, seed=9)
    out_short = predictor(short, seed=9)
    assert out_short["pred_pose_6d"].shape[0] == 2
    np.testing.assert_allclose(
        out_short["pred_pose_6d"], out_full["pred_pose_6d"][:2],
        rtol=2e-4, atol=2e-4)


def test_oversized_request_rejected(predictor):
    with pytest.raises(ValueError):
        predictor(_mini_batch(5))


def test_map_batches_order_and_count(predictor):
    batches = [_mini_batch(4, seed=i) for i in range(5)] + [_mini_batch(3, seed=99)]
    outs = list(predictor.map_batches(iter(batches), seed=7))
    assert len(outs) == 6
    assert outs[-1]["pred_pose_6d"].shape[0] == 3  # trailing short batch
    # order: each streamed output equals the blocking call on the same batch
    ref2 = predictor(batches[2], seed=7 + 2)
    np.testing.assert_allclose(outs[2]["pred_pose_6d"], ref2["pred_pose_6d"],
                               rtol=2e-4, atol=2e-4)


def test_mesh_sharded_predictor_matches_single_device():
    """An 8-device data-parallel Predictor returns the same bodies as the
    unsharded one (the pipeline is per-sample; sharding is transparent)."""
    from egohmr_tpu.parallel import make_mesh

    params = init_egohmr(jax.random.PRNGKey(0), CFG)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    schedule = make_schedule(50, "cosine", "ddim5")
    kwargs = dict(batch_size=8, num_samples=1)
    p1 = Predictor(params, CFG, smpl, stats, schedule, **kwargs)
    p8 = Predictor(params, CFG, smpl, stats, schedule,
                   mesh=make_mesh(8), **kwargs)
    batch = _mini_batch(8, seed=21)
    a = p1(batch, seed=5)
    b = p8(batch, seed=5)
    np.testing.assert_allclose(a["pred_pose_6d"], b["pred_pose_6d"],
                               rtol=2e-4, atol=2e-4)

    with pytest.raises(ValueError):
        Predictor(params, CFG, smpl, stats, schedule, batch_size=6,
                  mesh=make_mesh(8))


def test_tensor_parallel_predictor_matches_single_device():
    """A 2-D (data=2 x model=4) mesh Predictor — PointNet + GCN params
    placed tensor-parallel (parallel/tp.py) — returns the same bodies as
    the unsharded one. batch_size needs only divide the DATA axis."""
    from egohmr_tpu.parallel import make_dp_tp_mesh

    params = init_egohmr(jax.random.PRNGKey(0), CFG)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    schedule = make_schedule(50, "cosine", "ddim5")
    # f32: isolates the sharding math from bf16 rounding — the TP matmul
    # splits change bf16 accumulation order, which the 5-step DDIM
    # recursion amplifies to ~1 ULP on a few elements (measured 6/864 at
    # one bf16 ULP); in f32 the programs agree tightly
    kwargs = dict(batch_size=6, num_samples=1, bf16=False)  # 6 % dp(2) == 0
    p1 = Predictor(params, CFG, smpl, stats, schedule, **kwargs)
    ptp = Predictor(params, CFG, smpl, stats, schedule,
                    mesh=make_dp_tp_mesh(2, 4), **kwargs)
    # params actually placed tensor-parallel, not silently replicated
    from jax.sharding import PartitionSpec as P
    assert (ptp._params["scene_enc"]["block_1"]["fc_0"]["w"].sharding.spec
            == P(None, "model"))
    batch = _mini_batch(6, seed=22)
    a = p1(batch, seed=7)
    b = ptp(batch, seed=7)
    np.testing.assert_allclose(a["pred_pose_6d"], b["pred_pose_6d"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(a["pred_betas"], b["pred_betas"],
                               rtol=2e-4, atol=2e-4)


def test_tensor_parallel_predictor_bf16_default_composes():
    """The PRODUCTION default combination — bf16 param precast composed
    with tensor-parallel placement (cast_params_bf16 rebuilds the tree
    before place_params shards it) — must build and agree with the
    unsharded bf16 run to within bf16 reduction-order noise. Also covers a
    custom model-axis name threading through to the spec tree."""
    from egohmr_tpu.parallel import make_dp_tp_mesh

    params = init_egohmr(jax.random.PRNGKey(0), CFG)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    schedule = make_schedule(50, "cosine", "ddim5")
    kwargs = dict(batch_size=4, num_samples=1)  # bf16 default True
    p1 = Predictor(params, CFG, smpl, stats, schedule, **kwargs)
    ptp = Predictor(params, CFG, smpl, stats, schedule,
                    mesh=make_dp_tp_mesh(2, 4, axes=("data", "mp")),
                    **kwargs)
    from jax.sharding import PartitionSpec as P
    assert (ptp._params["scene_enc"]["block_1"]["fc_0"]["w"].sharding.spec
            == P(None, "mp"))
    # BN leaves stay f32 through cast+place (structural detection intact)
    assert ptp._params["diffusion_model"]["gconv_input"]["bn"][
        "mean"].dtype == jnp.float32
    batch = _mini_batch(4, seed=23)
    a = p1(batch, seed=11)
    b = ptp(batch, seed=11)
    assert all(np.isfinite(v).all() for v in b.values())
    # bf16 ULP at O(1) magnitudes is ~0.008; the DDIM recursion can stack a
    # few of them — loose gate, the tight one is the f32 test above
    np.testing.assert_allclose(a["pred_pose_6d"], b["pred_pose_6d"],
                               rtol=0.05, atol=0.05)


def test_pack_dtype_float16_roundtrip(predictor):
    """fp16 packing (halved D2H bytes) must hand clients float32 arrays that
    match the lossless f32-packed outputs to fp16 rounding."""
    params = init_egohmr(jax.random.PRNGKey(0), CFG)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    schedule = make_schedule(50, "cosine", "ddim5")
    p16 = Predictor(params, CFG, smpl, stats, schedule,
                    batch_size=4, num_samples=2, output_keys=MESH_OUTPUT_KEYS,
                    pack_dtype=jnp.float16)
    batch = _mini_batch(4, seed=11)
    ref = predictor(batch, seed=3)
    out = p16(batch, seed=3)
    for k, v in out.items():
        assert v.dtype == np.float32, (k, v.dtype)
        # fp16 has ~3 decimal digits; outputs here are O(1) meters/rot6d
        np.testing.assert_allclose(v, ref[k], rtol=2e-3, atol=2e-3)


def test_warmup_requires_batch(predictor):
    """Bare warmup() must fail loudly (per-shape compile contract) instead
    of silently compiling a program no request ever runs."""
    with pytest.raises(ValueError, match="PER SHAPE"):
        predictor.warmup()
    # and a representative batch warms without error
    predictor.warmup(_mini_batch(4))


def test_guided_predictor_finite():
    """Predictor with collision-score guidance (DDPM) runs end-to-end."""
    from egohmr_tpu.diffusion import GuidanceConfig

    params = init_egohmr(jax.random.PRNGKey(0), CFG)
    stats = BodyRepStats(mean=jnp.zeros((144,)), std=jnp.ones((144,)))
    smpl = make_synthetic_model(num_vertices=128)
    schedule = make_schedule(50, "cosine", "")  # full DDPM
    pred = Predictor(params, CFG, smpl, stats, schedule, batch_size=2,
                     num_samples=1, sampler="ddpm", with_guidance=True,
                     guidance=GuidanceConfig(cond_grad_weight=2.0))
    out = pred(_mini_batch(2))
    assert np.isfinite(out["pred_pose_6d"]).all()

"""Conditional Glow tests: invertibility, exact log-det, distribution math."""
import numpy as np
import jax
import jax.numpy as jnp

from egohmr_tpu.flow import (
    GlowConfig,
    glow_forward,
    glow_inverse,
    glow_log_prob,
    glow_sample_and_log_prob,
    init_glow,
    initialize_actnorms,
)

CFG = GlowConfig(features=12, hidden_features=32, num_layers=3,
                 num_blocks_per_layer=2, context_features=7)


def _setup(seed=0):
    key = jax.random.PRNGKey(seed)
    params = init_glow(key, CFG)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(16, CFG.features).astype(np.float32))
    ctx = jnp.asarray(rng.randn(16, CFG.context_features).astype(np.float32))
    # randomize actnorm/linear away from identity via a data init
    params = initialize_actnorms(params, CFG, x * 2.0 + 0.3, ctx)
    return params, x, ctx


def test_forward_inverse_roundtrip():
    params, x, ctx = _setup()
    z, ld_f = glow_forward(params, CFG, x, ctx)
    x_back, ld_i = glow_inverse(params, CFG, z, ctx)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)


def test_logdet_matches_autodiff_jacobian():
    params, x, ctx = _setup()
    _, ld = glow_forward(params, CFG, x[:4], ctx[:4])
    for i in range(4):
        jac = jax.jacfwd(
            lambda v: glow_forward(params, CFG, v[None], ctx[i:i + 1])[0][0]
        )(x[i])
        _, want = np.linalg.slogdet(np.asarray(jac))
        np.testing.assert_allclose(float(ld[i]), want, rtol=1e-4, atol=1e-4)


def test_log_prob_integrates_sampling():
    """log_prob(sample) must equal the log_prob returned by sampling."""
    params, x, ctx = _setup()
    xs, lp, z = glow_sample_and_log_prob(
        params, CFG, ctx, num_samples=3, key=jax.random.PRNGKey(1)
    )
    B, S, d = xs.shape
    lp2, z2 = glow_log_prob(
        params, CFG, xs.reshape(B * S, d), jnp.repeat(ctx, S, axis=0)
    )
    np.testing.assert_allclose(np.asarray(lp).reshape(-1), np.asarray(lp2),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(z).reshape(B * S, d), np.asarray(z2),
                               atol=1e-3)


def test_mode_sample_z0():
    """z=0 maps deterministically through the inverse (the 'mode' path,
    reference prohmr_scene.py:145-146)."""
    params, x, ctx = _setup()
    z0 = jnp.zeros((16, 1, CFG.features))
    xs, lp, _ = glow_sample_and_log_prob(params, CFG, ctx, noise=z0)
    assert xs.shape == (16, 1, CFG.features)
    xs2, _, _ = glow_sample_and_log_prob(params, CFG, ctx, noise=z0)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs2))


def test_actnorm_init_normalizes_first_layer():
    key = jax.random.PRNGKey(0)
    params = init_glow(key, CFG)
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(256, CFG.features) * 3.0 + 1.0).astype(np.float32))
    ctx = jnp.asarray(rng.randn(256, CFG.context_features).astype(np.float32))
    params = initialize_actnorms(params, CFG, x, ctx)
    from egohmr_tpu.flow.glow import actnorm_forward

    y, _ = actnorm_forward(params["steps"][0]["actnorm"], x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, 0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, 0, ddof=1)), 1.0, atol=1e-3)


def test_context_conditioning_matters():
    params, x, ctx = _setup()
    lp1, _ = glow_log_prob(params, CFG, x, ctx)
    lp2, _ = glow_log_prob(params, CFG, x, ctx + 1.0)
    assert not np.allclose(np.asarray(lp1), np.asarray(lp2))


def test_convert_conditional_glow_wiring(rng):
    """nflows-layout state_dict -> converted params run and invert."""
    from egohmr_tpu.interop.torch_convert import convert_conditional_glow

    d, hidden, ctx, L, D = 12, 32, 7, 3, 2
    n_tri = d * (d - 1) // 2
    sd = {}
    for k in range(L):
        b = f"flow.flow._transform._transforms."
        sd[f"{b}{3*k}.log_scale"] = rng.randn(1, d).astype(np.float32) * 0.1
        sd[f"{b}{3*k}.shift"] = rng.randn(1, d).astype(np.float32) * 0.1
        sd[f"{b}{3*k+1}.lower_entries"] = rng.randn(n_tri).astype(np.float32) * 0.05
        sd[f"{b}{3*k+1}.upper_entries"] = rng.randn(n_tri).astype(np.float32) * 0.05
        sd[f"{b}{3*k+1}.unconstrained_upper_diag"] = (
            rng.randn(d).astype(np.float32) * 0.05 + 0.54)
        sd[f"{b}{3*k+1}.bias"] = rng.randn(d).astype(np.float32) * 0.05
        n_id = d - d // 2 if k % 2 == 0 else d // 2
        n_tr = d - n_id
        net = f"{b}{3*k+2}.transform_net."
        sd[net + "initial_layer.weight"] = (
            rng.randn(hidden, n_id + ctx).astype(np.float32) * 0.1)
        sd[net + "initial_layer.bias"] = rng.randn(hidden).astype(np.float32) * 0.1
        for j in range(D):
            for li in (0, 1):
                sd[f"{net}blocks.{j}.linear_layers.{li}.weight"] = (
                    rng.randn(hidden, hidden).astype(np.float32) * 0.05)
                sd[f"{net}blocks.{j}.linear_layers.{li}.bias"] = (
                    rng.randn(hidden).astype(np.float32) * 0.05)
            sd[f"{net}blocks.{j}.context_layer.weight"] = (
                rng.randn(hidden, ctx).astype(np.float32) * 0.1)
            sd[f"{net}blocks.{j}.context_layer.bias"] = (
                rng.randn(hidden).astype(np.float32) * 0.1)
        sd[net + "final_layer.weight"] = (
            rng.randn(2 * n_tr, hidden).astype(np.float32) * 0.05)
        sd[net + "final_layer.bias"] = rng.randn(2 * n_tr).astype(np.float32) * 0.05

    params = convert_conditional_glow(sd, num_layers=L, num_blocks_per_layer=D)
    cfg = GlowConfig(features=d, hidden_features=hidden, num_layers=L,
                     num_blocks_per_layer=D, context_features=ctx)
    x = jnp.asarray(rng.randn(8, d).astype(np.float32))
    ctx_arr = jnp.asarray(rng.randn(8, ctx).astype(np.float32))
    z, ld = glow_forward(params, cfg, x, ctx_arr)
    x_back, ld_i = glow_inverse(params, cfg, z, ctx_arr)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_i), 0.0, atol=1e-4)
    assert not np.allclose(np.asarray(ld), 0.0)  # non-identity weights loaded

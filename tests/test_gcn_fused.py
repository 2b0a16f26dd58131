"""Fused whole-denoiser ModulatedGCN kernel (nn/gcn_fused.py).

Runs in Pallas interpret mode on the CPU test backend; the kernel's TPU
numerics are identical modulo Mosaic scheduling (same op sequence).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from egohmr_tpu.nn.gcn import init_modulated_gcn, modulated_gcn_forward
from egohmr_tpu.nn.gcn_fused import modulated_gcn_fused
from egohmr_tpu.smpl import constants as C

H = 192


@pytest.fixture(scope="module")
def setup():
    params = init_modulated_gcn(
        jax.random.PRNGKey(0), in_dim=H, hid_dim=H, out_dim=6, num_layers=4)
    adj = jnp.asarray(C.joint_adjacency(), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (10, 24, H)) * 0.5
    h1 = jax.random.normal(jax.random.PRNGKey(2), (10, 24, H)) * 0.5
    want, _ = modulated_gcn_forward(
        params, adj, None, train=False, input_h=(h0, h1))
    return params, adj, h0, h1, np.asarray(want)


def test_f32_kernel_matches_xla_path(setup):
    """With f32 matmuls the kernel == the XLA eval path to accumulation
    order (isolates kernel/layout bugs from bf16 precision effects). N=10
    with block_b=8 also exercises the batch-padding path."""
    params, adj, h0, h1, want = setup
    with pltpu.force_tpu_interpret_mode():
        got = modulated_gcn_fused(params, adj, h0, h1, block_b=8,
                                  mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_bf16_kernel_close_to_f32_xla_path(setup):
    """bf16 matmul inputs / f32 accumulation vs the f32 XLA path: the
    documented precision envelope of the production inference kernel."""
    params, adj, h0, h1, want = setup
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(modulated_gcn_fused(params, adj, h0, h1, block_b=8))
    denom = np.maximum(np.abs(want), 1e-2)
    assert np.mean(np.abs(got - want) / denom) < 0.05
    assert np.max(np.abs(got - want)) < 0.1


def test_block_size_invariance(setup):
    """The result must not depend on the batch-chunk grid decomposition:
    exact in f32; bf16 only up to backend dot-partitioning rounding."""
    params, adj, h0, h1, _ = setup
    with pltpu.force_tpu_interpret_mode():
        a32 = modulated_gcn_fused(params, adj, h0, h1, block_b=8,
                                  mm_dtype=jnp.float32)
        b32 = modulated_gcn_fused(params, adj, h0, h1, block_b=16,
                                  mm_dtype=jnp.float32)
        a = modulated_gcn_fused(params, adj, h0, h1, block_b=8)
        b = modulated_gcn_fused(params, adj, h0, h1, block_b=16)
    np.testing.assert_allclose(np.asarray(a32), np.asarray(b32),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-4)


def test_bf16_params_accepted(setup):
    """cast_params_bf16 params (BN kept f32) drive the kernel unchanged:
    weights are already bf16, small tensors are upcast internally."""
    from egohmr_tpu.nn.core import cast_params_bf16

    params, adj, h0, h1, want = setup
    pbf = cast_params_bf16(params)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(modulated_gcn_fused(pbf, adj, h0, h1, block_b=8))
    denom = np.maximum(np.abs(want), 1e-2)
    assert np.mean(np.abs(got - want) / denom) < 0.05


def test_nonlocal_topology_rejected():
    """The fused kernel only implements the production topology; callers
    must fall back to the XLA path for the non-local variant."""
    params = init_modulated_gcn(
        jax.random.PRNGKey(0), in_dim=H, hid_dim=H, out_dim=6, num_layers=2,
        nonlocal_layer=True)
    adj = jnp.asarray(C.joint_adjacency(), jnp.float32)
    h = jnp.zeros((2, 24, H))
    with pytest.raises(AssertionError):
        modulated_gcn_fused(params, adj, h, h, block_b=8)

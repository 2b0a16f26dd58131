"""Fused whole-network PointNet kernel (nn/pointnet_fused.py).

Runs in Pallas interpret mode on the CPU test backend; the kernel's TPU
numerics are identical modulo Mosaic scheduling (same op sequence).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from egohmr_tpu.nn.core import linear, relu
from egohmr_tpu.nn.pointnet import init_pointnet, pointnet_forward
from egohmr_tpu.nn.pointnet_fused import pointnet_forward_fused


def _bf16_reference(params, pts, hidden=256):
    """XLA emulation of the kernel's exact arithmetic: bf16 matmul inputs,
    f32 accumulation, bf16 activation storage between stages, f32 pools."""
    bf = jnp.bfloat16
    H = hidden

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(bf).astype(jnp.float32),
            w.astype(bf).astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            precision="highest",
        )

    feats = []
    for b in range(pts.shape[0]):
        x = pts[b].astype(bf)
        net0 = mm(x, params["fc_pos_0"]["w"]) + params["fc_pos_0"]["b"]
        p0 = params["block_0"]
        net = mm(relu(net0), p0["fc_0"]["w"]) + p0["fc_0"]["b"]
        dx = mm(relu(net), p0["fc_1"]["w"]) + p0["fc_1"]["b"]
        x1 = mm(net0, p0["shortcut"]["w"]) + dx
        pool = jnp.max(x1, axis=0, keepdims=True)
        x1 = x1.astype(bf)
        for i in (1, 2, 3):
            p = params[f"block_{i}"]
            rpool = mm(relu(pool), p["fc_0"]["w"][H:]) + p["fc_0"]["b"]
            xspool = mm(pool, p["shortcut"]["w"][H:])
            net = mm(relu(x1), p["fc_0"]["w"][:H]) + rpool
            dx = mm(relu(net), p["fc_1"]["w"]) + p["fc_1"]["b"]
            out = mm(x1, p["shortcut"]["w"][:H]) + xspool + dx
            pool = jnp.max(out, axis=0, keepdims=True)
            x1 = out.astype(bf)
        feats.append(pool[0])
    return linear(params["fc_c"], relu(jnp.stack(feats)))


@pytest.fixture(scope="module")
def setup():
    params = init_pointnet(jax.random.PRNGKey(0), out_dim=512, hidden_dim=256)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 1800, 3))
    return params, pts


def test_matches_bf16_arithmetic_exactly(setup):
    """The kernel == the same arithmetic written in XLA, to accumulation
    order (this isolates kernel bugs from bf16 precision effects)."""
    params, pts = setup
    ref = _bf16_reference(params, pts)
    with pltpu.force_tpu_interpret_mode():
        got = pointnet_forward_fused(params, pts, chunk=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-5)


def test_close_to_f32_xla_path(setup):
    """bf16 storage/input rounding vs the f32 XLA production path stays
    small in aggregate (documented precision envelope of the fused path)."""
    params, pts = setup
    ref = np.asarray(pointnet_forward(params, pts))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pointnet_forward_fused(params, pts, chunk=512))
    denom = np.maximum(np.abs(ref), 1e-2)
    assert np.mean(np.abs(got - ref) / denom) < 0.05
    # cosine similarity of the conditioning feature is what matters downstream
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert np.all(cos > 0.999)


def test_pad_tail_is_exact(setup):
    """Edge-replication padding: a point count not divisible by the chunk
    gives the same result as the unpadded cloud (max over duplicates)."""
    params, _ = setup
    pts = jax.random.normal(jax.random.PRNGKey(2), (1, 1000, 3))
    with pltpu.force_tpu_interpret_mode():
        a = pointnet_forward_fused(params, pts, chunk=512)   # pad 1000->1024
        b = pointnet_forward_fused(params, pts, chunk=500)   # no pad
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                               atol=2e-5)

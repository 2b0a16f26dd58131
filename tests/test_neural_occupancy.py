"""Learned part-wise occupancy: shape/compose sanity + distillation learns."""
import numpy as np
import jax
import jax.numpy as jnp

from egohmr_tpu.collision.neural_occupancy import (
    OccupancyConfig,
    distill_occupancy,
    init_occupancy,
    occupancy_collision_loss,
    occupancy_query,
)
from egohmr_tpu.collision.sdf import signed_distance
from egohmr_tpu.smpl import lbs, make_synthetic_model, vertex_normals


def test_query_shapes_and_range(rng):
    model = make_synthetic_model(num_vertices=128)
    cfg = OccupancyConfig(latent_dim=16, hidden_dim=32, num_layers=3)
    params = init_occupancy(jax.random.PRNGKey(0), cfg)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.5)
    aa = rng.randn(2, 24, 3).astype(np.float32) * 0.2
    out = lbs(model, betas, jnp.asarray(aa[:, 0]),
              jnp.asarray(aa[:, 1:].reshape(2, 69)), pose2rot=True)
    pts = jnp.asarray(rng.randn(2, 100, 3).astype(np.float32))
    occ = occupancy_query(params, cfg, model, out, betas, pts)
    assert occ.shape == (2, 100)
    assert float(occ.min()) >= 0.0 and float(occ.max()) <= 1.0
    loss = occupancy_collision_loss(occ)
    assert loss.shape == (2,) and np.isfinite(np.asarray(loss)).all()


def test_distillation_beats_untrained(rng):
    """After a short distillation the net must classify near/far-from-body
    far better than an untrained one. The synthetic body's faces are random
    (its normals are noise), so the proximity label is the well-defined
    target here; real SMPL meshes use the signed mode."""
    from egohmr_tpu.collision.sdf import nearest_vertex

    model = make_synthetic_model(num_vertices=128)
    cfg = OccupancyConfig(latent_dim=16, hidden_dim=32, num_layers=3)

    trained = distill_occupancy(
        jax.random.PRNGKey(0), model, cfg, steps=400, batch_bodies=4,
        points_per_body=256, label_mode="proximity", proximity_tau=0.08)
    untrained = init_occupancy(jax.random.PRNGKey(1), cfg)

    betas = jnp.zeros((2, 10))
    aa = rng.randn(2, 24, 3).astype(np.float32) * 0.1
    out = lbs(model, betas, jnp.asarray(aa[:, 0]),
              jnp.asarray(aa[:, 1:].reshape(2, 69)), pose2rot=True)
    lo = jnp.min(out.vertices, axis=1, keepdims=True) - 0.1
    hi = jnp.max(out.vertices, axis=1, keepdims=True) + 0.1
    u = jax.random.uniform(jax.random.PRNGKey(2), (2, 512, 3))
    pts = lo + u * (hi - lo)
    label = (np.asarray(nearest_vertex(pts, out.vertices,
                                       block_size=256).dist) < 0.08)

    def acc(p):
        occ = np.asarray(occupancy_query(p, cfg, model, out, betas, pts))
        return ((occ > 0.5) == label).mean()

    a_trained, a_untrained = acc(trained), acc(untrained)
    assert a_trained > 0.75, (a_trained, a_untrained)
    assert a_trained > a_untrained - 0.02

"""Collision / SDF stack tests."""
import numpy as np
import jax.numpy as jnp

from egohmr_tpu.collision import (
    bbox_mask,
    collision_loss,
    collision_ratio,
    min_body_scene_distance,
    nearest_vertex,
    signed_distance,
)


def _unit_sphere(n, rng):
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v.astype(np.float32)


def test_nearest_vertex_matches_bruteforce(rng):
    pts = rng.randn(2, 300, 3).astype(np.float32)
    verts = rng.randn(2, 97, 3).astype(np.float32)
    got = nearest_vertex(jnp.asarray(pts), jnp.asarray(verts), block_size=64)
    d = np.linalg.norm(pts[:, :, None] - verts[:, None], axis=-1)
    want_idx = d.argmin(-1)
    want_dist = d.min(-1)
    np.testing.assert_array_equal(np.asarray(got.idx), want_idx)
    np.testing.assert_allclose(np.asarray(got.dist), want_dist, rtol=1e-3,
                               atol=1e-4)


def test_signed_distance_sphere(rng):
    """Points inside/outside a unit sphere get correct sign and magnitude."""
    verts = _unit_sphere(2000, rng)[None]  # [1, V, 3]
    normals = verts.copy()  # sphere normals = positions
    radii = np.array([0.5, 0.9, 1.1, 2.0], np.float32)
    dirs = _unit_sphere(4, rng)
    pts = (radii[:, None] * dirs)[None]  # [1, 4, 3]
    sdf = np.asarray(signed_distance(
        jnp.asarray(pts), jnp.asarray(verts), jnp.asarray(normals),
        block_size=4))
    want = radii - 1.0
    np.testing.assert_allclose(sdf[0], want, atol=0.05)


def test_collision_metrics(rng):
    verts = _unit_sphere(2000, rng)[None]
    normals = verts.copy()
    # 10 inside, 30 outside
    inside = _unit_sphere(10, rng) * 0.5
    outside = _unit_sphere(30, rng) * 3.0
    pts = np.concatenate([inside, outside])[None].astype(np.float32)
    sdf = signed_distance(jnp.asarray(pts), jnp.asarray(verts),
                          jnp.asarray(normals), block_size=8)
    ratio = float(collision_ratio(sdf)[0])
    np.testing.assert_allclose(ratio, 10 / 40, atol=0.03)
    loss = float(collision_loss(sdf)[0])
    assert loss > 0
    # no penetration -> zero loss
    sdf_out = signed_distance(jnp.asarray(outside[None]), jnp.asarray(verts),
                              jnp.asarray(normals), block_size=8)
    assert float(collision_loss(sdf_out)[0]) < 1e-6


def test_bbox_mask(rng):
    verts = jnp.asarray(rng.rand(1, 50, 3).astype(np.float32))  # in [0,1]^3
    pts = jnp.asarray(np.array([[[0.5, 0.5, 0.5], [5.0, 5.0, 5.0]]], np.float32))
    m = np.asarray(bbox_mask(pts, verts))
    assert m[0, 0] and not m[0, 1]


def test_min_body_scene_distance(rng):
    verts = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    scene = jnp.asarray((rng.randn(1, 128, 3) + 10).astype(np.float32))
    d = float(min_body_scene_distance(verts, scene, block_size=16)[0])
    brute = np.linalg.norm(
        np.asarray(verts)[0][:, None] - np.asarray(scene)[0][None], axis=-1
    ).min()
    np.testing.assert_allclose(d, brute, rtol=1e-4)


def test_chamfer_distance_squared(rng):
    from egohmr_tpu.collision import chamfer_distance

    x = jnp.asarray(rng.randn(1, 50, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 80, 3).astype(np.float32))
    cx, cy = chamfer_distance(x, y, block_size=16)
    d = np.linalg.norm(np.asarray(x)[0][:, None] - np.asarray(y)[0][None],
                       axis=-1)
    np.testing.assert_allclose(np.asarray(cx)[0], (d.min(1)) ** 2,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cy)[0], (d.min(0)) ** 2,
                               rtol=1e-3, atol=1e-5)

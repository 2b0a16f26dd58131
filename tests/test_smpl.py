"""SMPL LBS tests: analytic properties + an independent per-vertex numpy oracle."""
import numpy as np
import jax.numpy as jnp

from egohmr_tpu.geometry import aa_to_rotmat
from egohmr_tpu.smpl import constants as C
from egohmr_tpu.smpl import lbs, make_synthetic_model, vertex_normals


def _zero_pose(B):
    return (
        jnp.zeros((B, 10)),
        jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
        jnp.broadcast_to(jnp.eye(3), (B, 23, 3, 3)),
    )


def test_rest_pose_is_template():
    m = make_synthetic_model()
    betas, go, bp = _zero_pose(2)
    out = lbs(m, betas, go, bp, pose2rot=False)
    want = np.asarray(m.v_template)[None].repeat(2, 0)
    np.testing.assert_allclose(np.asarray(out.vertices), want, atol=1e-5)
    want_j = np.asarray(m.j_regressor) @ np.asarray(m.v_template)
    np.testing.assert_allclose(np.asarray(out.joints_smpl[0]), want_j, atol=1e-5)


def test_output_shapes_and_extra_joints():
    m = make_synthetic_model()
    betas, go, bp = _zero_pose(3)
    t = jnp.asarray(np.random.RandomState(0).randn(3, 3).astype(np.float32))
    out = lbs(m, betas, go, bp, transl=t, pose2rot=False)
    assert out.vertices.shape == (3, m.num_vertices, 3)
    assert out.joints.shape == (3, 45, 3)
    assert out.full_pose.shape == (3, 24, 3, 3)
    # extra joints are exactly mesh vertices
    np.testing.assert_allclose(
        np.asarray(out.joints[:, 24:]),
        np.asarray(out.vertices[:, np.asarray(m.extra_joint_ids)]),
        atol=1e-6,
    )


def test_global_orient_rotates_about_pelvis(rng):
    m = make_synthetic_model()
    aa = rng.randn(1, 3).astype(np.float32)
    R = np.asarray(aa_to_rotmat(jnp.asarray(aa)))[0]
    betas, go, bp = _zero_pose(1)
    out0 = lbs(m, betas, go, bp, pose2rot=False)
    out1 = lbs(m, betas, jnp.asarray(R)[None, None], bp, pose2rot=False)
    j0 = np.asarray(out0.joints_smpl[0, 0])
    want = (np.asarray(out0.vertices[0]) - j0) @ R.T + j0
    np.testing.assert_allclose(np.asarray(out1.vertices[0]), want, atol=1e-4)


def test_transl_is_additive(rng):
    m = make_synthetic_model()
    betas, go, bp = _zero_pose(2)
    t = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    out0 = lbs(m, betas, go, bp, pose2rot=False)
    out1 = lbs(m, betas, go, bp, transl=t, pose2rot=False)
    np.testing.assert_allclose(
        np.asarray(out1.vertices), np.asarray(out0.vertices + t[:, None]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out1.joints), np.asarray(out0.joints + t[:, None]), atol=1e-5
    )


def test_pose2rot_equivalence(rng):
    m = make_synthetic_model()
    B = 2
    betas = jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.5)
    go_aa = rng.randn(B, 3).astype(np.float32) * 0.5
    bp_aa = rng.randn(B, 69).astype(np.float32) * 0.3
    out_aa = lbs(m, betas, jnp.asarray(go_aa), jnp.asarray(bp_aa), pose2rot=True)
    go_r = np.asarray(aa_to_rotmat(jnp.asarray(go_aa))).reshape(B, 1, 3, 3)
    bp_r = np.asarray(aa_to_rotmat(jnp.asarray(bp_aa.reshape(-1, 3)))).reshape(
        B, 23, 3, 3
    )
    out_r = lbs(m, betas, jnp.asarray(go_r), jnp.asarray(bp_r), pose2rot=False)
    np.testing.assert_allclose(
        np.asarray(out_aa.vertices), np.asarray(out_r.vertices), atol=1e-5
    )


def _numpy_lbs_oracle(m, betas, rot_mats, transl):
    """Independent per-vertex/per-joint loop implementation of SMPL LBS."""
    v_template = np.asarray(m.v_template, np.float64)
    shapedirs = np.asarray(m.shapedirs, np.float64)
    posedirs = np.asarray(m.posedirs, np.float64)
    j_reg = np.asarray(m.j_regressor, np.float64)
    weights = np.asarray(m.lbs_weights, np.float64)
    parents = np.asarray(m.parents)

    v_shaped = v_template + shapedirs @ betas
    joints = j_reg @ v_shaped
    pose_feat = (rot_mats[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

    # global transforms, one joint at a time
    G = np.zeros((24, 4, 4))
    for k in range(24):
        local = np.eye(4)
        local[:3, :3] = rot_mats[k]
        local[:3, 3] = joints[k] - (joints[parents[k]] if k > 0 else 0)
        G[k] = local if k == 0 else G[parents[k]] @ local
    posed_joints = G[:, :3, 3].copy()
    # remove rest-joint contribution
    A = G.copy()
    for k in range(24):
        A[k, :3, 3] -= G[k, :3, :3] @ joints[k]

    verts = np.zeros_like(v_posed)
    for i in range(v_posed.shape[0]):
        T = np.tensordot(weights[i], A, axes=(0, 0))
        verts[i] = T[:3, :3] @ v_posed[i] + T[:3, 3]
    return verts + transl, posed_joints + transl


def test_against_numpy_oracle(rng):
    m = make_synthetic_model(num_vertices=128)
    betas = rng.randn(10).astype(np.float32) * 0.5
    aa = rng.randn(24, 3).astype(np.float32) * 0.4
    rots = np.asarray(aa_to_rotmat(jnp.asarray(aa)))
    transl = rng.randn(3).astype(np.float32)

    want_v, want_j = _numpy_lbs_oracle(m, betas, rots.astype(np.float64), transl)
    out = lbs(
        m,
        jnp.asarray(betas)[None],
        jnp.asarray(rots[:1])[None],
        jnp.asarray(rots[1:])[None],
        transl=jnp.asarray(transl)[None],
        pose2rot=False,
    )
    np.testing.assert_allclose(np.asarray(out.vertices[0]), want_v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.joints_smpl[0]), want_j, atol=1e-4)


def test_vertex_normals_unit_sphereish():
    m = make_synthetic_model()
    v = np.asarray(m.v_template)[None]
    n = vertex_normals(jnp.asarray(v), m.faces)
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    # normalized (or zero for unreferenced verts)
    assert ((np.abs(norms - 1.0) < 1e-4) | (norms < 1e-6)).all()


def test_joint_adjacency_matches_reference_construction():
    adj = C.joint_adjacency()
    assert adj.shape == (24, 24)
    np.testing.assert_allclose(np.diag(adj), 1.0)
    # symmetric pattern of edges present
    for a, b in np.asarray(C.SMPL_EDGES):
        assert adj[a, b] > 0 and adj[b, a] > 0
    # off-diagonal rows: normalized by degree
    deg = np.zeros(24)
    for a, b in np.asarray(C.SMPL_EDGES):
        deg[a] += 1
        deg[b] += 1
    offdiag = adj - np.eye(24)
    np.testing.assert_allclose(offdiag.sum(1), deg * (1.0 / deg), atol=1e-6)


def test_lbs_apply_select_matches_full_gather(rng):
    """Selective skinning (the scatter-free guidance backward path) must
    reproduce lbs().vertices at the selected indices exactly — duplicates
    and a K not divisible by pose_chunk included."""
    import jax
    import jax.numpy as jnp

    from egohmr_tpu.geometry import aa_to_rotmat
    from egohmr_tpu.smpl import lbs, make_synthetic_model
    from egohmr_tpu.smpl.model import lbs_apply_select, lbs_transforms

    model = make_synthetic_model(num_vertices=300)
    B, K = 3, 37  # K % pose_chunk != 0 exercises the padding path
    betas = jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.5)
    aa = rng.randn(B, 24, 3).astype(np.float32) * 0.3
    rotmat = aa_to_rotmat(jnp.asarray(aa).reshape(-1, 3)).reshape(B, 24, 3, 3)
    idx = jnp.asarray(rng.randint(0, 300, size=(B, K)))
    idx = idx.at[:, :5].set(idx[:, 5:10])  # force duplicates

    out = lbs(model, betas, rotmat[:, :1], rotmat[:, 1:], pose2rot=False)
    want = jnp.take_along_axis(out.vertices, idx[..., None], axis=1)

    _, pf, _, rel = lbs_transforms(model, betas, rotmat)
    got = lbs_apply_select(model, betas, pf, rel, idx, pose_chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # the backward must exist and be scatter-free in spirit: finite grads
    def f(r):
        _, pf2, _, rel2 = lbs_transforms(model, betas, r)
        return jnp.sum(lbs_apply_select(model, betas, pf2, rel2, idx) ** 2)

    g = jax.grad(f)(rotmat)
    assert np.isfinite(np.asarray(g)).all()
